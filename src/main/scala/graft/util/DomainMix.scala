package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Weighted domain-mixture sampling (beyond-reference pipeline operator):
  * keep each document with a per-domain probability — the "source
  * weighting" step every large pretraining corpus applies (different
  * retention rates per source/language/quality tier).
  *
  * Scale design (100 TB): the gate is DETERMINISTIC — a seeded hash of
  * the document id mapped to a rate threshold — never `rand()`. That
  * makes the sample (a) reproducible run-to-run and engine-to-engine
  * (oracle-checkable), (b) stable under task retries (a nondeterministic
  * gate re-drawn on retry silently changes the output corpus), and
  * (c) a pure elementwise Column program: one scan, zero shuffle,
  * nothing broadcast — the rate table compiles into the plan as a
  * literal CASE chain (domain maps are human-curated and tiny). The
  * hash is the engine's oracle-recomputable FNV-1a 64 over
  * `seed || id` — gates need avalanche, and the polynomial 31-hash is
  * affine in the trailing character, which on sequential ids skews a
  * 10% gate to 0.5% (see [[graft.text.Fnv1aExpr]]); distinct seeds
  * draw independent samples. */
object DomainMix {

  private val Buckets = 1000L // rate resolution: 0.1%

  /** Filter `df` to the mixture sample: keep a row of domain `d` iff
    * `hash(seed || id) mod 1000 < 1000·rate(d)`, with `rates` consulted
    * first and `defaultRate` for unlisted domains. */
  def sample(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      seed: String = "mix:"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val rate: Column = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (domain, r)) => when(col(domainCol) === domain, lit(r)).otherwise(acc)
    }
    val gate = pmod(
      TextAnalysis.fnv1a64(concat(lit(seed), col(idCol).cast("string"))),
      lit(Buckets))
    df.filter(gate < (rate * Buckets).cast("long"))
  }
}
