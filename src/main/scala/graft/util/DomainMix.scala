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

  private val TempBuckets = 1000000L // data-dependent rates: 1e-6 resolution

  /** Temperature-scaled mixture sampling — the α-temperature domain
    * reweighting of multilingual/multi-source pretraining (GPT-3 §2.2
    * upweights rarer sources; XLM-R/Llama sample domains ∝ p^α): the
    * target composition is `q_d ∝ (n_d/N)^α` at `α = 0.5` and the sample
    * keeps `frac·N` documents in expectation, so rare domains keep a
    * LARGER fraction of themselves than abundant ones.
    *
    * α is fixed at 1/2 because `sqrt` is correctly rounded under
    * IEEE-754 while `pow` is not — with `+ * /` also correctly rounded
    * and the normalizer summed in sorted-domain order, the per-domain
    * keep thresholds are BITWISE identical when an external checker
    * (DuckDB) re-derives them from the same counts, which is what makes
    * this data-dependent gate oracle-checkable at integer precision.
    *
    * Scale design: domain counts are one partial-aggregated groupBy
    * collapsing to |domains| rows on the driver (domains are a curated
    * handful); thresholds inline as a literal CASE chain and the gate is
    * the same zero-shuffle elementwise program as [[sample]], stable
    * under retries. */
  def temperatureSample(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      frac: Double,
      seed: String = "mixt:"): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val counts = df.groupBy(col(domainCol)).count()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"temperatureSample: null $domainCol value — a null domain has " +
            "no rate; filter or fill it before sampling")
        r.getString(0) -> r.getLong(1)
      }.toMap
    require(counts.nonEmpty, "temperatureSample: empty corpus")
    val domains = counts.keys.toSeq.sorted
    val nTotal = counts.values.sum.toDouble
    val weights = domains.map(d => math.sqrt(counts(d).toDouble / nTotal))
    val z = weights.foldLeft(0.0)(_ + _) // sorted-order fold, oracle-matched
    val s = frac * nTotal
    val thresholds = domains.zip(weights).map { case (d, w) =>
      d -> math.floor(math.min(s * w / z / counts(d).toDouble, 1.0) * TempBuckets).toLong
    }
    val thr: Column = thresholds.foldLeft(lit(0L)) {
      case (acc, (domain, t)) => when(col(domainCol) === domain, lit(t)).otherwise(acc)
    }
    val gate = pmod(
      TextAnalysis.fnv1a64(concat(lit(seed), col(idCol).cast("string"))),
      lit(TempBuckets))
    df.filter(gate < thr)
  }
}
