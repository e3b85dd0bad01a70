package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement — Efraimidis &
  * Spirakis 2006 ("Weighted random sampling with a reservoir"): each
  * item draws `u ∈ (0,1)` and takes key `u^(1/w)`; the k largest keys
  * are a weighted sample without replacement. The training-data use
  * case: draw a longer-document-biased (or quality-score-biased) corpus
  * sample per stratum without a shuffle-the-world sort.
  *
  * Determinism (the oracle contract): `u` comes from the content's
  * sha256 — the stratified-sample pattern — so both engines derive the
  * SAME uniform draw; keys compare as `ln(u)/w` (monotone in
  * `u^(1/w)`), and ties break on the id column. One hash-partitioned
  * window per stratum, map-side `WindowGroupLimit` prunes before the
  * exchange — the same shape as the exact-dedup tier, weight-aware. */
object WeightedSample {

  /** `(strata, pick_rank, id, weight)` of the k heaviest-keyed items
    * per stratum. `weightCol` must be positive. */
  def sampleByWeight(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      hashSourceCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    // u in (0,1): first 8 sha256 hex chars as a uint32, mid-bucket
    val u = (conv(substring(sha2(coalesce(col(hashSourceCol), lit("")), 256), 1, 8), 16, 10)
      .cast("long").cast("double") + 0.5) / lit(4294967296.0)
    val key = log(u) / col(weightCol) // ln of the E-S key, same order
    val w = Window.partitionBy(col(strataCol)).orderBy(col("es_key").desc, col(idCol))
    df
      .withColumn("es_key", key)
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= k)
      .select(col(strataCol), col("pick_rank"), col(idCol), col(weightCol))
  }
}
