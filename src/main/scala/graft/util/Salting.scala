package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (the "salting" pattern the 100 TB
  * design calls for when AQE's skew-join handling doesn't apply — e.g. a
  * token aggregation where a stopword owns 10% of all rows).
  *
  * Two-phase aggregation: rows are spread across `salts` sub-keys,
  * partially aggregated per `(key, salt)` — so no single task owns a heavy
  * key — then finally aggregated per key. For algebraic aggregates
  * (sum/count/min/max) the result is identical to the direct `groupBy`;
  * the cost is one extra (cheap, already-reduced) shuffle.
  *
  * The salt is a '''deterministic''' hash of the full input row
  * (`pmod(xxhash64(cols…), salts)`) — never `monotonically_increasing_id`
  * or `rand`, whose nondeterminism (a) blocks Catalyst from pushing
  * filters through the salting projection and (b) re-assigns rows
  * differently when a task retries, which is benign for algebraic
  * aggregates but a silent hazard for anything order- or
  * assignment-sensitive layered on top. Caveat of the deterministic
  * choice: byte-identical duplicate rows share a salt, so a corpus
  * dominated by exact copies of ONE row still lands on one sub-key —
  * exact-dedup first (the cleaning-pipeline order) or pass a custom
  * `salt` expression with more entropy for that shape. */
object Salting {

  /** Deterministic per-row salt in `[0, salts)`: a 64-bit hash of all
    * columns of `df`, reduced mod `salts`. */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))

  /** Salted count of rows per key: semantically `groupBy(key).count()`
    * with the first shuffle spread over `salts` sub-keys. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.select(key.as("key"), rowSalt(df, salts).as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum("partial").as("count"))

  /** Salted sum over `value` per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("v"), rowSalt(df, salts).as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(sum("v").as("partial"))
      .groupBy(col("key"))
      .agg(sum("partial").as("sum"))
}
