package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (the "salting" pattern the 100 TB
  * design calls for when AQE's skew-join handling doesn't apply — e.g. a
  * token aggregation where a stopword owns 10% of all rows).
  *
  * Two-phase aggregation: rows are spread across `salts` sub-keys
  * (`hash(row) % salts`), partially aggregated per `(key, salt)` — so no
  * single task owns a heavy key — then finally aggregated per key. For
  * algebraic aggregates (sum/count/min/max) the result is identical to the
  * direct `groupBy`; the cost is one extra (cheap, already-reduced)
  * shuffle. */
object Salting {

  /** Salted count of rows per key: semantically `groupBy(key).count()`
    * with the first shuffle spread over `salts` sub-keys. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.select(key.as("key"), (monotonically_increasing_id() % salts).as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum("partial").as("count"))

  /** Salted sum over `value` per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("v"), (monotonically_increasing_id() % salts).as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(sum("v").as("partial"))
      .groupBy(col("key"))
      .agg(sum("partial").as("sum"))
}
