package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact quantile over an unbounded-cardinality numeric column by
  * distributed sort selection (beyond-reference curation utility).
  *
  * Why not Spark's `percentile` aggregate: the exact Percentile
  * expression merges a value→count map into ONE final aggregation
  * buffer. On an integer-valued column (word counts, document lengths)
  * the distinct-value count is bounded and that buffer is small; on a
  * CONTINUOUS double (bits-per-token, cosine scores) the map approaches
  * one entry per row — at 100 TB that is a single task holding a
  * corpus-cardinality hashmap. Selection by global sort has no such
  * funnel: the sort is a range-partitioned exchange (each partition a
  * bounded slice), and the driver sees only the per-partition row counts
  * and the one selected value.
  *
  * Semantics: discrete quantile — the smallest value whose cumulative
  * row fraction reaches `q`, i.e. the row at rank `ceil(q·n)` of the
  * ascending sort. This is SQL `percentile_disc` / DuckDB
  * `quantile_disc`, chosen over the interpolating `percentile_cont`
  * because a selected value is exactly reproducible across engines
  * (an interpolated midpoint re-introduces float arithmetic on the
  * engine's fold order).
  *
  * Cost: one sort exchange, two bounded jobs over the sorted blocks
  * (per-partition counts: `numPartitions` longs to the driver; then the
  * single selected row). The sorted RDD is persisted MEMORY_AND_DISK
  * between the two jobs so the sort is not re-run, and unpersisted
  * before returning.
  */
object ExactQuantile {

  /** The `percentile_disc(q)` value of `valueCol` (nulls ignored),
    * by distributed sort selection. */
  def quantileDisc(df: DataFrame, valueCol: String, q: Double): Double = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0,1], got $q")
    val sorted = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .orderBy("__v")
      .rdd
      .map(_.getDouble(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Job 1: per-partition row counts — numPartitions longs to the
      // driver. Partition index order IS ascending value order under a
      // range-partitioned sort.
      val counts = sorted
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
        .collect()
        .sortBy(_._1)
      val n = counts.map(_._2).sum
      require(n > 0, s"quantileDisc: no non-null $valueCol rows")
      val rank = math.ceil(q * n).toLong // 1-indexed global rank
      // Locate the partition holding the rank and its local 0-based offset.
      var before = 0L
      var target = -1
      var localOffset = 0L
      counts.foreach { case (i, c) =>
        if (target < 0 && rank <= before + c) { target = i; localOffset = rank - before - 1 }
        before += c
      }
      // Job 2: the one selected row from the one partition that holds it.
      require(localOffset <= Int.MaxValue,
        s"quantileDisc: selected partition holds > Int.MaxValue rows " +
          s"(offset $localOffset) — raise spark.sql.shuffle.partitions")
      val offset = localOffset
      sorted
        .mapPartitionsWithIndex((i, it) =>
          if (i == target) it.slice(offset.toInt, offset.toInt + 1) else Iterator.empty)
        .collect()
        .head
    } finally {
      sorted.unpersist(blocking = false)
      ()
    }
  }
}
