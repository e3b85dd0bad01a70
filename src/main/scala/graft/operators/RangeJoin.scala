package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second time-series operator Spark
  * SQL has no scalable built-in for (beyond-reference extension, companion
  * to [[AsofJoin]]).
  *
  * Inner-joins left "point" rows to right "interval" rows on equal keys
  * with `start <= ts <= end` (inclusive). Spark plans a bare
  * `key = key AND ts BETWEEN start AND end` join as a sort-merge join on
  * the key followed by a per-key filter — an O(points × intervals)
  * cross-product within every key group, which is exactly what kills
  * hot-key workloads at scale.
  *
  * Plan here (the 100 TB contract): time is bucketed into `granuleSeconds`
  * granules; each interval explodes into the granules it covers, each
  * point maps to its single granule, and the join runs hash-partitioned on
  * `(key, granule)` with the exact BETWEEN as a post-join filter. Work is
  * O(points + intervals × granules_spanned + true_matches): pick the
  * granule near the typical interval length so intervals span O(1)
  * granules. Every (point, interval) pair meets in exactly one granule —
  * the point's own — so no dedup pass is needed.
  */
object RangeJoin {

  /** `left` ⋈ `right` on `on` keys with
    * `right.startCol <= left.tsCol <= right.endCol`. One output row per
    * qualifying (point, interval) pair; all left columns plus every right
    * column except the `on` keys. Names must be disjoint — rename first.
    * Intervals with null or inverted bounds are dropped; null point
    * timestamps match nothing. */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      tsCol: String,
      startCol: String,
      endCol: String,
      granuleSeconds: Long = 3600L): DataFrame = {
    require(on.nonEmpty, "pointInInterval needs at least one equi-join key")
    require(granuleSeconds > 0, "granuleSeconds must be positive")
    val payloadCols = right.columns.filterNot(on.contains).toSeq
    val clash = payloadCols.intersect(left.columns.toSeq)
    require(
      clash.isEmpty,
      s"right payload columns clash with left columns: ${clash.mkString(", ")} — rename them first")

    val g = "__rj_granule"
    val gran = lit(granuleSeconds)
    val points = left
      .filter(col(tsCol).isNotNull)
      .withColumn(g, floor(col(tsCol).cast("long") / gran))
    val intervals = right
      .filter(col(startCol).isNotNull && col(endCol).isNotNull && col(startCol) <= col(endCol))
      .withColumn(
        g,
        explode(sequence(
          floor(col(startCol).cast("long") / gran),
          floor(col(endCol).cast("long") / gran))))

    points
      .join(intervals, on :+ g)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(g)
  }
}
