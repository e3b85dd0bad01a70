package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (backward) join — the time-series operator Spark SQL lacks as a
  * built-in (beyond-reference extension; the reference library has no join
  * operators at all, they come from the host engine).
  *
  * For every left row, attach the payload of the '''latest right row with
  * `rightTs <= leftTs`''' within the same key group (the "most recent
  * quote for this trade", "last profile update before this event" shape).
  *
  * Plan (the 100 TB contract): tag both sides, union, and run ONE
  * `last(_, ignoreNulls)` window over a growing frame ordered by
  * `(ts, side)` — a single shuffle keyed on the join keys and a
  * per-partition sort. This never builds the naive
  * `left ⋈ right ON key AND r.ts <= l.ts` range join, whose per-key
  * all-pairs blowup is O(|L|·|R|) before the "latest" filter, and it
  * needs no broadcast: both sides stream through the same hash partitioning
  * regardless of size. Skewed keys behave like any windowed aggregation
  * (salt upstream if one key dominates).
  *
  * Semantics pinned by `AsofJoinSpec` and the `q_asof_purchase` DuckDB
  * `ASOF LEFT JOIN` oracle:
  *   - a right row at exactly `leftTs` matches (`<=`, not `<`) — the
  *     right side sorts before the left at equal timestamps;
  *   - left rows before any right row keep null payloads (left join);
  *   - right rows with null timestamps are dropped; left rows with null
  *     timestamps match nothing;
  *   - null join keys never match (SQL equi-join semantics — null-keyed
  *     right rows are dropped, null-keyed left rows keep null payloads);
  *   - equal `(key, rightTs)` right rows are resolved arbitrarily —
  *     deduplicate the right side first if that matters (DuckDB's ASOF
  *     has the same contract).
  */
object AsofJoin {

  /** `left` ⟕asof `right` on `on` keys with `rightTs <= leftTs`.
    *
    * Output: all left columns, plus every right column except the `on`
    * keys (null when no right row qualifies). Right payload names must
    * not clash with left column names — rename before joining. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTsCol: String,
      rightTsCol: String): DataFrame = {
    require(on.nonEmpty, "asofJoin needs at least one equi-join key")
    val payloadCols = right.columns.filterNot(on.contains).toSeq
    val clash = payloadCols.intersect(left.columns.toSeq)
    require(
      clash.isEmpty,
      s"right payload columns clash with left columns: ${clash.mkString(", ")} — rename them first")

    val ts = "__asof_ts"
    val side = "__asof_side"
    val pay = "__asof_payload"
    val lrow = "__asof_left"
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    val leftType = StructType(left.schema.fields)

    // Equi-join semantics for nulls: a SQL join never matches on null
    // keys, but a window's partitionBy groups nulls together — drop
    // null-keyed right rows so null-keyed left rows fall through with
    // null payloads instead of matching each other.
    val rightTagged = right
      .filter(on.map(col(_).isNotNull).reduce(_ && _) && col(rightTsCol).isNotNull)
      .select(
        on.map(col) ++ Seq(
          col(rightTsCol).as(ts),
          lit(0).as(side),
          struct(payloadCols.map(col): _*).as(pay),
          lit(null).cast(leftType).as(lrow)): _*)
    val leftTagged = left.select(
      on.map(col) ++ Seq(
        col(leftTsCol).as(ts),
        lit(1).as(side),
        lit(null).cast(payloadType).as(pay),
        struct(left.columns.toIndexedSeq.map(col): _*).as(lrow)): _*)

    // Growing frame + last(ignoreNulls): each left row sees the most recent
    // right payload at or before its timestamp. Nulls-first ordering makes
    // null left timestamps match nothing (only null-ts rights could precede
    // them, and those were dropped).
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightTagged
      .unionByName(leftTagged)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(col(s"$lrow.*") +: payloadCols.map(c => col(s"$pay.$c").as(c)): _*)
  }
}
