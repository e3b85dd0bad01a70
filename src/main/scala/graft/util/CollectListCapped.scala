package graft.util

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard element cap — the scale-safe primitive
  * behind [[PostingLists.members]]'s bucket bound.
  *
  * A plain `collect_list` materializes a bucket into ONE unspillable
  * aggregation buffer, so a mega-bucket (millions of exact duplicates
  * sharing an LSH signature) builds a multi-GB row and OOMs; guarding it
  * with a window count forces a full SORT of every band row inside the
  * exchange (the r14 SCALING.md decade-two superlinearity), and guarding
  * it with a count-aggregate + anti-join re-executes the upstream
  * scan/sign pipeline for the count side (column pruning differentiates
  * the two subtrees, so the exchange is NOT reused). This aggregate caps
  * the buffer instead: `update` stops accumulating once the buffer holds
  * `cap + 1` elements and `merge` tops partial buffers up to the same
  * bound, so
  *
  *   - a bucket with ≤ `cap` members aggregates EXACTLY as collect_list
  *     (no partial ever truncates below the bound — the sum of partial
  *     sizes is the true count), and
  *   - an oversized bucket surfaces as a `cap + 1`-element list — a
  *     truncation MARKER the caller drops with `size(...) > cap`,
  *     reproducing the drop-oversized-bucket semantics with bounded
  *     memory AND bounded shuffle (each map-side partial ships at most
  *     `cap + 1` elements per bucket, where the window design shipped
  *     every row).
  *
  * Which elements survive truncation is execution-order-dependent, but
  * truncated lists are dropped by construction, so operator output stays
  * deterministic. */
case class CollectListCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends Collect[mutable.ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  require(cap > 0, "CollectListCapped: cap must be positive")

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length > cap) buffer else super.update(buffer, input)

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = cap + 1 - buffer.length
    if (room <= 0) buffer
    else buffer.addAll(other.view.take(room))
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CollectListCapped =
    copy(child = newChild)

  override def prettyName: String = "collect_list_capped"
}

object CollectListCapped {

  /** Column wrapper: `collect_list` of `payload` that stops growing at
    * `cap + 1` elements (callers filter `size(...) > cap` to drop
    * capped buckets). */
  def collectListCapped(payload: Column, cap: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CollectListCapped(org.apache.spark.sql.graft.Bridge.expression(payload), cap)
        .toAggregateExpression())
}
