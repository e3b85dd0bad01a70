package graft.similarity

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for IVF cell routing: `array<float>` →
  * the `nProbe` nearest coarse-quantizer cells as `array<int>`, ordered
  * by (squared distance, cell id) — `nProbe = 1` is plain assignment.
  *
  * Replaces the `udf(nearestCell)` / `udf(nearestCells)` closures: same
  * doubles (the [[Similarity]] `dist2` left-to-right fold the oracle
  * re-derives), but the scan stays codegen'd and vector components are
  * read straight from `ArrayData` instead of boxing through
  * `Seq[Float]`. The trained centroid matrix is embedded via codegen's
  * reference-object mechanism — driver-computed config shipped once per
  * plan, the `trainedCentroids` shared-config pattern. */
case class NearestCellsExpr(child: Expression, centroids: Array[Array[Float]], nProbe: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.nonEmpty && nProbe >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires non-empty centroids and nProbe >= 1")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "nearest_cells"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    if (v == null) null else NearestCellsExpr.run(v, centroids, nProbe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val helper = NearestCellsExpr.getClass.getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.MODULE$$.run($c, $cents, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

object NearestCellsExpr {
  /** Shared by interpreted `eval` and generated code. */
  def run(v: ArrayData, centroids: Array[Array[Float]], nProbe: Int): ArrayData = {
    val arr = v.toFloatArray()
    val cells = Similarity.nearestCells(arr, centroids, nProbe)
    new GenericArrayData(cells.toArray[Any])
  }
}
