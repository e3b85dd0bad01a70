package graft.similarity

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for float-array cosine similarity.
  *
  * Value-identical to the [[Similarity.cosine]] Column formulation
  * (`float→double` casts are exact, dot and both norms fold
  * left-to-right in double, `dot / (√na2 · √nb2)`, null on length
  * mismatch / empty / zero norm) — but the Column version is built from
  * higher-order array functions (`transform`/`zip_with`/`aggregate`),
  * which are CodegenFallback: every row detours through interpreted
  * eval with boxed lambdas. Fine for a few thousand brute-force rows;
  * a scan bottleneck for the millions of within-cell pairs SemDeDup
  * scores (measured 17 s → ~1 s for `q_semdedup` at sf0.1). This
  * expression does the one fused loop inside whole-stage codegen, the
  * [[NearestCellsExpr]] pattern applied to a binary input. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input).asInstanceOf[ArrayData]
    if (a == null) return null
    val b = right.eval(input).asInstanceOf[ArrayData]
    if (b == null) return null
    CosineSimExpr.run(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = CosineSimExpr.getClass.getName
    val r = ctx.freshName("cosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = $helper.MODULE$$.run($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Shared by interpreted `eval` and generated code. Returns a boxed
    * Double, or null for mismatched/empty arrays or a zero norm — the
    * [[Similarity.cosine]] `when` contract. */
  def run(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n == 0 || b.numElements() != n) return null
    var dot = 0.0
    var na2 = 0.0
    var nb2 = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na2 += x * x
      nb2 += y * y
      i += 1
    }
    val na = math.sqrt(na2)
    val nb = math.sqrt(nb2)
    if (na > 0.0 && nb > 0.0) Double.box(dot / (na * nb)) else null
  }
}
