package graft.dedup

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the per-document MinHash signature:
  * text → `array<long>` of `numHashes` minima of the seeded universal
  * hash family over the document's shingle set.
  *
  * Value-identical to the former `udf(minHashSignature)` — but signature
  * computation is the fingerprint tier's hottest scan (every shingle is
  * hashed `numHashes` times), and the ScalaUDF wrapper pays the
  * UTF8String→String→Array→Catalyst converter stack per row while
  * breaking whole-stage codegen across the projection. The
  * [[graft.text.ShingleKeysExpr]] escape hatch applied to signatures:
  * `doGenCode` calls one static helper, the scan stays fused. */
case class MinHashExpr(child: Expression, numHashes: Int, shingleSize: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.catalogString}")
    else if (numHashes <= 0 || shingleSize <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires numHashes > 0 and shingleSize > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "minhash_signature"

  override def eval(input: InternalRow): Any =
    MinHashExpr.run(child.eval(input).asInstanceOf[UTF8String], numHashes, shingleSize, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = MinHashExpr.getClass.getName
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $helper.MODULE$$.run(${childGen.isNull} ? null : ${childGen.value},
            $numHashes, $shingleSize, ${seed}L);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

object MinHashExpr {
  /** Shared by interpreted `eval` and generated code. Null hashes as the
    * empty document (all-`Long.MaxValue` signature), the UDF-era
    * contract. */
  def run(s: UTF8String, numHashes: Int, shingleSize: Int, seed: Long): ArrayData =
    new GenericArrayData(
      Dedup.minHashSignature(if (s == null) null else s.toString, numHashes, shingleSize, seed))
}

/** Native Catalyst expression for the 64-bit SimHash fingerprint (FNV
  * token hashes, per-bit majority votes) — the same escape-hatch
  * argument as [[MinHashExpr]]: every token votes on 64 bits, the UDF
  * wrapper was the only non-codegen operator in the fingerprint scan. */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def prettyName: String = "simhash64"

  override def eval(input: InternalRow): Any =
    SimHashExpr.run(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = SimHashExpr.getClass.getName
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} =
          $helper.MODULE$$.run(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  /** Null fingerprints as the empty document (0L), the UDF-era contract. */
  def run(s: UTF8String): Long =
    Dedup.simHash64(if (s == null) null else s.toString)
}
