package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bitwise-parity pins for the native similarity expressions: the whole
  * reason [[Similarity.cosineFast]] / [[Similarity.intDot]] may replace
  * the Column formulations on oracle-checked paths is that the values —
  * including nulls — are IDENTICAL, not merely close. */
class NativeSimExprSpec extends SparkSpec {

  import spark.implicits._

  test("cosineFast == cosine bitwise on random vectors and every edge case") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Seq[Float], Seq[Float])] =
      (0L until 200L).map { i =>
        (i,
          Seq.fill(64)(rnd.nextGaussian().toFloat),
          Seq.fill(64)(rnd.nextGaussian().toFloat))
      } ++ Seq(
        (900L, Seq.empty[Float], Seq.empty[Float]), // empty → null
        (901L, Seq(1f, 2f), Seq(1f)), //              mismatched → null
        (902L, Seq(0f, 0f), Seq(1f, 1f)), //          zero norm → null
        (903L, Seq(1f, 1f), Seq(0f, 0f)),
        (904L, Seq(3f, 4f), Seq(3f, 4f))) //          exact 1.0
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        Similarity.cosine(col("a"), col("b")).as("hof"),
        Similarity.cosineFast(col("a"), col("b")).as("native"))
    // bitwise: compare raw Double bits, not approximate equality
    val bad = df
      .filter(
        (col("hof").isNull =!= col("native").isNull) ||
          (col("hof").isNotNull && col("hof") =!= col("native")))
      .count()
    assert(bad == 0)
    val exact = df.filter(col("id") === 904L).select("native").as[Double].head()
    assert(exact == 1.0)
  }

  test("intDot == aggregate(zip_with) bitwise on the full int8 code domain + nulls") {
    // (int-overflow behavior intentionally NOT compared: ANSI mode makes
    // the HOF formulation throw while the fused loop wraps — both
    // unreachable for ±127 quantized codes, documented in IntDotExpr)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")), lit(0L), (acc, v) => acc + v)
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Seq[Integer], Seq[Integer])] =
      (0L until 200L).map { i =>
        (i,
          Seq.fill(64)(Int.box(rnd.nextInt(255) - 127)),
          Seq.fill(64)(Int.box(rnd.nextInt(255) - 127)))
      } ++ Seq(
        (900L, Seq(Int.box(1)), Seq.empty[Integer]), //    mismatched → null
        (901L, Seq(Int.box(1), null), Seq(Int.box(2), Int.box(3))), // null elem → null
        (902L, Seq(Int.box(127), Int.box(-127)), Seq(Int.box(127), Int.box(127)))) // domain extremes
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        hofDot(col("a"), col("b")).as("hof"),
        Similarity.intDot(col("a"), col("b")).as("native"))
    val bad = df
      .filter(
        (col("hof").isNull =!= col("native").isNull) ||
          (col("hof").isNotNull && col("hof") =!= col("native")))
      .count()
    assert(bad == 0)
    assert(df.filter(col("id") === 902L).select("native").as[java.lang.Long].head() == 0L)
  }
}
