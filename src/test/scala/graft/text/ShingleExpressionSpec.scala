package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def fused(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(col("doc_id"), org.apache.spark.sql.graft.Bridge.column(
      ShingleKeysExpr(org.apache.spark.sql.graft.Bridge.expression(col("text")), k)).as("keys"))

  test("fused keys equal the compositional fnv1a64-over-joined-slice formulation") {
    val docs = Seq(
      (0L, "The Quick, brown fox! jumps over the lazy dog"),
      (1L, "short"),
      (2L, ""),
      (3L, "a b c a b c a b c")).toDF("doc_id", "text")
    val k = 3
    val toks = transform(Tokenize.tokenize(col("text")), t => t.getField("token"))
    val reference = docs.select(col("doc_id"),
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - lit(k)),
          i => TextAnalysis.fnv1a64(array_join(slice(toks, i + lit(1), lit(k)), " "))))
        .otherwise(array().cast("array<bigint>")).as("keys"))
    val a = fused(docs, k).orderBy("doc_id").collect().map(r => r.getSeq[Long](1))
    val b = reference.orderBy("doc_id").collect().map(r => r.getSeq[Long](1))
    assert(a.toSeq == b.toSeq)
    assert(a(0).nonEmpty && a(1).isEmpty && a(2).isEmpty)
    // repeated phrase -> repeated keys at the right offsets
    assert(a(3)(0) == a(3)(3) && a(3)(3) == a(3)(6))
  }

  test("null text yields an empty key array") {
    val docs = Seq((0L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(fused(docs, 2).head().getSeq[Long](1).isEmpty)
  }
}
