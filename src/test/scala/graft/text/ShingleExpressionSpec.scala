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

  private def winnow(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) =
    df.select(col("doc_id"),
        explode(TextAnalysis.winnowFingerprints(col("text"), k, w)).as("f"))
      .select(col("doc_id"), col("f.pos"), col("f.fp"))
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

  test("winnowing selects the rightmost window minimum once per run") {
    val docs = Seq((0L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = winnow(docs, 2, 3)
    // positions strictly increase and every consecutive window is covered
    val pos = out.map(_._2)
    assert(pos.toSeq == pos.distinct.toSeq && pos.sameElements(pos.sorted))
    // density: m=9 shingles, w=3 -> between m/w and m fingerprints
    assert(out.length >= 3 && out.length <= 9)
    // each fingerprint is the min of its covering window (re-derive keys)
    val keys = docs.select(org.apache.spark.sql.graft.Bridge.column(
      ShingleKeysExpr(org.apache.spark.sql.graft.Bridge.expression(col("text")), 2)))
      .head().getSeq[Long](0)
    out.foreach { case (_, p, fp) => assert(keys(p) == fp) }
  }

  test("winnowing guarantee: documents sharing a long run share a fingerprint") {
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (0L, s"alpha beta $shared gamma delta"),
      (1L, s"x1 x2 x3 x4 $shared y1 y2")).toDF("doc_id", "text")
    val (k, w) = (3, 4) // shared run of 10 >= w+k-1 = 6 tokens
    val fps = winnow(docs, k, w).groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((fps(0L) intersect fps(1L)).nonEmpty)
  }

  test("winnowing short docs emit exactly one fingerprint; empty none") {
    val docs = Seq((0L, "a b c"), (1L, "")).toDF("doc_id", "text")
    val out = winnow(docs, 2, 5) // 2 shingles < w
    assert(out.count(_._1 == 0L) == 1 && !out.exists(_._1 == 1L))
  }

  test("winnow near-dup pairs: guaranteed recall on long shared runs, none on disjoint text") {
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (0L, s"alpha beta $shared gamma delta"),
      (1L, s"x1 x2 x3 x4 $shared y1 y2"),
      (2L, "totally different words everywhere here now")).toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup
      .winnowNearDuplicates(docs, "text", "doc_id",
        shingleWords = 3, window = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }
}
