package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    (0L, "en", "the quick brown fox jumps over the lazy dog"),
    (1L, "en", "the quick brown cat naps under the warm sun"),
    (2L, "de", "der schnelle braune fuchs springt heute weit"),
    (3L, "de", "die warme sonne scheint heute sehr hell"),
    (4L, "en", "the lazy dog naps under the brown tree")).toDF("doc_id", "lang", "text")

  test("target-like documents outweigh off-domain ones") {
    val docs = corpus()
    val w = Importance
      .importanceWeights(docs, docs.filter(col("lang") === "en"), "text", "doc_id", dim = 1 << 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every doc is scored (all have >= 2 tokens)
    assert(w.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // the en docs' bigrams exist in the target model; the de docs' never do
    val minEn = Seq(0L, 1L, 4L).map(w).min
    val maxDe = Seq(2L, 3L).map(w).max
    assert(minEn > maxDe, s"en floor $minEn should beat de ceiling $maxDe")
  }

  test("short documents without a bigram are excluded") {
    val docs = Seq((0L, "ab"), (1L, "one two three")).toDF("doc_id", "text")
    val out = Importance.importanceWeights(docs, docs, "text", "doc_id", dim = 64)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("deterministic across runs") {
    val docs = corpus()
    def run() = Importance
      .importanceWeights(docs, docs.filter(col("lang") === "en"), "text", "doc_id", dim = 1 << 12)
      .orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }
}
