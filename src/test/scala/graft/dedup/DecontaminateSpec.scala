package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {

  private def run(train: Seq[String], test: Seq[(Long, String)], n: Int, minOverlap: Int = 1) = {
    import spark.implicits._
    Decontaminate.overlap(
      train.toDF("text"),
      test.toDF("doc_id", "text"),
      "text", "doc_id", n = n, minOverlap = minOverlap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a copied span is flagged; clean docs are not") {
    val hits = run(
      train = Seq("the quick brown fox jumps over the lazy dog"),
      test = Seq(
        (1L, "something quick brown fox ending"), // shares "quick brown fox"
        (2L, "completely different words here")),
      n = 3)
    assert(hits == Map(1L -> 1L))
  }

  test("n_hits counts distinct contaminated grams, not occurrences") {
    val hits = run(
      train = Seq("a b c d"),
      test = Seq((1L, "a b c a b c x b c d")), // "a b c" twice + "b c a","c a b","b c d"...
      n = 3)
    // distinct test grams also in train: "a b c", "b c d"
    assert(hits == Map(1L -> 2L))
  }

  test("minOverlap raises the reporting threshold") {
    val hits = run(
      train = Seq("a b c d"),
      test = Seq((1L, "a b c only")),
      n = 3, minOverlap = 2)
    assert(hits.isEmpty)
  }

  test("docs shorter than n contribute no grams") {
    val hits = run(train = Seq("a b"), test = Seq((1L, "a b")), n = 3)
    assert(hits.isEmpty)
  }

  test("cross-domain matrix counts distinct shared grams per unordered pair") {
    import spark.implicits._
    val docs = Seq(
      ("en", "a b c d"),       // grams: "a b c", "b c d"
      ("en", "a b c x"),       // re-contributes "a b c" (distinct once)
      ("de", "a b c y"),       // shares "a b c" with en and fr
      ("fr", "a b c d e"),     // shares "a b c" AND "b c d" with en
      ("zh", "p q r s")        // shares nothing
    ).toDF("lang", "text")
    val out = Decontaminate.crossDomainOverlap(docs, "text", "lang", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("de", "en") -> 1L, ("de", "fr") -> 1L, ("en", "fr") -> 2L))
  }
}
