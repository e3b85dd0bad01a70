package graft.similarity

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "spark spark spark shuffle"),
      (2L, "spark join merge"),
      (3L, "window sort batch"),
      (4L, "totally unrelated words here"))
      .toDF("doc_id", "text")
  }

  test("ranks higher-tf docs first; non-matching docs are absent") {
    val hits = Bm25.search(docs, "text", "doc_id", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.map(_._1).toSeq == Seq(1L, 2L)) // doc 1 has tf=3 vs tf=1
    assert(hits.forall(_._2 > 0))
  }

  test("multi-term scores are additive and rarity boosts idf") {
    val hits = Bm25.search(docs, "text", "doc_id", Seq("spark", "window"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L, 3L))
  }

  test("k bounds the result set") {
    val hits = Bm25.search(docs, "text", "doc_id", Seq("spark"), k = 1).collect()
    assert(hits.length == 1 && hits.head.getLong(0) == 1L)
  }

  test("empty term list is rejected") {
    intercept[IllegalArgumentException] {
      Bm25.search(docs, "text", "doc_id", Seq.empty)
    }
  }

  test("scores are bit-deterministic across evaluations (sorted fold)") {
    val a = Bm25.search(docs, "text", "doc_id", Seq("spark", "join", "window"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Bm25.search(docs, "text", "doc_id", Seq("spark", "join", "window"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }
}
