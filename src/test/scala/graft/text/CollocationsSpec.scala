package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed co-occurrence counts ordered pairs at distance 1..k, never across docs") {
    val docs = Seq((0L, "a b c d"), (1L, "d a")).toDF("doc_id", "text")
    val out = Collocations.cooccurrenceCounts(docs, "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 0, d=1: (a,b),(b,c),(c,d); d=2: (a,c),(b,d); doc 1, d=1: (d,a)
    assert(out === Map(
      ("a", "b") -> 1L, ("b", "c") -> 1L, ("c", "d") -> 1L,
      ("a", "c") -> 1L, ("b", "d") -> 1L, ("d", "a") -> 1L))
    // no (d, *) pair spanning the doc 0 -> doc 1 boundary beyond doc 1's own
    assert(!out.contains(("c", "a")) && !out.contains(("d", "d")))
  }

  test("window = 1 coincides with adjacent bigram counts") {
    val docs = Seq((0L, "x y x y z"), (1L, "z z x")).toDF("doc_id", "text")
    val co = Collocations.cooccurrenceCounts(docs, "text", window = 1)
      .orderBy("w1", "w2").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bi = Collocations.bigramCounts(docs, "text")
      .orderBy("w1", "w2").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(co.toSeq === bi.toSeq)
  }

  test("short docs contribute only the offsets they can support") {
    val docs = Seq((0L, "a b"), (1L, "c")).toDF("doc_id", "text")
    val out = Collocations.cooccurrenceCounts(docs, "text", window = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("a", "b") -> 1L))
  }

  test("maxTokensPerDoc caps the pairs a mega-document can materialize") {
    val docs = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    val out = Collocations.cooccurrenceCounts(docs, "text", window = 2, maxTokensPerDoc = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // only the first 3 tokens participate: d=1 (a,b),(b,c); d=2 (a,c)
    assert(out === Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("a", "c") -> 1L))
  }
}
