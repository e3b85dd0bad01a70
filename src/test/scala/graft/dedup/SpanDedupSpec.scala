package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("drops later occurrences of a repeated span, keeps the first, rebuilds in order") {
    val docs = Seq(
      (0L, "a b c d e f"),          // spans (k=3): "a b c", "d e f"
      (1L, "a b c x y z"),          // "a b c" repeats -> dropped
      (2L, "x y z a b c")           // both spans already seen -> empty
    ).toDF("doc_id", "text")
    val out = SpanDedup.dropRepeatedSpans(docs, "text", "doc_id", spanWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out === Array(
      (0L, 2L, 2L, "a b c d e f"),
      (1L, 2L, 1L, "x y z"),
      (2L, 2L, 0L, "")))
  }

  test("partial tail span dedups independently; empty docs survive with zero spans") {
    val docs = Seq(
      (0L, "p q r s"),   // spans: "p q r", "s"
      (1L, "s"),         // tail "s" already seen
      (2L, "")
    ).toDF("doc_id", "text")
    val out = SpanDedup.dropRepeatedSpans(docs, "text", "doc_id", spanWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out === Array(
      (0L, 2L, 2L, "p q r s"),
      (1L, 1L, 0L, ""),
      (2L, 0L, 0L, "")))
  }

  test("identical documents keep exactly one full copy") {
    val docs = Seq.tabulate(4)(i => (i.toLong, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"))
      .toDF("doc_id", "text")
    val out = SpanDedup.dropRepeatedSpans(docs, "text", "doc_id", spanWords = 5)
      .orderBy("doc_id").collect()
    assert(out.head.getLong(2) === 3L) // doc 0 keeps all 3 spans
    assert(out.tail.forall(_.getLong(2) === 0L))
    assert(out.head.getString(3) === "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")
  }
}
