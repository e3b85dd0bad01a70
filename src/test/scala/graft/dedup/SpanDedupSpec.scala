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

  private def s1(docs: org.apache.spark.sql.DataFrame, k: Int) =
    SpanDedup.dropRepeatedShingles(docs, "text", "doc_id", shingleWords = k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))

  test("stride-1: catches a repeat at an arbitrary offset the fixed grid misses") {
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "x a b c y z")  // "a b c" repeats OFF the 3-token grid of doc 1
    ).toDF("doc_id", "text")
    // fixed-grid span dedup sees spans "x a b"/"c y z" -> drops nothing
    val grid = SpanDedup.dropRepeatedSpans(docs, "text", "doc_id", spanWords = 3)
      .orderBy("doc_id").collect()
    assert(grid(1).getLong(2) === 2L)
    // stride-1 finds the shingle at offset 1 and erodes positions 1..3
    val out = s1(docs, 3)
    assert(out(1) === (1L, 6L, 4L, 1L, 3L, "x y z"))
    assert(out(0) === (0L, 6L, 4L, 0L, 6L, "a b c d e f"))
  }

  test("stride-1: overlapping self-repeats erode to the first clean copy") {
    val docs = Seq((0L, "a a a a a")).toDF("doc_id", "text")
    // shingles (k=2) at 0..3 share one key; starts 1,2,3 are dups covering
    // positions 1..4 -> only position 0 survives
    val out = s1(docs, 2)
    assert(out(0) === (0L, 5L, 4L, 3L, 1L, "a"))
  }

  test("stride-1: short and empty docs pass through untouched") {
    val docs = Seq((0L, "a b"), (1L, ""), (2L, "solo")).toDF("doc_id", "text")
    val out = s1(docs, 3)
    assert(out === Array(
      (0L, 2L, 0L, 0L, 2L, "a b"),
      (1L, 0L, 0L, 0L, 0L, ""),
      (2L, 1L, 0L, 0L, 1L, "solo")))
  }
}
