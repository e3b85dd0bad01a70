package graft.topic

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Chunking boundary tests ported from the reference
  * (`src/topic_modeling/chunking.rs:348-439`) with the same injectable
  * token counters. */
class ChunkingSpec extends AnyFunSuite {

  private def chunks(doc: String, cfg: Chunking.Config, counter: String => Int): Vector[String] =
    Chunking.chunkDocument(0L, doc, cfg, counter).map(_.text)

  private val wordTokens: String => Int = _.split("\\s+").count(_.nonEmpty)
  private val charTokens: String => Int = _.count(!_.isWhitespace)

  test("short document yields single chunk") {
    val out = chunks("A short sentence about cats.", Chunking.Config(64, 0), wordTokens)
    assert(out.length == 1 && out.head.contains("cats"))
  }

  test("empty/whitespace documents produce no chunks") {
    assert(chunks("   ", Chunking.Config(), wordTokens).isEmpty)
    assert(Chunking.chunkDocument(0L, null).isEmpty)
  }

  test("paragraph boundaries are first split") {
    val out = chunks("alpha beta.\n\ngamma delta.", Chunking.Config(3, 0), wordTokens)
    assert(out == Vector("alpha beta.", "gamma delta."))
  }

  test("sentence boundaries split oversized paragraphs") {
    val out = chunks("alpha beta. gamma delta.", Chunking.Config(3, 0), wordTokens)
    assert(out == Vector("alpha beta.", "gamma delta."))
  }

  test("long sentence falls back to token-length chunks") {
    val out = chunks("one two three four five", Chunking.Config(2, 0), wordTokens)
    assert(out == Vector("one two", "three four", "five"))
  }

  test("overlap carries suffix units into next chunk") {
    val out = chunks("a b. c d. e f.", Chunking.Config(4, 2), wordTokens)
    assert(out == Vector("a b. c d.", "c d. e f."))
  }

  test("cjk sentence punctuation is respected") {
    val out = chunks("你好世界。再见世界！", Chunking.Config(5, 0), charTokens)
    assert(out == Vector("你好世界。", "再见世界！"))
  }

  test("chunk indices are ordinal per document") {
    val cs = Chunking.chunkDocument(7L, "one two three four five", Chunking.Config(2, 0), wordTokens)
    assert(cs.map(_.chunkIndex) == Vector(0, 1, 2))
    assert(cs.forall(_.docIndex == 7L))
  }
}

/** c-TF-IDF / rollup / coords invariants from the reference's inline tests
  * (`ctfidf.rs:138-179`, `rollup.rs:134-218`, `coords.rs:61-85`). */
class TopicAlgebraSpec extends SparkSpec {

  import spark.implicits._

  test("ctfidf: distinctive terms outrank ubiquitous terms") {
    // "shared" appears in both topics; "alpha"/"beta" are topic-specific.
    val counts = Seq(
      ("A", "alpha", 5L), ("A", "shared", 5L),
      ("B", "beta", 5L), ("B", "shared", 5L)).toDF("topic", "token", "cnt")
    val res = Ctfidf.topTerms(counts, topK = 5)
      .orderBy("topic", "rank")
      .as[(String, Long, String, Double)]
      .collect()
    val byTopic = res.groupBy(_._1)
    assert(byTopic("A").head._3 == "alpha")
    assert(byTopic("B").head._3 == "beta")
    val aScores = byTopic("A").map(r => r._3 -> r._4).toMap
    assert(aScores("alpha") > aScores("shared"))
  }

  test("ctfidf: respects top_k, sorted descending, alphabetical ties") {
    val counts = Seq(
      ("t", "a", 1L), ("t", "b", 2L), ("t", "c", 3L), ("t", "d", 4L)).toDF("topic", "token", "cnt")
    val res = Ctfidf.topTerms(counts, topK = 2).orderBy("rank")
      .as[(String, Long, String, Double)].collect()
    assert(res.length == 2)
    assert(res(0)._4 >= res(1)._4)
    // equal counts → equal scores → alphabetical
    val ties = Seq(("t", "z", 1L), ("t", "y", 1L)).toDF("topic", "token", "cnt")
    val tied = Ctfidf.topTerms(ties, topK = 2).orderBy("rank")
      .as[(String, Long, String, Double)].collect()
    assert(tied.map(_._3).toSeq == Seq("y", "z"))
  }

  test("rollup: long doc gets multi-topic distribution summing to 1") {
    val chunks = Seq((0L, 0), (0L, 0), (0L, 1), (0L, -1)).toDF("doc_id", "label")
    val out = Rollup.rollup(chunks).orderBy("topic_id")
      .as[(Long, Int, Double, Int)].collect()
    assert(out.map(_._2).toSeq == Seq(-1, 0, 1))
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-9)
    assert(out.forall(_._4 == 0)) // topic 0 dominates
    assert(out.find(_._2 == 0).get._3 == 0.5)
  }

  test("rollup: dominant tie breaks to smaller id; all-outlier doc → -1") {
    val tie = Seq((0L, 2), (0L, 1)).toDF("doc_id", "label")
    assert(Rollup.rollup(tie).select("dominant_topic").as[Int].head() == 1)
    val outliers = Seq((0L, -1), (0L, -1)).toDF("doc_id", "label")
    val o = Rollup.rollup(outliers).as[(Long, Int, Double, Int)].collect()
    assert(o.length == 1 && o.head._2 == -1 && o.head._3 == 1.0 && o.head._4 == -1)
  }

  test("corpus soft sizes sum proportions excluding outliers") {
    val docTopics = Seq(
      (0L, 0, 0.5, 0), (0L, 1, 0.5, 0),
      (1L, -1, 0.25, 0), (1L, 0, 0.75, 0)).toDF("doc_id", "topic_id", "proportion", "dominant_topic")
    val corpus = Seq((0L, 0), (1L, 1)).toDF("doc_id", "corpus")
    val sizes = Rollup.corpusTopicSizes(docTopics, corpus)
      .orderBy("corpus", "topic_id")
      .as[(Int, Int, Double)].collect()
    assert(sizes.toSeq == Seq((0, 0, 0.5), (0, 1, 0.5), (1, 0, 0.75)))
  }

  test("coords: centroid of member chunks, outliers ignored") {
    val points = Seq(
      (0, 0.0, 0.0), (0, 2.0, 2.0), (1, 10.0, 10.0), (-1, 999.0, 999.0))
      .toDF("label", "x", "y")
    val out = Coords.topicCoords(points).orderBy("label").as[(Int, Double, Double)].collect()
    assert(out.toSeq == Seq((0, 1.0, 1.0), (1, 10.0, 10.0)))
  }
}
