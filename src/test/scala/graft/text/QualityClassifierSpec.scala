package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    (0L, true, "good clean prose about spark and data"),
    (1L, true, "clean prose with spark data and words"),
    (2L, false, "spam spam spam buy now buy now"),
    (3L, false, "buy spam now spam buy spam"),
    (4L, true, "prose about data and spark again"),
    (5L, false, "now now buy buy spam spam")).toDF("doc_id", "pos", "text")

  test("separates the classes it was fit on") {
    val out = QualityClassifier
      .naiveBayesScore(corpus(), "text", "doc_id", col("pos"), dim = 1 << 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    // positive-class docs score positive, spam negative (strong vocabulary split)
    assert(Seq(0L, 1L, 4L).forall(d => out(d)._1 > 0 && out(d)._2))
    assert(Seq(2L, 3L, 5L).forall(d => out(d)._1 < 0 && !out(d)._2))
  }

  test("pred binds to the rounded llr") {
    val out = QualityClassifier
      .naiveBayesScore(corpus(), "text", "doc_id", col("pos"), dim = 1 << 10)
      .collect()
    out.foreach(r => assert(r.getBoolean(3) == (r.getDouble(2) > 0)))
  }

  test("requires both classes") {
    intercept[IllegalArgumentException] {
      QualityClassifier.naiveBayesScore(
        corpus().filter(col("pos")), "text", "doc_id", col("pos"))
    }
  }

  test("deterministic across runs") {
    val a = QualityClassifier.naiveBayesScore(corpus(), "text", "doc_id", col("pos"), dim = 64)
      .orderBy("doc_id").collect().toSeq
    val b = QualityClassifier.naiveBayesScore(corpus(), "text", "doc_id", col("pos"), dim = 64)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
