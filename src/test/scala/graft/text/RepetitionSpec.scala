package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {

  private def metricsOf(text: String): Map[String, Any] = {
    import spark.implicits._
    val cols = Repetition.repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }
    val row = Seq(text).toDF("text").select(cols: _*).head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("hand-checked metrics: 'a a b'") {
    val m = metricsOf("a a b")
    assert(m("n_words") == 3L)
    assert(math.abs(m("dup_word_frac").asInstanceOf[Double] - 1.0 / 3) < 1e-12)
    assert(math.abs(m("top_word_frac").asInstanceOf[Double] - 2.0 / 3) < 1e-12)
    assert(m("dup_bigram_frac") == 0.0) // "a a", "a b" — both unique
    assert(m("max_word_run") == 2L)
  }

  test("hand-checked metrics: alternating 'x y x y x' has duplicate bigrams but no runs") {
    val m = metricsOf("x y x y x")
    assert(m("n_words") == 5L)
    assert(math.abs(m("dup_word_frac").asInstanceOf[Double] - 0.6) < 1e-12)
    assert(math.abs(m("top_word_frac").asInstanceOf[Double] - 0.6) < 1e-12)
    // bigrams: xy yx xy yx → 4 total, 2 distinct
    assert(math.abs(m("dup_bigram_frac").asInstanceOf[Double] - 0.5) < 1e-12)
    assert(m("max_word_run") == 1L)
  }

  test("empty and null text yield zeros") {
    for (t <- Seq("", null.asInstanceOf[String])) {
      val m = metricsOf(t)
      assert(m("n_words") == 0L)
      assert(m("dup_word_frac") == 0.0)
      assert(m("top_word_frac") == 0.0)
      assert(m("dup_bigram_frac") == 0.0)
      assert(m("max_word_run") == 0L)
    }
  }

  test("single word: degenerate but defined") {
    val m = metricsOf("solo")
    assert(m("n_words") == 1L)
    assert(m("dup_word_frac") == 0.0)
    assert(m("top_word_frac") == 1.0)
    assert(m("dup_bigram_frac") == 0.0) // no bigrams at all
    assert(m("max_word_run") == 1L)
  }

  test("repetitionGate rejects degenerate docs, passes varied ones") {
    import spark.implicits._
    val df = Seq(
      ("degenerate", "spam spam spam spam spam spam"),
      ("varied", "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val kept = df.filter(Repetition.repetitionGate(col("text")))
      .select("id").as[String].collect().toSet
    assert(kept == Set("varied"))
  }

  test("metrics are a pure elementwise projection — no shuffle, no UDF") {
    import spark.implicits._
    val cols = Repetition.repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }
    val plan = Seq("a b c").toDF("text").select(cols: _*)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
