package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainMixSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 2000L).map { i =>
    (i, if (i % 2 == 0) "en" else "zh", s"doc $i")
  }.toDF("doc_id", "lang", "text")

  test("retention tracks the per-domain rates; gate is deterministic") {
    val rates = Map("en" -> 0.5, "zh" -> 0.1)
    val out = DomainMix.sample(corpus, "lang", "doc_id", rates, defaultRate = 0.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 docs per domain; hash gate should land within a loose CLT band
    assert(byLang("en") > 400 && byLang("en") < 600, byLang)
    assert(byLang("zh") > 40 && byLang("zh") < 200, byLang)
    // deterministic: the same call yields the same sample
    val again = DomainMix.sample(corpus, "lang", "doc_id", rates, defaultRate = 0.0)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("rate 1.0 keeps everything, 0.0 drops everything, default applies to unlisted") {
    val out = DomainMix.sample(corpus, "lang", "doc_id",
      Map("en" -> 1.0), defaultRate = 0.0)
    assert(out.filter(col("lang") === "en").count() === 1000)
    assert(out.filter(col("lang") === "zh").count() === 0)
  }

  test("distinct seeds draw different samples") {
    val a = DomainMix.sample(corpus, "lang", "doc_id", Map.empty, 0.5, seed = "a:")
    val b = DomainMix.sample(corpus, "lang", "doc_id", Map.empty, 0.5, seed = "b:")
    assert(a.exceptAll(b).count() > 0)
  }
}
