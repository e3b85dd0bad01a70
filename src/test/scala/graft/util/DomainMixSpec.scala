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

  // 9:1 skewed corpus for the temperature tests
  private def skewed = (0L until 2000L).map { i =>
    (i, if (i % 10 == 0) "rare" else "big", s"doc $i")
  }.toDF("doc_id", "lang", "text")

  test("temperature mixture keeps a larger fraction of rare domains") {
    val out = DomainMix.temperatureSample(skewed, "lang", "doc_id", frac = 0.5)
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // α=0.5 targets q ∝ sqrt(p): rare (10%) should retain a clearly larger
    // share of itself than big (90%) — exact thresholds: rare keeps 100%
    // (rate clamps at 1), big ~44%
    val rareFrac = kept("rare").toDouble / 200
    val bigFrac = kept("big").toDouble / 1800
    assert(rareFrac > bigFrac + 0.2, s"rare=$rareFrac big=$bigFrac")
    // expected size ≈ frac·N within a CLT band
    val total = kept.values.sum
    assert(total > 800 && total < 1200, total)
  }

  test("temperature mixture is deterministic; frac=1 keeps a balanced corpus whole") {
    val a = DomainMix.temperatureSample(skewed, "lang", "doc_id", 0.5)
    val b = DomainMix.temperatureSample(skewed, "lang", "doc_id", 0.5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // balanced domains → q == p → every rate clamps to 1 at frac=1;
    // a SKEWED corpus at frac=1 must still down-sample abundant domains
    // toward the sqrt composition (expected Σ min(n_d, N·q_d) < N)
    assert(DomainMix.temperatureSample(corpus, "lang", "doc_id", 1.0).count() === 2000)
    val skewedKept = DomainMix.temperatureSample(skewed, "lang", "doc_id", 1.0).count()
    assert(skewedKept < 1800 && skewedKept > 1500, skewedKept)
  }
}
