package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): Map[String, Any] = {
    val m = GopherRules.metrics(col("text"))
    val row = Seq(Tuple1(text)).toDF("text")
      .select(m.map { case (n, c) => c.as(n) }: _*).collect().head
    m.map(_._1).zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
  }

  test("hand-derivable metrics on a constructed document") {
    // 10 words, lengths summing to 41; one '#'; one '...' ; stops: the, of
    val text = "the cat of doom sat ### quietly watching stars fall... end"
    val m = run(text)
    assert(m("n_words") === 11L)
    assert(m("stop_hits") === 2L)
    // mean word length: total chars of the 11 whitespace words / 11
    val words = text.split("\\s+").filter(_.nonEmpty)
    assert(math.abs(m("mean_word_len").asInstanceOf[Double] -
      words.map(_.length).sum.toDouble / words.length) < 1e-9)
    // symbols: 3 hashes + 1 ellipsis = 4 / 11 words > 0.1 -> keep false
    assert(math.abs(m("symbol_ratio").asInstanceOf[Double] - 4.0 / 11) < 1e-9)
    assert(m("keep") === false) // fails word-count floor AND symbol ratio
  }

  test("a clean long document keeps; rule violations flip it") {
    val base = Seq.fill(10)("the quick brown fox jumps over that lazy dog with ease").mkString(" ")
    assert(run(base)("keep") === true)
    // all-digit words break the alpha fraction
    val digits = base + " " + Seq.fill(60)("12345").mkString(" ")
    val dm = run(digits)
    assert(dm("alpha_frac").asInstanceOf[Double] < 0.8 && dm("keep") === false)
    // bullet lines break the bullet fraction
    val bullets = (1 to 20).map(i => s"- item $i").mkString("\n")
    assert(run(bullets)("bullet_frac").asInstanceOf[Double] > 0.9)
  }

  test("stop hits count DISTINCT stop words, not occurrences") {
    val m = run(Seq.fill(50)("the the the word").mkString(" "))
    assert(m("stop_hits") === 1L) // only 'the', however many times
    assert(m("keep") === false)
  }

  test("U+2026 ellipsis counts as a symbol and as a line ender, like '...'") {
    // two words, one '…' + one '...' symbol → symbol_ratio 2/2; both
    // lines end in an ellipsis (one ASCII, one Unicode) → ellipsis_frac 1
    val m = run("wait…\nmore...")
    assert(math.abs(m("symbol_ratio").asInstanceOf[Double] - 1.0) < 1e-9, m)
    assert(math.abs(m("ellipsis_frac").asInstanceOf[Double] - 1.0) < 1e-9, m)
  }

  test("null and empty text produce zeroed metrics, keep = false") {
    for (t <- Seq(null.asInstanceOf[String], "", "   ")) {
      val m = run(t)
      assert(m("n_words") === 0L)
      assert(m("keep") === false)
    }
  }

  test("ccnet buckets: per-lang terciles are balanced and deterministic") {
    val q = graft.SparkEntry.queries("q_ccnet_buckets")
    val out = q(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 500)
    val byLang = out.groupBy(_.getString(1))
    byLang.foreach { case (lang, rows) =>
      val counts = rows.groupBy(_.getString(3)).map { case (b, r) => b -> r.length }
      // ntile(3): bucket sizes differ by at most 1
      assert(counts.values.max - counts.values.min <= 1, s"$lang: $counts")
      // head scores <= middle <= tail score ranges
      def scores(b: String) = rows.filter(_.getString(3) == b).map(_.getDouble(2))
      assert(scores("head").max <= scores("middle").min + 1e-9, lang)
      assert(scores("middle").max <= scores("tail").min + 1e-9, lang)
    }
    val again = q(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
