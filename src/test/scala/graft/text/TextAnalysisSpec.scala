package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def pred(texts: String*): Seq[String] =
    texts.toSeq.toDF("text")
      .select(TextAnalysis.langId($"text"))
      .as[String]
      .collect()
      .toSeq

  test("langId: scripts win over markers; markers rank Latin languages") {
    assert(pred("これはテストです") == Seq("ja"))          // kana → ja
    assert(pred("안녕하세요 세계") == Seq("ko"))            // hangul → ko
    assert(pred("你好世界欢迎光临") == Seq("zh"))           // han-dominant → zh
    assert(pred("the cat is on the mat") == Seq("en"))
    assert(pred("der hund ist nicht hier und das ist gut") == Seq("de"))
    assert(pred("el problema es que una cosa para todos") == Seq("es"))
    assert(pred("le chat est dans les arbres pour toujours") == Seq("fr"))
    assert(pred("xyzzy plugh quux") == Seq("und"))
    assert(pred("") == Seq("und"))
  }

  test("langId: priority order breaks marker ties deterministically") {
    // 'est' is fr-only here; 'es' hits es; craft a tie between es and fr
    assert(pred("que est") == Seq("es")) // 1 es hit, 1 fr hit → es first in order? es before fr
  }

  test("quality metrics: hand-checked values") {
    val df = Seq("the cat sat on a mat with the dog and the bird here now").toDF("text")
    val m = TextAnalysis.qualityMetrics($"text")
    val row = df.select(m.map { case (n, c) => c.as(n) }: _*).head()
    assert(row.getAs[Long]("n_words") == 14L)
    assert(row.getAs[Double]("punct_ratio") == 0.0)
    // stopword hits: the×3, on, a, and → ratio 6/14
    assert(math.abs(row.getAs[Double]("stopword_ratio") - 6.0 / 14) < 1e-9)
    assert(row.getAs[Boolean]("keep"))
    val empty = Seq("").toDF("text").select(m.map { case (n, c) => c.as(n) }: _*).head()
    assert(empty.getAs[Long]("n_words") == 0L)
    assert(!empty.getAs[Boolean]("keep"))
  }

  test("fingerprint: reformatting-invariant, content-sensitive") {
    val fps = Seq(
      "Hello,  WORLD!",
      "hello world",
      "hello world2",      // digits are stripped by normalization → same
      "different text")
      .toDF("text")
      .select(TextAnalysis.fingerprint($"text"))
      .as[Long]
      .collect()
    assert(fps(0) == fps(1))
    assert(fps(1) == fps(2))
    assert(fps(0) != fps(3))
    val empty = Seq("", null.asInstanceOf[String], "!!!")
      .toDF("text").select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(empty.toSeq == Seq(0L, 0L, 0L))
  }

  test("fingerprint matches the polynomial definition") {
    // clean("Ab") = "ab": h = (0*31+97)*31+98 = 3105
    val fp = Seq("Ab").toDF("text").select(TextAnalysis.fingerprint($"text")).as[Long].head()
    assert(fp == 3105L)
  }

  test("fingerprint hashes Unicode CODE POINTS, not UTF-8 bytes (off-ASCII contract)") {
    def poly(s: String): Long = {
      var h = 0L
      s.codePoints().forEach(cp => h = (h * 31 + cp) % 1000000007L)
      h
    }
    // é stays through clean_text (Unicode letter); 𝔘 is a surrogate pair
    // that must hash as ONE code point (U+1D518)
    val texts = Seq("héllo wörld", "café", "a𝔘b")
    val expected = texts.map(t => poly(t.toLowerCase(java.util.Locale.ROOT)))
    val got = texts.toDF("text").select(TextAnalysis.fingerprint($"text")).as[Long].collect().toSeq
    assert(got == expected, s"got $got expected $expected")
  }
}
