package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bitwise parity of the fused [[GopherMetricsExpr]] against the
  * higher-order-function reference formulation ([[GopherRules.hofMetrics]])
  * — the same job the similarity-expression parity specs do for
  * CosineSimExpr/IntDotExpr. Edge cases target every divergence channel:
  * Java-\s whitespace classes, leading/trailing separators, dot-run
  * non-overlap counting, space-only trim, bullet/ellipsis line ends,
  * case-folded stopword dedup, null/empty text. */
class GopherMetricsParitySpec extends SparkSpec {

  import spark.implicits._

  private val cases = Seq(
    null,
    "",
    "   ",
    "\n\n\n",
    "the quick brown fox jumps over the lazy dog with all of that and have be to",
    "word",
    "a\tbc\fd\re f",
    "  leading and trailing  ",
    "#### #tags# everywhere #",
    "dots... and..... more...... and.......",
    "…single … ellipsis chars…",
    "- bullet one\n* bullet two\n• bullet three\n‣ four\n▪ five\nplain line",
    "ends with dots...\nends with char…\n   trimmed dots...   \nno ellipsis",
    "THE The tHe thE BE TO OF AND THAT HAVE WITH extra words here",
    "line with only spaces\n     \nnext line",
    "Ĳ unicode ŉ words Ǆ mixed ascii123 ½ numeric",
    "...\n…\n.\n..",
    "short the of", // < minWords but 3 distinct stopwords
    ("the and of with " * 20) + "alpha words only here") // crosses minWords=50? 84 words

  test("fused gopher metrics == HOF formulation field by field") {
    val df = cases.toDF("text")
    val fused = GopherRules.metrics(col("text")).toMap
    val hof = GopherRules.hofMetrics(col("text")).toMap
    val names = Seq("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
      "ellipsis_frac", "alpha_frac", "stop_hits", "keep")
    val out = df.select(
      (names.map(n => fused(n).as(s"f_$n")) ++ names.map(n => hof(n).as(s"h_$n"))): _*)
      .collect()
    out.zip(cases).foreach { case (row, text) =>
      names.zipWithIndex.foreach { case (n, i) =>
        val f = row.get(i)
        val h = row.get(names.length + i)
        assert(f == h, s"field $n diverges on ${Option(text).map(_.take(40))}: fused=$f hof=$h")
      }
    }
  }

  test("fused metrics run on the corpus equal the HOF program on every document") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fused = GopherRules.metrics(col("text")).toMap
    val hof = GopherRules.hofMetrics(col("text")).toMap
    val names = Seq("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
      "ellipsis_frac", "alpha_frac", "stop_hits", "keep")
    val diff = docs.select(
      (col("doc_id") +: names.map(n => (fused(n) =!= hof(n)).as(n))): _*)
      .filter(names.map(col).reduce(_ || _))
    assert(diff.isEmpty, diff.limit(5).collect().mkString("\n"))
  }
}
