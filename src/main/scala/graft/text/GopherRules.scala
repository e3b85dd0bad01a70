package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher/MassiveWeb document-quality rule set (Rae et al. 2021,
  * "Scaling Language Models: Methods, Analysis & Insights from Training
  * Gopher", Appendix A1.1) as a pure Column program — the standard
  * pretraining heuristic filter bundle, complementing the lighter
  * [[TextAnalysis.qualityMetrics]] composite:
  *
  *   - word count in [minWords, maxWords] (paper: 50–100,000)
  *   - mean word length in [3, 10] characters
  *   - symbol-to-word ratio ≤ 0.1 (symbols: `#` and `...`)
  *   - ≤ 90% of lines start with a bullet
  *   - ≤ 30% of lines end with an ellipsis
  *   - ≥ 80% of words contain at least one alphabetic character
  *   - at least 2 DISTINCT members of the paper's 8-word stop list
  *     (the, be, to, of, and, that, have, with)
  *
  * Scale design: entirely elementwise (split/filter/aggregate over the
  * whitespace word array and the line array — no tokenizer model, no
  * shuffle, no UDF); a 100 TB gate runs at scan speed. Every ratio is
  * exactly re-derivable in SQL, so the whole rule set sits under the
  * oracle. Words are whitespace-split (the paper's formulation);
  * document boundaries come from `\n` lines. */
object GopherRules {

  /** The paper's stop list — intentionally distinct from
    * [[TextAnalysis.EnStopwords]] (marker-hit heuristic); this one is
    * Gopher's exact 8-word membership test. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def notNull(c: Column): Column = coalesce(c, lit(""))

  private val FieldNames = Seq(
    "n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
    "ellipsis_frac", "alpha_frac", "stop_hits", "keep")

  /** `(name, column)` metric pairs plus the conjunction `keep` — callers
    * select what they need; ratios are raw (round at the query edge).
    *
    * One fused codegen'd scan per document ([[GopherMetricsExpr]]); the
    * HOF Column program it replaced ([[hofMetrics]]) chained ~10
    * CodegenFallback array functions per row. Values identical
    * (spec-pinned field by field, oracle-checked end to end). */
  def metrics(
      c: Column,
      minWords: Int = 50,
      maxWords: Int = 100000): Seq[(String, Column)] = {
    val m = org.apache.spark.sql.graft.Bridge.column(
      GopherMetricsExpr(
        org.apache.spark.sql.graft.Bridge.expression(c), minWords, maxWords))
    FieldNames.map(f => f -> m.getField(f))
  }

  /** The higher-order-function formulation [[metrics]] fuses — kept as
    * the executable semantics REFERENCE: the parity spec asserts the
    * native expression equals this program field by field on the edge
    * cases (empty/null text, whitespace runs, dot runs, bullet/ellipsis
    * lines, case-folded stopwords). Not used on any query path. */
  private[graft] def hofMetrics(
      c: Column,
      minWords: Int = 50,
      maxWords: Int = 100000): Seq[(String, Column)] = {
    val words = filter(split(notNull(c), "\\s+"), w => w =!= "")
    val lines = filter(split(notNull(c), "\n"), l => trim(l) =!= "")
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("long")
    val safeWords = greatest(nWords.cast("double"), lit(1.0))
    val safeLines = greatest(nLines.cast("double"), lit(1.0))

    val meanWordLen =
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / safeWords
    // symbols: '#' occurrences + ellipsis occurrences — both the ASCII
    // "..." (one symbol per triple) and the single-char U+2026 "…",
    // which Gopher A1.1 counts the same way
    val hashes = length(notNull(c)) - length(regexp_replace(notNull(c), "#", ""))
    val ellipses =
      (length(notNull(c)) - length(regexp_replace(notNull(c), "\\.\\.\\.", ""))) / lit(3) +
        (length(notNull(c)) - length(regexp_replace(notNull(c), "…", "")))
    val symbolRatio = (hashes + ellipses).cast("double") / safeWords
    val bulletFrac =
      size(filter(lines, l => trim(l).rlike("^([-*•‣▪])"))).cast("double") / safeLines
    val ellipsisFrac =
      size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / safeLines
    val alphaFrac =
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") / safeWords
    val stopHits = size(
      array_intersect(
        transform(words, w => lower(w)),
        array(GopherStopwords.map(lit): _*))).cast("long")

    val keep = nWords >= minWords && nWords <= maxWords &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      symbolRatio <= 0.1 &&
      bulletFrac <= 0.9 &&
      ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 &&
      stopHits >= 2

    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> meanWordLen,
      "symbol_ratio" -> symbolRatio,
      "bullet_frac" -> bulletFrac,
      "ellipsis_frac" -> ellipsisFrac,
      "alpha_frac" -> alphaFrac,
      "stop_hits" -> stopHits,
      "keep" -> keep)
  }
}
