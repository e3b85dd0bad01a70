package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-document repetition metrics for training-data quality filtering —
  * the word-level re-derivation of the repetition family popularized by
  * the Gopher data pipeline (Rae et al. 2021, arXiv:2112.11446, Table A1:
  * duplicate line/paragraph fractions, top n-gram fractions, duplicate
  * n-gram fractions) and C4 (Raffel et al. 2020, arXiv:1910.10683). The
  * reference engine has no repetition operator; this extends its quality
  * tier (`polars_text` quality metrics) with the signals a 100 TB curation
  * pipeline actually filters on.
  *
  * Scale design: every metric is a pure Column program over ONE tokenize
  * of the document — higher-order array functions (`aggregate`,
  * `zip_with`, `array_distinct`) evaluated elementwise, so the operator
  * runs at scan speed with NO shuffle and composes under predicate
  * pushdown like any other scan-side filter. Per-row cost is O(L log L)
  * in document token length (the sort behind the top-word count), never
  * corpus-sized state.
  */
object Repetition {

  /** Longest run of consecutive equal elements, as a single left fold
    * (`aggregate`) carrying `(prev, run, best)` — no explode, no shuffle.
    * On a sorted array this is the max element multiplicity. */
  private[text] def maxEqualRun(xs: Column): Column =
    aggregate(
      xs,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(
          x.as("prev"),
          run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** The metric columns, named:
    *
    *   - `n_words` — token count,
    *   - `dup_word_frac` — fraction of tokens that repeat an
    *     already-seen token (`1 − distinct/total`),
    *   - `top_word_frac` — occurrences of the most frequent token over
    *     total tokens (Gopher's "top n-gram fraction" at n=1),
    *   - `dup_bigram_frac` — fraction of adjacent bigrams that repeat an
    *     already-seen bigram (Gopher's "duplicate n-gram fraction" at
    *     n=2, token-level),
    *   - `max_word_run` — longest run of the same token repeated
    *     consecutively (catches degenerate "word word word …" spans).
    *
    * Empty/null text yields 0 for every metric. */
  def repetitionMetrics(
      textCol: Column,
      model: String = TokenizerModels.PlainWordsEn): Seq[(String, Column)] = {
    val toks = Tokenize.tokenStrings(textCol, model)
    val n = size(toks)
    val nDistinct = size(array_distinct(toks))
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val nb = size(bigrams)
    Seq(
      "n_words" -> n.cast("long"),
      "dup_word_frac" ->
        when(n > 0, lit(1.0) - nDistinct.cast("double") / n.cast("double"))
          .otherwise(lit(0.0)),
      "top_word_frac" ->
        when(n > 0, maxEqualRun(array_sort(toks)).cast("double") / n.cast("double"))
          .otherwise(lit(0.0)),
      "dup_bigram_frac" ->
        when(nb > 0,
          lit(1.0) - size(array_distinct(bigrams)).cast("double") / nb.cast("double"))
          .otherwise(lit(0.0)),
      "max_word_run" ->
        when(n > 0, maxEqualRun(toks)).otherwise(lit(0)).cast("long"))
  }

  /** Gopher-style repetition gate: true for documents whose repetition
    * stays under the given ceilings (defaults shaped after Gopher Table A1,
    * adapted to word level). Composes scan-side with the quality gate in
    * the cleaning pipeline — one more pushed-down predicate, no new scan. */
  def repetitionGate(
      textCol: Column,
      maxDupWordFrac: Double = 0.80,
      maxTopWordFrac: Double = 0.30,
      maxDupBigramFrac: Double = 0.60,
      model: String = TokenizerModels.PlainWordsEn): Column = {
    val m = repetitionMetrics(textCol, model).toMap
    m("dup_word_frac") <= maxDupWordFrac &&
      m("top_word_frac") <= maxTopWordFrac &&
      m("dup_bigram_frac") <= maxDupBigramFrac
  }
}
