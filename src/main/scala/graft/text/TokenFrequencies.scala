package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Corpus token frequencies + corpus-comparison keyness statistics
  * (SURVEY.md §2.4; reference `/root/reference/src/token_frequencies.rs:9-40`
  * and `/root/reference/polars_text/token_frequencies.py:24-223`).
  *
  * The reference materializes a Python dict; here both operators are lazy
  * DataFrame programs: tokenize → explode → hash-aggregate (map-side partial
  * aggregation, fully distributed — no driver materialization of the corpus).
  *
  * Scale design (100 TB): the two-corpus comparison is ONE scan and ONE
  * shuffle — a single conditional aggregation
  * (`groupBy(token).agg(sum(when(corpus0,1)), sum(when(!corpus0,1)))`)
  * replaces two filtered passes plus a full-outer join. The corpus totals
  * are a 1-row aggregate over a locally-checkpointed copy of the counts
  * table, collected to the driver and injected as literals (16 bytes at any
  * scale) — never an unpartitioned window (which would single-partition the
  * counts table) and never a second corpus scan (the checkpoint makes the
  * totals traversal a block read). See `Collocations`' scaladoc for why
  * the checkpoint is `localCheckpoint` and not `Dataset.persist` (a
  * persist-and-return would leak a CacheManager entry per invocation).
  */
object TokenFrequencies {

  /** Global token → count over a text column. Blank/null texts contribute
    * nothing (reference maps null→"" then skips blanks). Tokenization is
    * `lowercase=true, remove_punct=true` — hard-coded in the reference
    * (`src/token_frequencies.rs:23`). */
  def tokenFrequencies(
      df: DataFrame,
      textCol: String,
      model: String = TokenizerModels.PlainWordsEn): DataFrame =
    df.select(explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .groupBy(col("t.token").as("token"))
      .agg(count(lit(1)).as("freq"))

  /** API-parity convenience mirroring the reference's dict-returning
    * `token_frequencies` (`polars_text/token_frequencies.py:10-21`, which
    * materializes a Python `dict[str, int]`).
    *
    * ⚠ Driver-bounded: collects the whole vocabulary to the driver. Fine
    * for natural-language vocabularies (≤ millions of tokens); for
    * open-ended token spaces at 100 TB prefer [[tokenFrequencies]], which
    * stays a distributed DataFrame. */
  def tokenFrequenciesMap(
      df: DataFrame,
      textCol: String,
      model: String = TokenizerModels.PlainWordsEn): Map[String, Long] = {
    import df.sparkSession.implicits._
    tokenFrequencies(df, textCol, model).as[(String, Long)].collect().toMap
  }

  /** Both corpora's token frequencies in one scan: rows where `isCorpus0`
    * count toward `freq_corpus_0`, the rest toward `freq_corpus_1`. One
    * tokenize pass, one shuffle — the scale-correct shape for keyness. */
  def conditionalTokenFrequencies(
      df: DataFrame,
      textCol: String,
      isCorpus0: Column,
      model: String = TokenizerModels.PlainWordsEn): DataFrame =
    df.select(isCorpus0.as("c0"), explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .groupBy(col("t.token").as("token"))
      .agg(
        sum(when(col("c0"), 1L).otherwise(0L)).as("freq_corpus_0"),
        sum(when(col("c0"), 0L).otherwise(1L)).as("freq_corpus_1"))

  /** Keyness statistics between two frequency tables (each `token, freq`).
    * API parity with the reference's two-dict signature; aligns via a
    * full-outer join on token (both inputs are post-aggregation,
    * vocabulary-sized). Prefer [[conditionalTokenFrequencies]] +
    * [[tokenFrequencyStatsFromCounts]] when both corpora come from one
    * table — that path scans the corpus once. */
  def tokenFrequencyStats(freq0: DataFrame, freq1: DataFrame): DataFrame = {
    val a = freq0.select(col("token"), col("freq").cast("long").as("freq_corpus_0"))
    val b = freq1.select(col("token"), col("freq").cast("long").as("freq_corpus_1"))
    val joined = a
      .join(b, Seq("token"), "full_outer")
      .select(
        col("token"),
        coalesce(col("freq_corpus_0"), lit(0L)).as("freq_corpus_0"),
        coalesce(col("freq_corpus_1"), lit(0L)).as("freq_corpus_1"))
    tokenFrequencyStatsFromCounts(joined)
  }

  /** Keyness statistics from an aligned counts table
    * (`token, freq_corpus_0, freq_corpus_1`). Output: the reference's 17
    * columns, same names, same formulas
    * (`polars_text/token_frequencies.py:62-221`): log-likelihood G², Bayes
    * factor BIC, effect size ELL, significance stars, percents, relative
    * risk, log ratio, odds ratio.
    *
    * ONE traversal of the `counts` subtree: the frame is locally
    * checkpointed, the corpus totals are a 1-row aggregate on the
    * checkpointed copy (map-side partial sums, 16 bytes to the driver)
    * inlined as literals, and the returned plan reads the same blocks. No
    * window runs unpartitioned — natural-language vocabularies are
    * plausibly bounded, but this function is also reached with open token
    * spaces (ids, n-grams) where a global window would single-partition
    * the whole table. The blocks are vocabulary-sized, live outside the
    * CacheManager (no session-lifetime leak, no cached-plan substitution
    * into other queries), and are reclaimed by the ContextCleaner once the
    * returned frame is unreferenced. */
  def tokenFrequencyStatsFromCounts(counts: DataFrame): DataFrame = {
    val persisted = counts.localCheckpoint(true)
    val totals = persisted.agg(
      coalesce(sum("freq_corpus_0"), lit(0L)).as("t0"),
      coalesce(sum("freq_corpus_1"), lit(0L)).as("t1")).head()

    val f0 = col("freq_corpus_0")
    val f1 = col("freq_corpus_1")
    val t0 = col("corpus_0_total")
    val t1 = col("corpus_1_total")
    val grand = col("grand_total")
    val eps = lit(1e-10)

    def llTerm(f: Column, expected: Column): Column =
      when(f > 0, f * log(f / greatest(expected, eps))).otherwise(lit(0.0))

    val llv = col("log_likelihood_llv")
    val minExp = col("min_expected")

    persisted
      .withColumn("corpus_0_total", lit(totals.getLong(0)))
      .withColumn("corpus_1_total", lit(totals.getLong(1)))
      .withColumn("grand_total", t0 + t1)
      .withColumn("total_freq", f0 + f1)
      .withColumn("expected_0", col("total_freq") * t0 / grand)
      .withColumn("expected_1", col("total_freq") * t1 / grand)
      .withColumn("ll_0", llTerm(f0, col("expected_0")))
      .withColumn("ll_1", llTerm(f1, col("expected_1")))
      .withColumn("log_likelihood_llv", lit(2) * (col("ll_0") + col("ll_1")))
      .withColumn("bayes_factor_bic", llv - log(grand))
      .withColumn("min_expected", least(col("expected_0"), col("expected_1")))
      .withColumn(
        "effect_size_ell",
        when(minExp > 0, llv / (grand * log(greatest(minExp, eps))))
          .otherwise(lit(0.0)))
      .withColumn(
        "significance",
        when(llv >= 15.13, "****")
          .when(llv >= 10.83, "***")
          .when(llv >= 6.63, "**")
          .when(llv >= 3.84, "*")
          .otherwise(""))
      .withColumn("percent_corpus_0", f0 / t0 * 100)
      .withColumn("percent_corpus_1", f1 / t1 * 100)
      .withColumn("percent_diff", f0 / t0 - f1 / t1)
      .withColumn(
        "relative_risk",
        when(f1 > 0, (f0 / t0) / (f1 / t1)).otherwise(lit(null).cast("double")))
      .withColumn(
        "log_ratio",
        when(f0 > 0 && f1 > 0, log((f0 / t0) / (f1 / t1)))
          .otherwise(lit(null).cast("double")))
      .withColumn(
        "odds_ratio",
        when(
          f0 > 0 && f1 > 0 && t1 > f1 && t0 > f0,
          (f0 * (t1 - f1)) / (f1 * (t0 - f0)))
          .otherwise(lit(null).cast("double")))
      .select(
        col("token"),
        f0,
        f1,
        col("expected_0"),
        col("expected_1"),
        col("corpus_0_total"),
        col("corpus_1_total"),
        llv,
        col("bayes_factor_bic"),
        col("effect_size_ell"),
        col("significance"),
        col("percent_corpus_0"),
        col("percent_corpus_1"),
        col("percent_diff"),
        col("relative_risk"),
        col("log_ratio"),
        col("odds_ratio"))
  }
}
