package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus token frequencies + corpus-comparison keyness statistics
  * (SURVEY.md §2.4; reference `/root/reference/src/token_frequencies.rs:9-40`
  * and `/root/reference/polars_text/token_frequencies.py:24-223`).
  *
  * The reference materializes a Python dict; here both operators are lazy
  * DataFrame programs: tokenize → explode → hash-aggregate (map-side partial
  * aggregation, fully distributed — no driver materialization), and the
  * stats table is a full-outer join plus pure Column algebra. At 100 TB the
  * only shuffles are the token-count aggregation and the (token-keyed) outer
  * join of two already-aggregated, small-cardinality frequency tables.
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

  /** Keyness statistics between two frequency tables (each `token, freq`).
    * Output: the reference's 17 columns, same names, same formulas
    * (`polars_text/token_frequencies.py:62-221`):
    * log-likelihood G², Bayes factor BIC, effect size ELL, significance
    * stars, percents, relative risk, log ratio, odds ratio.
    *
    * Totals are joined in via a broadcast cross-join of a 1-row aggregate —
    * no window over the full table, no driver collect. */
  def tokenFrequencyStats(freq0: DataFrame, freq1: DataFrame): DataFrame = {
    val a = freq0.select(
      col("token"),
      col("freq").cast("long").as("freq_corpus_0"))
    val b = freq1.select(
      col("token"),
      col("freq").cast("long").as("freq_corpus_1"))

    // `joined` feeds both the totals aggregate and the main row stream; an
    // unpersisted plan would recompute the whole tokenize→explode→aggregate
    // →outer-join subtree twice (doubling the corpus scan at scale). The
    // table is post-aggregation (vocabulary-sized), so caching is cheap.
    val joined = a
      .join(b, Seq("token"), "full_outer")
      .select(
        col("token"),
        coalesce(col("freq_corpus_0"), lit(0L)).as("freq_corpus_0"),
        coalesce(col("freq_corpus_1"), lit(0L)).as("freq_corpus_1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val totals = joined.agg(
      sum("freq_corpus_0").as("corpus_0_total"),
      sum("freq_corpus_1").as("corpus_1_total"))

    val f0 = col("freq_corpus_0")
    val f1 = col("freq_corpus_1")
    val t0 = col("corpus_0_total")
    val t1 = col("corpus_1_total")
    val grand = col("grand_total")
    val eps = lit(1e-10)

    val withExpected = joined
      .crossJoin(broadcast(totals))
      .withColumn("grand_total", t0 + t1)
      .withColumn("total_freq", f0 + f1)
      .withColumn("expected_0", col("total_freq") * t0 / grand)
      .withColumn("expected_1", col("total_freq") * t1 / grand)

    def llTerm(f: Column, expected: Column): Column =
      when(f > 0, f * log(f / greatest(expected, eps))).otherwise(lit(0.0))

    val llv = col("log_likelihood_llv")
    val minExp = col("min_expected")

    withExpected
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
        t0,
        t1,
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
