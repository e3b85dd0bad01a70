package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-row corpus profile — the `describe()` a curation pipeline runs
  * before and after every major stage (scrub → dedup → quality gate) to
  * watch volumes move: document count, token count, vocabulary size,
  * mean document length, language count.
  *
  * Scale design (100 TB): two scans, each the cheapest possible shape.
  * Scan 1 is a pure elementwise 1-row aggregate (doc count, token totals
  * via `size(tokenize(...))` — no explode, the array never materializes
  * past the count — plus a distinct-lang count over a low-cardinality
  * column). Scan 2 is the one genuinely token-level statistic,
  * vocabulary size: explode → distinct-count, one shuffle keyed on
  * token. The two 1-row results meet in a trivial cross join. Driver
  * state: five scalars.
  */
object CorpusProfile {

  def profile(
      df: DataFrame,
      textCol: String,
      langCol: Option[String] = None,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    val toks: Column = Tokenize.tokenStrings(col(textCol), model)
    val langAgg: Column = langCol match {
      case Some(l) => countDistinct(col(l)).as("n_langs")
      case None => lit(0L).as("n_langs")
    }
    val scalars = df.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(toks)), lit(0)).cast("long").as("n_tokens"),
      langAgg)
    val vocab = df
      .select(explode(toks).as("token"))
      .agg(countDistinct("token").as("vocab_size"))
    scalars
      .crossJoin(vocab)
      .select(
        col("n_docs"),
        col("n_tokens"),
        when(col("n_docs") > 0,
          col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .otherwise(lit(0.0)).as("avg_doc_len"),
        col("vocab_size"),
        col("n_langs"))
  }

  /** One-row vocabulary health report — the Zipf telemetry that tells a
    * pipeline whether its tokenizer/corpus pairing is sane: vocabulary
    * size, hapax-legomenon fraction (a spike means boilerplate/noise or a
    * broken tokenizer), and head coverage (the mass of the `topK` most
    * frequent types — how much of the corpus a stopword list would
    * touch).
    *
    * Scale design: one tokenize pass into the token-keyed counts
    * aggregate (vocabulary-scale, locally checkpointed); the summary is a
    * 1-row aggregate over it, and the head mass is a bounded
    * `TakeOrdered` (deterministic `count desc, token` ordering) into a
    * second 1-row aggregate. Driver state: four scalars. */
  def vocabReport(
      df: DataFrame,
      textCol: String,
      topK: Int = 100,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df
      .select(explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .groupBy(col("t.token").as("token"))
      .agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)
    val head = counts
      .orderBy(col("n_w").desc, col("token"))
      .limit(topK)
      .agg(coalesce(sum("n_w"), lit(0L)).as("head_mass"))
    counts
      .agg(
        count(lit(1)).as("vocab_size"),
        coalesce(sum("n_w"), lit(0L)).as("n_tokens"),
        coalesce(sum(when(col("n_w") === 1, 1L).otherwise(0L)), lit(0L)).as("hapax"))
      .crossJoin(head)
      .select(
        col("vocab_size"),
        col("n_tokens"),
        when(col("vocab_size") > 0,
          round(col("hapax").cast("double") / col("vocab_size").cast("double"), 6))
          .otherwise(lit(0.0)).as("hapax_frac"),
        when(col("n_tokens") > 0,
          round(col("head_mass").cast("double") / col("n_tokens").cast("double"), 6))
          .otherwise(lit(0.0)).as("head_coverage"))
  }
}
