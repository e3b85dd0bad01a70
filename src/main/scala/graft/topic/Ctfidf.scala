package graft.topic

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c-TF-IDF topic labeling, re-expressed as distributed DataFrame algebra
  * (reference `/root/reference/src/topic_modeling/ctfidf.rs:55-136` — the
  * one topic stage that is *more* idiomatic in Spark than in the original).
  *
  * Formula (BERTopic's ClassTfidfTransformer):
  * {{{
  *   tf(t, c) = count(t in c) / total_words(c)
  *   idf(t)   = ln(1 + A / f(t))   // A = avg words/topic, f(t) = corpus freq
  *   score    = tf · idf
  * }}}
  * Ties break alphabetically so identical counts always rank identically.
  *
  * Scale: term counting is one explode + hash aggregate; the per-topic word
  * totals and the corpus term frequency are partitioned windows over the
  * persisted counts table; `A` is a 2-value driver scalar inlined as a
  * literal. The final top-k is a window partitioned by topic — no global
  * sort, no unpartitioned window, no driver materialization of anything
  * corpus-sized.
  */
object Ctfidf {

  /** Tokenize and count terms per topic: `(topic, token, cnt)`. Stopwords
    * dropped; tokenize flags mirror the reference's vectorizer defaults. */
  def countTopicTerms(
      df: DataFrame,
      textCol: String,
      topic: Column,
      model: String = graft.text.TokenizerModels.PlainWordsEn,
      lowercase: Boolean = true,
      stopwords: Set[String] = Set.empty): DataFrame = {
    val toks = df
      .select(topic.as("topic"), explode(
        graft.text.Tokenize.tokenize(col(textCol), model, lowercase, removePunct = true)).as("t"))
      .select(col("topic"), col("t.token").as("token"))
    val filtered =
      if (stopwords.isEmpty) toks
      else toks.filter(!col("token").isInCollection(stopwords))
    filtered.groupBy("topic", "token").agg(count(lit(1)).as("cnt"))
  }

  /** Top-`k` c-TF-IDF terms per topic from a `(topic, token, cnt)` counts
    * table. Output: `topic, rank, token, score` (score descending,
    * alphabetical tie-break).
    *
    * Plan shape: the counts table is locally checkpointed and traversed
    * once by the returned plan — the per-topic word totals and corpus-wide
    * term frequency are '''partitioned windows''' over it (a join
    * formulation would make Catalyst recompute the tokenize→explode→agg
    * subtree once per join branch: 3 corpus scans in one plan), while the
    * global `A` average is a 1-row aggregate on the checkpointed copy
    * inlined as a literal — never an unpartitioned window, which would
    * funnel the (topic × token)-cardinality table through one partition.
    * The blocks live outside the CacheManager (no session-lifetime leak —
    * see `Collocations`' scaladoc) and are reclaimed by the ContextCleaner
    * once the result is unreferenced. */
  def topTerms(termCounts: DataFrame, topK: Int = 10): DataFrame = {
    val persisted = termCounts.localCheckpoint(true)
    val tot = persisted.agg(
      coalesce(sum("cnt"), lit(0L)).as("words"),
      countDistinct("topic").as("topics")).head()
    val avgWords =
      if (tot.getLong(1) == 0L) 0.0 else tot.getLong(0).toDouble / tot.getLong(1).toDouble
    val scored = persisted
      .withColumn("topic_words", sum("cnt").over(Window.partitionBy(col("topic"))))
      .withColumn("corpus_freq", sum("cnt").over(Window.partitionBy(col("token"))))
      .withColumn(
        "score",
        (col("cnt").cast("double") / col("topic_words")) *
          log(lit(1.0) + lit(avgWords) / col("corpus_freq")))
    val w = Window.partitionBy(col("topic")).orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("topic"), col("rank"), col("token"), col("score"))
  }
}
