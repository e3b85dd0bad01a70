package graft.topic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunk-label → per-document topic distributions, as distributed algebra
  * (reference `/root/reference/src/topic_modeling/rollup.rs:52-132`).
  *
  * Semantics pinned by the reference's tests:
  *   - proportions per document sum to 1 over *all* its chunks — outlier
  *     (`-1`) chunks stay in the distribution;
  *   - `dominant_topic` is the most-common non-outlier label, ties → the
  *     smaller id; a document with no clustered chunk falls back to `-1`;
  *   - distribution rows are emitted in ascending topic-id order.
  *
  * Scale: two hash aggregations keyed on (doc, label) and doc plus two
  * windows partitioned by doc — everything stays partitioned by document id,
  * so after the first shuffle the remaining stages are narrow.
  */
object Rollup {

  val OutlierLabel: Int = -1

  /** Flattened per-(document, topic) distribution from a chunk frame with
    * columns `(docCol, labelCol)`. Output:
    * `doc_id, topic_id, proportion, dominant_topic`.
    *
    * Single pass over the aggregated counts: the per-doc total and the
    * dominant topic are both unordered-window aggregates over the same
    * `doc_id` partition — `max` of a `(cnt, -topic_id)` struct picks the
    * most-common non-outlier label with ties to the smaller id, so no
    * second derivation of the counts subtree (a filter + row_number +
    * join formulation would re-run the upstream chunk plan) and only one
    * shuffle after the aggregation. */
  def rollup(chunks: DataFrame, docCol: String = "doc_id", labelCol: String = "label"): DataFrame = {
    val counts = chunks
      .groupBy(col(docCol).as("doc_id"), col(labelCol).cast("int").as("topic_id"))
      .agg(count(lit(1)).as("cnt"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val domStruct = max(
      when(col("topic_id") =!= OutlierLabel,
        struct(col("cnt"), (-col("topic_id")).as("neg_id")))).over(byDoc)
    counts
      .withColumn("total", sum("cnt").over(byDoc))
      .withColumn("dom", domStruct)
      .select(
        col("doc_id"),
        col("topic_id"),
        (col("cnt").cast("double") / col("total")).as("proportion"),
        coalesce(-col("dom.neg_id"), lit(OutlierLabel)).as("dominant_topic"))
  }

  /** Per-corpus, per-topic "soft sizes": sum of document proportions, with
    * outlier mass dropped (reference `rollup.rs:141-166`). `docCorpus` maps
    * `doc_id → corpus`. */
  def corpusTopicSizes(docTopics: DataFrame, docCorpus: DataFrame): DataFrame =
    docTopics
      .filter(col("topic_id") =!= OutlierLabel)
      .join(docCorpus, "doc_id")
      .groupBy(col("corpus"), col("topic_id"))
      .agg(sum("proportion").as("size"))
}
