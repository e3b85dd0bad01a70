package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{TextAnalysis, Tokenize}

/** Structured Streaming surface for the text pipeline (the reference has no
  * streaming — this is the Spark-native extension the north star asks for:
  * `readStream` → transforms → `writeStream` with watermarked state).
  *
  * All transforms compose on any streaming DataFrame (Kafka, file source,
  * rate source); specs drive them with `MemoryStream`. State stores stay
  * bounded by watermarks: windowed aggregations evict closed windows, and
  * streaming dedup evicts hashes older than the watermark horizon.
  */
object TextStream {

  /** Event-time windowed token counts over quality-filtered text: the
    * streaming form of `token_frequencies`. One shuffle keyed on
    * `(window, token)`; late data beyond `watermark` is dropped and closed
    * windows leave the state store. */
  def windowedTokenCounts(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      windowDuration: String = "1 minute",
      watermark: String = "2 minutes",
      minWords: Int = 1): DataFrame = {
    val quality = TextAnalysis.qualityMetrics(col(textCol)).toMap
    stream
      .withWatermark(tsCol, watermark)
      .filter(quality("n_words") >= minWords)
      .select(col(tsCol), explode(Tokenize.tokenize(col(textCol))).as("t"))
      .groupBy(window(col(tsCol), windowDuration), col("t.token").as("token"))
      .agg(count(lit(1)).as("freq"))
      .select(
        col("window.start").as("window_start"),
        col("token"),
        col("freq"))
  }

  /** Event-time tumbling-window stats over a typed event stream: the
    * streaming twin of the batch `q_event_windows` relational query. One
    * shuffle keyed on `(window, type)`; DECIMAL sums keep the result
    * engine-exact (double summation is order-dependent). `countDistinct`
    * is deliberately absent — distinct aggregation is unsupported in
    * streaming; a distinct-user count would chain a second stateful
    * aggregation instead. Late data beyond `watermark` is dropped; in
    * append mode closed windows leave the state store. */
  def windowedEventStats(
      stream: DataFrame,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value"))

  /** Streaming exact dedup: first occurrence of each normalized content
    * hash within the watermark horizon survives. Uses Spark's native
    * `dropDuplicatesWithinWatermark` so the hash state is evicted once the
    * event time passes the horizon — bounded state at any throughput. */
  def streamingExactDedup(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .withColumn("content_hash", sha2(coalesce(col(textCol), lit("")), 256))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming language routing: tag each record with the detected
    * language (pure Column — stateless, no shuffle). */
  def withLangId(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("pred_lang", TextAnalysis.langId(col(textCol)))

  /** Streaming curation gate: the batch pipeline's scan-speed signals
    * (quality keep + repetition bound + language id) applied to a
    * document stream — STATELESS, so records flow through at scan speed
    * with no state store, no watermark, and no shuffle; the natural
    * first stage of an ingest topology, in front of the stateful dedup /
    * windowed stages. Identical Column programs to the batch
    * `q_curation_pipeline` gates, so a streamed corpus gates exactly
    * like a batch one (pinned by the shared oracle). */
  def curationGate(
      stream: DataFrame,
      textCol: String,
      maxDupWordFrac: Double = 0.6): DataFrame = {
    val quality = TextAnalysis.qualityMetrics(col(textCol)).toMap
    val rep = graft.text.Repetition.repetitionMetrics(col(textCol)).toMap
    stream
      .filter(quality("keep") && rep("dup_word_frac") <= lit(maxDupWordFrac))
      .withColumn("pred_lang", TextAnalysis.langId(col(textCol)))
  }

  /** Event-time sessionization via Spark's native `session_window` (3.2+):
    * per-key sessions close after `gap` of event-time silence, so a user's
    * burst of documents rolls up to one row with its doc and word totals.
    * Declarative — no custom state code; the state store evicts sessions
    * once the watermark passes their close. */
  def sessionCounts(
      stream: DataFrame,
      keyCol: String,
      textCol: String,
      tsCol: String,
      gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("session"), col(keyCol).as("key"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(graft.text.TextFunctions.wordCount(col(textCol))).as("n_words"))
      .select(
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("key"),
        col("n_docs"),
        col("n_words"))

  /** Custom-state example: per-key running document and token totals via
    * `mapGroupsWithState` (the arbitrary-state API the brief's streaming
    * tier calls for — state the built-in aggregations can't express, e.g.
    * totals that must survive across windows without event-time bounds).
    * Output mode: Update. State size is O(distinct keys).
    *
    * Scale shape: the per-group state function is serial per key, so the
    * expensive work (tokenization) runs BEFORE the state shuffle as a
    * stateless codegen'd projection — fully parallel across input
    * partitions regardless of key cardinality — and the state update
    * merely adds two longs per row. Tokenizing inside the group function
    * would cap throughput at the number of distinct keys. */
  /** Per-user running event stats on the MODERN arbitrary-state API:
    * Spark 4's `transformWithState` with a named `ValueState` — the
    * successor to `mapGroupsWithState` (multiple independent state
    * variables per key, per-state TTL, timers; requires the RocksDB
    * state store provider). Same scale shape as [[runningTotals]]: the
    * stateless projection runs before the state shuffle, the per-key
    * update adds a long and a double. Output mode Update: each batch
    * emits the keys it touched with their post-batch totals (monotone
    * in n, so max-per-key in the sink is the final state). */
  final class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var stats: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      stats = getHandle.getValueState[(Long, Double)](
        "stats",
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Double)] = {
      var (n, sum) = if (stats.exists()) stats.get() else (0L, 0.0)
      rows.foreach { case (_, v) => n += 1; sum += v }
      stats.update((n, sum))
      Iterator.single((key, n, sum))
    }
  }

  /** Streaming Misra–Gries: the heavy-hitters sketch maintained as
    * per-key `transformWithState` state — "top tokens over the
    * firehose" with O(k) state per key instead of per-token-type
    * streaming aggregation state. Each batch folds its tokens into the
    * stored summary ([[graft.util.MisraGries.update]], the same point
    * update the batch Aggregator uses) and emits the key's CURRENT
    * summary rows (Update mode). In the provably-exact regime
    * (k ≥ distinct tokens per key) every emitted count is monotone
    * non-decreasing, so a max-per-(key, token) read of the sink equals
    * the final state — the q_stream_user_stats sink pattern.
    * The summary persists in the state store as a compact
    * `token:count` string (tokens are whitespace/punct-free by
    * construction, so the encoding is unambiguous). */
  final class HeavyHittersProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, String), (String, String, Long)] {
    @transient private var mg: org.apache.spark.sql.streaming.ValueState[String] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      mg = getHandle.getValueState[String](
        "mg",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    private def decode(s: String): Map[String, Long] =
      if (s == null || s.isEmpty) Map.empty
      else s.split(',').iterator.map { e =>
        val i = e.lastIndexOf(':')
        e.substring(0, i) -> e.substring(i + 1).toLong
      }.toMap
    private def encode(m: Map[String, Long]): String =
      m.iterator.map { case (t, c) => s"$t:$c" }.mkString(",")
    override def handleInputRows(
        key: String,
        rows: Iterator[(String, String)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, String, Long)] = {
      var m = if (mg.exists()) decode(mg.get()) else Map.empty[String, Long]
      rows.foreach { case (_, tok) => m = graft.util.MisraGries.update(m, tok, k) }
      mg.update(encode(m))
      m.iterator.map { case (t, c) => (key, t, c) }
    }
  }

  def streamingHeavyHitters(
      docs: DataFrame,
      keyCol: String,
      textCol: String,
      k: Int): org.apache.spark.sql.Dataset[(String, String, Long)] = {
    import docs.sparkSession.implicits._
    docs
      .select(col(keyCol).cast("string").as("key"),
        explode(Tokenize.tokenStrings(coalesce(col(textCol), lit("")))).as("tok"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(
        new HeavyHittersProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  def userEventStats(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .select(
        col("user_id").cast("long").as("user_id"),
        coalesce(col("value"), lit(0.0)).cast("double").as("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  def runningTotals(
      stream: DataFrame,
      keyCol: String,
      textCol: String): org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    import stream.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout

    stream
      .select(
        col(keyCol).cast("string").as("key"),
        Tokenize.tokenCount(coalesce(col(textCol), lit("")))
          .cast("long").as("n_toks"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (String, Long, Long)](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val (docs0, toks0) = state.getOption.getOrElse((0L, 0L))
          var docs = docs0
          var toks = toks0
          rows.foreach { case (_, n) =>
            docs += 1
            toks += n
          }
          state.update((docs, toks))
          (key, docs, toks)
      }
  }
}
