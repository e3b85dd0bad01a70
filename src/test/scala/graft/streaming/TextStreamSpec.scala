package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class TextStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("windowed token counts aggregate per event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = TextStream.windowedTokenCounts(
      input.toDF().toDF("ts", "text"), "text", "ts")

    val q = counts.writeStream
      .format("memory")
      .queryName("tok_counts")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData((ts(0), "spark joins tables"), (ts(0), "spark scans"), (ts(1), "spark sorts"))
      q.processAllAvailable()
      // advance the watermark far enough to close both windows
      input.addData((ts(10), "flush"))
      q.processAllAvailable()

      val rows = spark.table("tok_counts")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows.contains((ts(0), "spark", 2L)))
      assert(rows.contains((ts(0), "joins", 1L)))
      assert(rows.contains((ts(1), "spark", 1L)))
    } finally q.stop()
  }

  test("session windows merge bursts and split on gaps; late data is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val sessions = TextStream.sessionCounts(
      input.toDF().toDF("ts", "user", "text"), "user", "text", "ts",
      gap = "2 minutes", watermark = "3 minutes")

    val q = sessions.writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // user a: minutes 0,1 (one session); minute 10 (a second session)
      input.addData(
        (ts(0), "a", "one two"),
        (ts(1), "a", "three"),
        (ts(10), "a", "four five six"))
      q.processAllAvailable()
      // late event far behind the watermark (now ~minute 7): dropped
      input.addData((ts(0), "a", "late late late"))
      // advance watermark past minute 12 to close the second session
      input.addData((ts(30), "b", "flush"))
      q.processAllAvailable()

      val rows = spark.table("sessions_out")
        .select("key", "n_docs", "n_words")
        .as[(String, Long, Long)].collect().toList.sorted
      // first a-session: 2 docs, 3 words (late doc dropped — else 3 docs);
      // second a-session: 1 doc, 3 words
      assert(rows.filter(_._1 == "a") == List(("a", 1L, 3L), ("a", 2L, 3L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming exact dedup keeps first occurrence within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val dedup = TextStream.streamingExactDedup(
      input.toDF().toDF("ts", "id", "text"), "text", "ts")

    val q = dedup.writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(
        (ts(0), 1L, "same document text"),
        (ts(0), 2L, "same document text"),
        (ts(1), 3L, "other text"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("runningTotals accumulates custom state across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val totals = TextStream.runningTotals(input.toDF().toDF("user", "text"), "user", "text")
    val q = totals.toDF("key", "docs", "tokens").writeStream
      .format("memory").queryName("totals").outputMode(OutputMode.Update).start()
    try {
      input.addData(("u1", "one two three"), ("u2", "four"))
      q.processAllAvailable()
      input.addData(("u1", "five six"))
      q.processAllAvailable()
      // Update mode: latest row per key wins
      val last = spark.table("totals").groupBy("key")
        .agg(org.apache.spark.sql.functions.max("docs").as("docs"),
          org.apache.spark.sql.functions.max("tokens").as("tokens"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(last("u1") == ((2L, 5L))) // 3 + 2 tokens across two batches
      assert(last("u2") == ((1L, 1L)))
    } finally q.stop()
  }

  test("lang routing is stateless and appends pred_lang") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val routed = TextStream.withLangId(input.toDF().toDF("text"), "text")
    val q = routed.writeStream.format("memory").queryName("routed").start()
    try {
      input.addData("the cat is on the mat", "これはテストです")
      q.processAllAvailable()
      val langs = spark.table("routed").select("pred_lang").as[String].collect().toSet
      assert(langs == Set("en", "ja"))
    } finally q.stop()
  }
}
