package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gaps forward-fill from the latest earlier slot; observed flags real slots") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 100L),
      (1L, ts("2024-01-04 09:00:00"), 4.0, 101L))
      .toDF("k", "t", "v", "id")
    val out = Resample.resampleFill(df, "k", "t", "v", "id")
      .select($"k", date_format($"slot", "yyyy-MM-dd").as("d"), $"value", $"observed")
      .orderBy("d").as[(Long, String, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 1.0, true),
      (1L, "2024-01-02", 1.0, false),
      (1L, "2024-01-03", 1.0, false),
      (1L, "2024-01-04", 4.0, true)))
  }

  test("last observation per slot wins, ties broken by the tie column") {
    val df = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 23:00:00"), 2.0, 2L),
      (1L, ts("2024-01-01 23:00:00"), 3.0, 9L)) // same ts: higher id wins
      .toDF("k", "t", "v", "id")
    val out = Resample.resampleFill(df, "k", "t", "v", "id")
      .select($"value").as[Double].collect().toSeq
    assert(out == Seq(3.0))
  }

  test("keys resample independently over their own spans") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1.0, 1L),
      (2L, ts("2024-02-10 00:00:01"), 7.0, 2L),
      (2L, ts("2024-02-11 00:00:01"), 8.0, 3L))
      .toDF("k", "t", "v", "id")
    val out = Resample.resampleFill(df, "k", "t", "v", "id")
      .groupBy($"k").count().orderBy("k").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 2L)))
  }
}
