package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val points = Seq(
    ("a", ts("2024-01-01 00:10:00"), "p1"),
    ("a", ts("2024-01-01 02:30:00"), "p2"),
    ("a", ts("2024-01-01 05:00:00"), "p3"), // inside no interval
    ("b", ts("2024-01-01 00:10:00"), "p4") // same time as p1, different key
  ).toDF("k", "ts", "pv")

  private val intervals = Seq(
    ("a", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), "i1"), // catches p1
    ("a", ts("2024-01-01 00:05:00"), ts("2024-01-01 03:00:00"), "i2"), // catches p1 AND p2 (overlap)
    ("b", ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00"), "i3") // catches nothing
  ).toDF("k", "start", "end", "iv")

  private def run(granule: Long) =
    RangeJoin
      .pointInInterval(points, intervals, Seq("k"), "ts", "start", "end", granule)
      .select("pv", "iv")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet

  private val expected = Set(("p1", "i1"), ("p1", "i2"), ("p2", "i2"))

  test("matches the naive BETWEEN join, once per pair") {
    assert(run(3600L) == expected)
  }

  test("granularity does not change the answer (coarse and fine)") {
    assert(run(60L) == expected) // intervals span many granules
    assert(run(86400L) == expected) // everything in one granule
  }

  test("boundary timestamps are inclusive on both ends") {
    val p = Seq(("a", ts("2024-01-01 01:00:00"), "edge")).toDF("k", "ts", "pv")
    val out = RangeJoin
      .pointInInterval(p, intervals, Seq("k"), "ts", "start", "end")
      .select("pv", "iv").as[(String, String)].collect().toSet
    assert(out.contains(("edge", "i1"))) // ts == end
    assert(out.contains(("edge", "i2")))
  }

  test("plan is an equi-join on (key, granule) — no cross product") {
    val plan = RangeJoin
      .pointInInterval(points, intervals, Seq("k"), "ts", "start", "end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("null and inverted intervals are dropped; null points match nothing") {
    val p = Seq(("a", Option.empty[Timestamp], "pn")).toDF("k", "ts", "pv")
    val iv = Seq(
      ("a", Option(ts("2024-01-01 02:00:00")), Option(ts("2024-01-01 01:00:00")), "inv"),
      ("a", Option.empty[Timestamp], Option(ts("2024-01-01 01:00:00")), "nul"))
      .toDF("k", "start", "end", "iv")
    assert(RangeJoin.pointInInterval(points, iv, Seq("k"), "ts", "start", "end").count() == 0)
    assert(RangeJoin.pointInInterval(p, intervals, Seq("k"), "ts", "start", "end").count() == 0)
  }
}
