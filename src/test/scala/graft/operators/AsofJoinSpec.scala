package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, left payload)
  private val left = Seq(
    ("a", 10L, "l1"),
    ("a", 20L, "l2"),
    ("a", 5L, "l0"), // before any right row → null match
    ("b", 7L, "l3"),
    ("c", 9L, "l4") // key with no right rows at all
  ).toDF("k", "ts", "lv")

  // (key, ts, right payload)
  private val right = Seq(
    ("a", 10L, "r10"), // equal-timestamp: must match l1 (<=, not <)
    ("a", 15L, "r15"),
    ("a", 30L, "r30"), // after every left row → never matched
    ("b", 3L, "r3")
  ).toDF("k", "r_ts", "rv")

  private def naive(
      l: Seq[(String, Long, String)],
      r: Seq[(String, Long, String)]): Map[(String, Long, String), Option[(Long, String)]] =
    l.map { case (k, ts, lv) =>
      (k, ts, lv) -> r
        .filter { case (rk, rts, _) => rk == k && rts <= ts }
        .sortBy(_._2)
        .lastOption
        .map { case (_, rts, rv) => (rts, rv) }
    }.toMap

  test("matches the naive latest-at-or-before computation") {
    val out = AsofJoin
      .asofJoin(left, right, Seq("k"), "ts", "r_ts")
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1), r.getString(2)) ->
          (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getString(4)))))
      .toMap
    val expected = naive(
      Seq(("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l0"), ("b", 7L, "l3"), ("c", 9L, "l4")),
      Seq(("a", 10L, "r10"), ("a", 15L, "r15"), ("a", 30L, "r30"), ("b", 3L, "r3")))
    assert(out == expected)
    // spot-pin the contract rows
    assert(out(("a", 10L, "l1")) == Some((10L, "r10"))) // <= match
    assert(out(("a", 20L, "l2")) == Some((15L, "r15"))) // latest, not first
    assert(out(("a", 5L, "l0")) == None) // left join null
    assert(out(("c", 9L, "l4")) == None) // unmatched key
  }

  test("row count is exactly |left| (never a range-join blowup)") {
    assert(AsofJoin.asofJoin(left, right, Seq("k"), "ts", "r_ts").count() == left.count())
  }

  test("null right timestamps are dropped; null left timestamps match nothing") {
    val l = Seq(("a", Option(10L), "l1"), ("a", Option.empty[Long], "ln")).toDF("k", "ts", "lv")
    val r = Seq(("a", Option(1L), "r1"), ("a", Option.empty[Long], "rn")).toDF("k", "r_ts", "rv")
    val out = AsofJoin
      .asofJoin(l, r, Seq("k"), "ts", "r_ts")
      .collect()
      .map(x => x.getString(2) -> Option(x.getString(4)))
      .toMap
    assert(out("l1") == Some("r1"))
    assert(out("ln") == None)
  }

  test("null join keys never match (SQL equi-join semantics, not window-partition semantics)") {
    val l = Seq((Option.empty[String], 10L, "lnk"), (Option("a"), 10L, "lok")).toDF("k", "ts", "lv")
    val r = Seq((Option.empty[String], 1L, "rnk"), (Option("a"), 1L, "rok")).toDF("k", "r_ts", "rv")
    val out = AsofJoin
      .asofJoin(l, r, Seq("k"), "ts", "r_ts")
      .collect()
      .map(x => x.getString(2) -> Option(x.getString(4)))
      .toMap
    assert(out("lnk") == None) // null key must NOT match the null-keyed right row
    assert(out("lok") == Some("rok"))
  }

  test("rejects clashing payload names") {
    val r = right.withColumnRenamed("rv", "lv")
    assertThrows[IllegalArgumentException] {
      AsofJoin.asofJoin(left, r, Seq("k"), "ts", "r_ts")
    }
  }

  test("plan has exactly one shuffle (window on the join keys)") {
    val plan = AsofJoin
      .asofJoin(left, right, Seq("k"), "ts", "r_ts")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }
}
