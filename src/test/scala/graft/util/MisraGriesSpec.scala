package graft.util

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Misra–Gries semantics: classic update, mergeable-summaries merge,
  * the order-independent ε-guarantee under eviction, and exactness when
  * k exceeds the distinct-item count (the q_heavy_hitters regime). */
class MisraGriesSpec extends AnyFunSuite {

  private def runSeq(xs: Seq[String], k: Int): Map[String, Long] =
    xs.foldLeft(Map.empty[String, Long])((m, x) => MisraGries.update(m, x, k))

  test("k >= distinct items: summary is exactly the count table") {
    val xs = Seq("a", "b", "a", "c", "a", "b")
    assert(runSeq(xs, 8) == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("classic decrement: untracked item with full table decrements all") {
    // k=2, stream a a b c: c arrives with table {a:2, b:1} full →
    // decrement all, drop zeros → {a:1}
    assert(runSeq(Seq("a", "a", "b", "c"), 2) == Map("a" -> 1L))
  }

  test("epsilon guarantee holds for any merge split (order independence of the bound)") {
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(2000)(s"t${rnd.nextInt(40)}")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 10
    val n = items.size.toLong
    for (splitAt <- Seq(1, 137, 500, 1999)) {
      val (l, r) = items.splitAt(splitAt)
      val merged = MisraGries.merge(runSeq(l, k), runSeq(r, k), k)
      assert(merged.size <= k)
      // est(x) <= true(x) <= est(x) + N/(k+1), for every item
      for ((t, c) <- truth) {
        val est = merged.getOrElse(t, 0L)
        assert(est <= c, s"$t overestimated at split $splitAt")
        assert(c <= est + n / (k + 1) + 1, s"$t misses the bound at split $splitAt")
      }
    }
  }

  test("merge with no overflow is a plain counter sum") {
    val a = Map("x" -> 3L, "y" -> 1L)
    val b = Map("y" -> 2L, "z" -> 5L)
    assert(MisraGries.merge(a, b, 8) == Map("x" -> 3L, "y" -> 3L, "z" -> 5L))
  }
}

/** Distributed end-to-end: the Aggregator over a repartitioned Dataset
  * equals the exact counts in the k>distinct regime, independent of the
  * partitioning (the merge-order-independence argument made real). */
class MisraGriesAggSpec extends SparkSpec {

  import spark.implicits._

  test("Agg over shuffled partitions equals exact counts when k >= distinct") {
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(5000)(s"w${rnd.nextInt(25)}")
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val ds = xs.toDS().repartition(parts)
      val got = ds.select(new MisraGries.Agg(64).toColumn).head()
      assert(got.toMap == truth, s"parts=$parts")
    }
  }
}
