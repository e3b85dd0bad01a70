package graft.util

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy hitters as a MERGEABLE typed [[Aggregator]] — the
  * sketch tier for "top tokens over 100 TB": each map task keeps at most
  * `k` counters, partial summaries merge associatively (Agarwal et al.
  * 2012, "Mergeable Summaries", §3), and the final summary guarantees
  *
  *   est(x) ≤ true(x) ≤ est(x) + N/(k+1)
  *
  * for every item, with every item of true frequency > N/(k+1)
  * guaranteed present. One aggregation, state O(k) per task — the
  * groupBy-count alternative shuffles the full token-type table, which
  * at web scale is exactly what a pre-pass sketch exists to avoid.
  *
  * Determinism note (the oracle contract): with `k` at least the number
  * of distinct items, no decrement ever fires, merges are pure counter
  * sums, and the summary equals the EXACT counts regardless of merge
  * order — q_heavy_hitters runs in that regime so DuckDB's GROUP BY is
  * the exact oracle. Under eviction the counts are merge-order-dependent
  * (inherent to MG); the ε-guarantee above is order-independent and is
  * what [[MisraGriesSpec]] asserts there. */
object MisraGries {

  /** Classic MG point update: increment if tracked, insert if room,
    * else decrement ALL counters by 1 (dropping zeros). */
  def update(m: Map[String, Long], x: String, k: Int): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        m.iterator
          .map { case (t, c) => (t, c - 1) }
          .filter(_._2 > 0)
          .toMap
    }

  /** Mergeable-summaries merge: sum counters; if over `k`, subtract the
    * (k+1)-th largest value from all and keep positives. */
  def merge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      val kth = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      sum.iterator
        .map { case (t, c) => (t, c - kth) }
        .filter(_._2 > 0)
        .toMap
    }
  }

  final class Agg(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      MisraGries.update(b, a, k)
    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
      MisraGries.merge(b1, b2, k)
    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (t, c) => (-c, t) }
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }
}
