package graft.topic

import org.scalatest.funsuite.AnyFunSuite

/** PaCMAP port under the reference's own test posture
  * (`reduce.rs:98-136`): shape, determinism, and blob separation — never
  * exact geometry. This port is strictly sequential, so determinism here
  * is bitwise (stronger than the reference's 1e-2 tolerance). */
class PacmapSpec extends AnyFunSuite {

  // the reference test's two interleaved blobs in 8-dim (reduce.rs:111-117)
  private def blobs(n: Int = 40): Array[Array[Float]] =
    Array.tabulate(n) { i =>
      val base = if (i % 2 == 0) 0.0f else 5.0f
      Array.tabulate(8)(j => base + (i * j % 3) * 0.01f)
    }

  test("rejects too few points") {
    val pts = Array.fill(3)(Array(0.0f, 1.0f))
    val e = intercept[IllegalArgumentException](Pacmap.reduce(pts, 2, seed = 7))
    assert(e.getMessage.contains("at least"))
  }

  test("outputs requested dimensionality, deterministically") {
    val pts = blobs()
    val a = Pacmap.reduce(pts, 3, seed = 7)
    assert(a.length == pts.length)
    assert(a.forall(_.length == 3))
    val b = Pacmap.reduce(pts, 3, seed = 7)
    a.zip(b).foreach { case (ra, rb) => assert(ra.toSeq == rb.toSeq) }
    // a different seed moves the embedding (sampled pairs differ)
    val c = Pacmap.reduce(pts, 3, seed = 8)
    assert(a.zip(c).exists { case (ra, rc) => ra.toSeq != rc.toSeq })
  }

  test("well-separated blobs stay separated in 2-D") {
    val pts = blobs(60)
    val out = Pacmap.reduce(pts, 2, seed = 42)
    val (g0, g1) = out.zipWithIndex.partition(_._2 % 2 == 0)
    def centroid(g: Array[(Array[Float], Int)]): Array[Double] = {
      val c = new Array[Double](2)
      g.foreach { case (p, _) => c(0) += p(0); c(1) += p(1) }
      c.map(_ / g.length)
    }
    val c0 = centroid(g0)
    val c1 = centroid(g1)
    val between = math.hypot(c0(0) - c1(0), c0(1) - c1(1))
    def spread(g: Array[(Array[Float], Int)], c: Array[Double]): Double =
      g.map { case (p, _) => math.hypot(p(0) - c(0), p(1) - c(1)) }.max
    // inter-centroid distance dominates both cluster radii
    assert(between > spread(g0, c0), s"between=$between spread0=${spread(g0, c0)}")
    assert(between > spread(g1, c1), s"between=$between spread1=${spread(g1, c1)}")
  }

  test("approximate regime (>8k points): shape, bit-determinism, blob separation") {
    // past MaxExactPoints the candidate search switches to the seeded
    // driver-side IVF — the reference crate's approx_threshold regime
    // (reduce.rs:82). Same contract as its own test posture
    // (reduce.rs:98-136): shape + reproducibility + structure, never
    // exact geometry; this port's determinism is bitwise.
    val n = Pacmap.MaxExactPoints + 500
    val rnd = new scala.util.Random(3L)
    val pts = Array.tabulate(n) { i =>
      val base = if (i % 2 == 0) 0.0f else 6.0f
      Array.tabulate(8)(_ => base + rnd.nextGaussian().toFloat * 0.3f)
    }
    val a = Pacmap.reduce(pts, 2, seed = 7)
    assert(a.length == n && a.forall(_.length == 2))
    val b = Pacmap.reduce(pts, 2, seed = 7)
    a.zip(b).foreach { case (ra, rb) => assert(ra.toSeq == rb.toSeq) }
    // blob structure survives the approximate candidates: centroid gap
    // dominates the mean within-blob radius
    val (g0, g1) = a.zipWithIndex.partition(_._2 % 2 == 0)
    def centroid(g: Array[(Array[Float], Int)]) = {
      val c = new Array[Double](2)
      g.foreach { case (p, _) => c(0) += p(0); c(1) += p(1) }
      c.map(_ / g.length)
    }
    val c0 = centroid(g0); val c1 = centroid(g1)
    val between = math.hypot(c0(0) - c1(0), c0(1) - c1(1))
    def meanSpread(g: Array[(Array[Float], Int)], c: Array[Double]) =
      g.map { case (p, _) => math.hypot(p(0) - c(0), p(1) - c(1)) }.sum / g.length
    assert(between > 2 * meanSpread(g0, c0) && between > 2 * meanSpread(g1, c1),
      s"between=$between spreads=${meanSpread(g0, c0)}/${meanSpread(g1, c1)}")
  }

  test("IVF candidate lists approximate the exact lists well below the boundary") {
    // recall check of the machinery itself, on a size where both paths
    // run: for each point, the IVF candidates must contain most of the
    // true 10 nearest (clustered data — the regime PaCMAP cares about)
    val rnd = new scala.util.Random(11L)
    val pts = Array.tabulate(600) { i =>
      val base = (i % 4) * 4.0f
      Array.tabulate(6)(_ => base + rnd.nextGaussian().toFloat * 0.4f)
    }
    def knnExact(i: Int, k: Int): Set[Int] =
      pts.indices.filter(_ != i)
        .sortBy(j => pts(i).zip(pts(j)).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
        .take(k).toSet
    val (candIdx, _) = Pacmap.ivfCandidatesForTest(pts, kCand = 60, seed = 5L)
    val recalls = pts.indices.take(100).map { i =>
      val truth = knnExact(i, 10)
      truth.count(candIdx(i).contains).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean > 0.9, s"mean candidate recall $mean too low")
  }

  test("the topic pipeline's HDBSCAN separates PaCMAP-reduced blobs") {
    val pts = blobs(60)
    val reduced = Pacmap.reduce(pts, 2, seed = 42)
    // minClusterSize above the blobs' internal 3-way lattice sub-structure
    // (10 points each, which PaCMAP legitimately resolves) so selection
    // can only pick the two planted 30-point blobs
    val res = Cluster.cluster(reduced, Cluster.Config(minClusterSize = 16))
    assert(res.nTopics == 2, s"expected the 2 planted blobs, got ${res.nTopics}")
    // members of the same parity land in the same cluster
    val byParity = res.labels.zipWithIndex.groupBy(_._2 % 2).view.mapValues(_.map(_._1).toSet)
    byParity.values.foreach(labels => assert(labels.size == 1, s"split blob: $byParity"))
  }
}
