package graft.topic

import org.scalatest.funsuite.AnyFunSuite

/** [[BoruvkaMst]] against an in-test brute-force Prim over the same
  * mutual-reachability metric. Mutual-reachability weights tie OFTEN even
  * on random points (every core-dominated edge of a point shares its core
  * distance), so the MST edge SET is legitimately non-unique; what every
  * MST of a graph shares — and what single-linkage/HDBSCAN actually
  * consumes — is (a) the weight multiset and (b) the component partition
  * at every distance threshold. Those are pinned exactly, plus the
  * degenerate all-duplicates tie case and a 20k-point scale budget. */
class BoruvkaMstSpec extends AnyFunSuite {

  private def bruteMst(points: Array[Array[Float]], core: Array[Double]): Array[(Double, Int, Int)] = {
    val n = points.length
    def dist(a: Int, b: Int): Double = {
      var s = 0.0
      var d = 0
      while (d < points(a).length) { val t = points(a)(d).toDouble - points(b)(d); s += t * t; d += 1 }
      math.sqrt(s)
    }
    val inTree = new Array[Boolean](n)
    val key = Array.fill(n)(Double.PositiveInfinity)
    val par = Array.fill(n)(-1)
    key(0) = 0.0
    val edges = Array.newBuilder[(Double, Int, Int)]
    var it = 0
    while (it < n) {
      var u = -1
      var best = Double.PositiveInfinity
      var i = 0
      while (i < n) { if (!inTree(i) && key(i) < best) { best = key(i); u = i }; i += 1 }
      inTree(u) = true
      if (par(u) >= 0) edges += ((key(u), math.min(par(u), u), math.max(par(u), u)))
      var v = 0
      while (v < n) {
        if (!inTree(v)) {
          val mr = math.max(dist(u, v), math.max(core(u), core(v)))
          if (mr < key(v)) { key(v) = mr; par(v) = u }
        }
        v += 1
      }
      it += 1
    }
    edges.result()
  }

  private def coreDists(points: Array[Array[Float]], m: Int): Array[Double] = {
    val tree = new KdTree(points)
    Array.tabulate(points.length)(i => tree.kthNeighborDistance(i, m - 1))
  }

  /** Components of `edges(w ≤ t)` for each threshold t in `cuts`, as a
    * canonical partition (each point mapped to its component's min id). */
  private def partitionsAt(n: Int, edges: Array[(Double, Int, Int)], cuts: Array[Double]): Seq[Seq[Int]] = {
    val sorted = edges.sortBy(_._1)
    val uf = Array.tabulate(n)(identity)
    def find(x0: Int): Int = { var x = x0; while (uf(x) != x) x = uf(x); x }
    var k = 0
    cuts.toSeq.map { t =>
      while (k < sorted.length && sorted(k)._1 <= t) {
        val (_, a, b) = sorted(k)
        val ra = find(a); val rb = find(b)
        if (ra != rb) uf(math.max(ra, rb)) = math.min(ra, rb)
        k += 1
      }
      // canonicalize: min point id per component
      val minOf = scala.collection.mutable.Map.empty[Int, Int]
      (0 until n).foreach { i => val r = find(i); minOf(r) = math.min(minOf.getOrElse(r, i), i) }
      (0 until n).map(i => minOf(find(i)))
    }
  }

  test("weight multiset and every-threshold components match brute-force Prim") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(10, 57, 200); dims <- Seq(2, 5)) {
      val pts = Array.fill(n)(Array.fill(dims)(rnd.nextFloat() * 10f))
      val core = coreDists(pts, math.min(5, n))
      val fast = BoruvkaMst.build(pts, core)
      val slow = bruteMst(pts, core)
      assert(fast.length == n - 1)
      // (a) identical weight multiset — bitwise (same fp formula both sides)
      assert(fast.map(_._1).sorted.toSeq == slow.map(_._1).sorted.toSeq, s"n=$n dims=$dims")
      // (b) identical components at every merge height — the single-linkage
      // (and hence HDBSCAN condensed-tree) equivalence of the two MSTs
      val cuts = slow.map(_._1).distinct.sorted
      assert(partitionsAt(n, fast, cuts) == partitionsAt(n, slow, cuts), s"n=$n dims=$dims")
    }
  }

  test("tied weights (duplicate points): spans with MST-equal total weight") {
    // 3 copies of each of 20 sites → masses of zero-distance ties
    val rnd = new scala.util.Random(11)
    val sites = Array.fill(20)(Array.fill(3)(rnd.nextFloat() * 5f))
    val pts = Array.tabulate(60)(i => sites(i / 3).clone())
    val core = coreDists(pts, 4)
    val fast = BoruvkaMst.build(pts, core)
    val slow = bruteMst(pts, core)
    assert(fast.length == 59)
    // spanning: union-find over the edges connects everything
    val uf = Array.tabulate(60)(identity)
    def find(x0: Int): Int = { var x = x0; while (uf(x) != x) x = uf(x); x }
    fast.foreach { case (_, a, b) => uf(find(a)) = find(b) }
    assert((0 until 60).map(find).distinct.length == 1)
    // every MST has the same weight; compare with a tolerance for fp sums
    val wf = fast.map(_._1).sum
    val ws = slow.map(_._1).sum
    assert(math.abs(wf - ws) < 1e-9, s"$wf vs $ws")
    // deterministic
    val again = BoruvkaMst.build(pts, core)
    assert(fast.toSeq == again.toSeq)
  }

  test("hdbscan end-to-end labels unchanged by the MST swap (random blobs)") {
    // the clustering this MST feeds: same labels the Prim version produced
    // (tie-free data → unique MST → identical condensed tree)
    val rnd = new scala.util.Random(3)
    val pts = Array.tabulate(90) { i =>
      val c = i % 3
      Array.tabulate(3)(d => c * 8.0f + rnd.nextFloat() + d * 0.1f)
    }
    val res = Cluster.cluster(pts, Cluster.Config(minClusterSize = 12))
    assert(res.nTopics == 3, s"got ${res.nTopics}")
    val byBlob = res.labels.zipWithIndex.groupBy(_._2 % 3).view.mapValues(_.map(_._1).toSet)
    byBlob.values.foreach(ls => assert(ls.size == 1))
  }

  test("scales: 20k points in 5 dims build in driver-acceptable time") {
    val rnd = new scala.util.Random(42)
    val pts = Array.fill(20000)(Array.fill(5)(rnd.nextFloat() * 100f))
    val core = coreDists(pts, 10)
    val t0 = System.nanoTime()
    val edges = BoruvkaMst.build(pts, core)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(edges.length == 19999)
    // O(n²) Prim needs ~2·10⁸ full distance evals here (≈ minutes scaled
    // to the 100k cap); the KD Borůvka must stay well under a minute
    assert(sec < 60.0, s"borůvka took $sec s on 20k points")
  }
}
