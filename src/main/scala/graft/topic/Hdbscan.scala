package graft.topic

/** Driver-side HDBSCAN (Campello, Moulavi & Sander 2013: "Density-Based
  * Clustering Based on Hierarchical Density Estimates") — the faithful
  * counterpart of the reference's clustering stage
  * (`/root/reference/src/topic_modeling/cluster.rs:62-94`), replacing the
  * earlier single-eps DBSCAN stand-in on the default (no explicit eps)
  * path. Variable-density corpora — the case a single density level
  * cannot split — now cluster correctly (spec: varying-density blobs).
  *
  * Pipeline contract preserved: noise label `-1`, contiguous labels
  * `0..nTopics` in order of first appearance, `minClusterSize` honored,
  * fully deterministic ((weight, id, id) total edge order in the MST
  * build and the dendrogram build).
  *
  * Algorithm, all exact:
  *   1. core distance per point = distance to its (m−1)-th nearest
  *      neighbor (KD-tree, self counted at rank 0);
  *   2. MST of the mutual-reachability graph
  *      `max(d(a,b), core(a), core(b))` via KD-tree-accelerated Borůvka
  *      ([[BoruvkaMst]]) — O(n log n)-ish time, O(n) space, so the
  *      driver barrier's `n` (`TopicModeling.Config.maxDriverChunks`,
  *      default 100k) stays seconds, not the hours an O(n²) scan costs
  *      there (the reference's own HDBSCAN is the same driver-side
  *      barrier);
  *   3. single-linkage dendrogram from the sorted MST edges (union-find);
  *   4. condensed tree with `minClusterSize`: small split-offs fall out
  *      as point departures at λ = 1/d, both-sides-valid splits create
  *      child clusters;
  *   5. cluster stability σ(C) = Σ_p (λ_p − λ_birth(C)); excess-of-mass
  *      selection (a parent beats its children iff its stability exceeds
  *      their subtree sum; the root is never selected);
  *   6. labels: each point maps to the topmost selected cluster on its
  *      condensed ancestor path, noise otherwise.
  */
object Hdbscan {

  /** λ = 1/distance, capped so zero-distance merges (duplicate points)
    * keep stabilities finite and comparisons deterministic. */
  private val LambdaMax = 1e12

  @inline private def lambdaOf(d: Double): Double =
    if (d <= 0.0) LambdaMax else math.min(1.0 / d, LambdaMax)

  def cluster(points: Array[Array[Float]], minClusterSize: Int): Cluster.Result = {
    val n = points.length
    require(n >= 2, s"hdbscan needs >= 2 points, got $n")
    val m = math.max(2, math.min(minClusterSize, n))

    // 1. core distances (k-th including self at rank 0 → m-1 excluding)
    val tree = new KdTree(points)
    val core = Array.tabulate(n)(i => tree.kthNeighborDistance(i, m - 1))

    // 2. MST over implicit mutual reachability via KD-tree Borůvka
    //    ([[BoruvkaMst]]) — O(n log n)-ish vs the O(n²) Prim scan it
    //    replaced, the difference between seconds and hours at the
    //    100k driver-barrier cap.
    val edges = BoruvkaMst.build(points, core)
    java.util.Arrays.sort(edges, Ordering.Tuple3[Double, Int, Int])

    // 3. single-linkage dendrogram: internal node n+k merges the two
    //    components of sorted edge k
    val nNodes = 2 * n - 1
    val left = new Array[Int](n - 1)
    val right = new Array[Int](n - 1)
    val mergeDist = new Array[Double](n - 1)
    val size = new Array[Int](nNodes)
    java.util.Arrays.fill(size, 0, n, 1)
    val uf = Array.tabulate(nNodes)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (uf(x) != x) { uf(x) = uf(uf(x)); x = uf(x) }
      x
    }
    var k = 0
    while (k < n - 1) {
      val (w, a, b) = edges(k)
      val ra = find(a)
      val rb = find(b)
      left(k) = ra
      right(k) = rb
      mergeDist(k) = w
      size(n + k) = size(ra) + size(rb)
      uf(ra) = n + k
      uf(rb) = n + k
      k += 1
    }
    val root = nNodes - 1

    // 4.+5. condense with minClusterSize m, accumulating stabilities.
    //    Condensed cluster 0 is the root (birth λ 0); children get ids in
    //    creation order, so every child id > its parent id.
    val condParent = scala.collection.mutable.ArrayBuffer(-1)
    val condBirth = scala.collection.mutable.ArrayBuffer(0.0)
    val stability = scala.collection.mutable.ArrayBuffer(0.0)
    val pointCluster = Array.fill(n)(0)

    def leavesOf(node: Int, f: Int => Unit): Unit = {
      val stack = scala.collection.mutable.ArrayDeque(node)
      while (stack.nonEmpty) {
        val x = stack.removeLast()
        if (x < n) f(x)
        else { stack.append(left(x - n)); stack.append(right(x - n)) }
      }
    }

    // stack of (dendrogram node with size >= m, condensed cluster id)
    val work = scala.collection.mutable.ArrayDeque((root, 0))
    while (work.nonEmpty) {
      val (node, cid) = work.removeLast()
      val e = node - n
      val lam = lambdaOf(mergeDist(e))
      val l = left(e)
      val r = right(e)
      val sl = size(l)
      val sr = size(r)
      if (sl >= m && sr >= m) {
        // true split: every current point leaves cid here; two children born
        stability(cid) += (sl + sr) * (lam - condBirth(cid))
        val cidL = condParent.length
        condParent += cid; condBirth += lam; stability += 0.0
        val cidR = condParent.length
        condParent += cid; condBirth += lam; stability += 0.0
        if (l >= n) work.append((l, cidL)) else () // unreachable: size >= m >= 2
        if (r >= n) work.append((r, cidR)) else ()
        // (leaves can't reach here — their size is 1 < m)
      } else {
        // small side(s) fall out of cid as points at λ; big side continues
        def fallOut(sub: Int): Unit = leavesOf(sub, { p =>
          stability(cid) += lam - condBirth(cid)
          pointCluster(p) = cid
        })
        if (sl < m) fallOut(l) else work.append((l, cid))
        if (sr < m) fallOut(r) else work.append((r, cid))
      }
    }

    val nCond = condParent.length
    // 5. excess-of-mass selection, deepest-first (child ids > parent ids)
    val childSum = new Array[Double](nCond)
    val hasChildren = new Array[Boolean](nCond)
    val selected = new Array[Boolean](nCond)
    val subtreeStab = new Array[Double](nCond)
    var cid = nCond - 1
    while (cid >= 1) {
      if (!hasChildren(cid)) { selected(cid) = true; subtreeStab(cid) = stability(cid) }
      else if (stability(cid) > childSum(cid)) {
        selected(cid) = true // descendants lose via the topmost-selected rule
        subtreeStab(cid) = stability(cid)
      } else subtreeStab(cid) = childSum(cid)
      val p = condParent(cid)
      childSum(p) += subtreeStab(cid)
      hasChildren(p) = true
      cid -= 1
    }
    // root (0) is never selected — all-one-cluster corpora yield 0 topics
    // (HDBSCAN's allow_single_cluster=false posture)

    // 6. labels: topmost selected cluster on each point's ancestor path
    val chosen = new Array[Int](nCond) // per condensed cluster: its label source
    var c = 0
    while (c < nCond) {
      // walk up collecting the closest-to-root selected ancestor (or self)
      var top = -1
      var x = c
      while (x >= 1) { if (selected(x)) top = x; x = condParent(x) }
      chosen(c) = top
      c += 1
    }
    val labels = new Array[Int](n)
    val remap = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    var p = 0
    while (p < n) {
      val t = chosen(pointCluster(p))
      labels(p) = if (t < 0) Cluster.OutlierLabel else remap.getOrElseUpdate(t, remap.size)
      p += 1
    }
    Cluster.Result(labels, remap.size)
  }
}
