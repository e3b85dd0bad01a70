package graft.topic

/** KD-tree-accelerated Borůvka MST over the IMPLICIT mutual-reachability
  * graph `mr(a,b) = max(d(a,b), core(a), core(b))` — the HDBSCAN MST
  * stage (the approach of the reference HDBSCAN literature: March,
  * Ram & Gray 2010, "Fast Euclidean Minimum Spanning Tree: Algorithm,
  * Analysis, and Applications"; McInnes & Healy 2017 use the dual-tree
  * variant). Replaces the O(n²) Prim scan flagged in round-10 advice:
  * each Borůvka round runs one nearest-other-component query per point
  * against the shared [[KdTree]], and ≤ ⌈log₂ n⌉ rounds merge everything,
  * so the whole MST costs O(n log n) queries instead of n²/2 distance
  * rows — at the 100k driver-barrier cap that is ~1.7M pruned tree
  * queries versus 10¹⁰ distance evaluations.
  *
  * Pruning (all exact, never approximate):
  *   - a subtree wholly inside the query point's component is skipped
  *     (per-round O(n) bottom-up component summary);
  *   - a subtree whose minimum core distance already reaches the current
  *     best is skipped (`mr ≥ core(j)`; subtree min-core precomputed
  *     once);
  *   - the far child is skipped when the axis gap alone reaches the
  *     current best (`mr ≥ d ≥ |delta|`) — the classic KD bound;
  *   - the whole query stops improving once `best == core(i)`
  *     (`mr ≥ core(i)` for every candidate).
  *
  * Determinism and ties: per-component proposals are chosen by the total
  * order (weight, min id, max id) and applied in that order with a
  * union-find cycle check, so the output is a deterministic function of
  * the input. Every applied edge is a minimum-weight outgoing edge of
  * the component that proposed it at round start (the Borůvka cut
  * property), so total weight equals the MST weight; with tied
  * mutual-reachability distances the edge SET may be a different —
  * equally minimal — spanning tree than Prim's (ties arise only from
  * duplicate points / equal cores; single-linkage merge heights, and
  * hence the HDBSCAN condensed tree's λ values, are unaffected).
  */
private[topic] object BoruvkaMst {

  /** MST edges `(weight, min-id, max-id)`, unsorted (callers sort). */
  def build(points: Array[Array[Float]], core: Array[Double]): Array[(Double, Int, Int)] = {
    val n = points.length
    require(n >= 2, s"mst needs >= 2 points, got $n")
    val tree = new KdTree(points)
    val idx = tree.idx
    val left = tree.left
    val right = tree.right
    val axisOf = tree.axisOf
    val root = tree.root
    val dims = points(0).length

    @inline def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var d = 0
      while (d < dims) { val t = a(d).toDouble - b(d); s += t * t; d += 1 }
      math.sqrt(s)
    }

    // subtree min core distance (one bottom-up pass; tree is balanced —
    // median splits — so recursion depth is ~log₂ n)
    val subMinCore = new Array[Double](n)
    def coreOrder(node: Int): Unit = {
      if (node < 0) return
      coreOrder(left(node))
      coreOrder(right(node))
      var m = core(idx(node))
      if (left(node) >= 0) m = math.min(m, subMinCore(left(node)))
      if (right(node) >= 0) m = math.min(m, subMinCore(right(node)))
      subMinCore(node) = m
    }
    coreOrder(root)

    // union-find (path halving + union by size)
    val parent = Array.tabulate(n)(identity)
    val ufSize = Array.fill(n)(1)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }

    val rootOf = new Array[Int](n)   // point -> component root, per round
    val subComp = new Array[Int](n)  // kd node -> uniform component or -1
    def compOrder(node: Int): Unit = {
      if (node < 0) return
      compOrder(left(node))
      compOrder(right(node))
      var c = rootOf(idx(node))
      if (left(node) >= 0 && subComp(left(node)) != c) c = -1
      if (c >= 0 && right(node) >= 0 && subComp(right(node)) != c) c = -1
      subComp(node) = c
    }

    val edges = new Array[(Double, Int, Int)](n - 1)
    var nEdges = 0
    var comps = n
    while (comps > 1) {
      var i = 0
      while (i < n) { rootOf(i) = find(i); i += 1 }
      compOrder(root)

      // per-component best outgoing edge under (w, minId, maxId) order
      val bestW = Array.fill(n)(Double.PositiveInfinity)
      val bestA = Array.fill(n)(-1)
      val bestB = Array.fill(n)(-1)

      i = 0
      while (i < n) {
        val q = points(i)
        val myComp = rootOf(i)
        val myCore = core(i)
        var best = Double.PositiveInfinity
        var bestJ = -1
        def walk(node: Int): Unit = {
          if (node < 0) return
          if (subComp(node) == myComp) return
          if (math.max(subMinCore(node), myCore) >= best) return
          val p = idx(node)
          if (rootOf(p) != myComp) {
            val mr = math.max(dist(q, points(p)), math.max(myCore, core(p)))
            if (mr < best || (mr == best && p < bestJ)) { best = mr; bestJ = p }
          }
          val delta = q(axisOf(node)) - points(p)(axisOf(node))
          val (near, far) = if (delta < 0) (left(node), right(node)) else (right(node), left(node))
          walk(near)
          if (math.abs(delta) < best) walk(far)
        }
        walk(root)
        // comps > 1 guarantees an other-component point exists
        val a = math.min(i, bestJ)
        val b = math.max(i, bestJ)
        if (best < bestW(myComp) ||
          (best == bestW(myComp) &&
            (a < bestA(myComp) || (a == bestA(myComp) && b < bestB(myComp))))) {
          bestW(myComp) = best
          bestA(myComp) = a
          bestB(myComp) = b
        }
        i += 1
      }

      // apply proposals in (w, a, b) order; the cycle check contracts
      // tied parallel proposals into a single edge
      val proposals = Array.newBuilder[(Double, Int, Int)]
      i = 0
      while (i < n) {
        if (bestA(i) >= 0) proposals += ((bestW(i), bestA(i), bestB(i)))
        i += 1
      }
      val sorted = proposals.result()
      java.util.Arrays.sort(sorted, Ordering.Tuple3[Double, Int, Int])
      var merged = 0
      var k = 0
      while (k < sorted.length) {
        val (w, a, b) = sorted(k)
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) {
          edges(nEdges) = (w, a, b)
          nEdges += 1
          if (ufSize(ra) < ufSize(rb)) { parent(ra) = rb; ufSize(rb) += ufSize(ra) }
          else { parent(rb) = ra; ufSize(ra) += ufSize(rb) }
          merged += 1
        }
        k += 1
      }
      require(merged > 0, "borůvka round merged nothing — unreachable for a finite metric")
      comps -= merged
    }
    edges
  }
}
