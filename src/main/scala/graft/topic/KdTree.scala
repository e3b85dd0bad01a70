package graft.topic

/** Static KD-tree over the reduced chunk embeddings (low-dim: the topic
  * pipeline reduces to ≤5 dims before clustering), used by [[Cluster]] for
  * exact k-th-nearest-neighbor distances and eps-range queries in
  * O(log n)-ish per query instead of the O(n) linear scan — the difference
  * between a quadratic and an n·log n driver clustering stage at large
  * chunk counts.
  *
  * Deterministic: the build splits on the median by (coordinate, index)
  * order, so identical input produces an identical tree and identical
  * query results.
  */
private[topic] final class KdTree(points: Array[Array[Float]]) {

  private val n = points.length
  private val dims = if (n == 0) 0 else points(0).length
  // tree laid out as index permutation + per-node split axis; exposed to
  // the package so [[BoruvkaMst]] can walk the same structure with its
  // own component-aware pruning
  private[topic] val idx = Array.tabulate(n)(identity)
  private[topic] val left = Array.fill(n)(-1)
  private[topic] val right = Array.fill(n)(-1)
  private[topic] val axisOf = Array.fill(n)(0)
  private[topic] val root = if (n == 0) -1 else build(0, n, 0)

  /** Build over idx[from, until), returns position in idx of the subtree
    * root. Median-of-range split on `axis`, ties broken by original index
    * so the structure is deterministic. */
  private def build(from: Int, until: Int, axis: Int): Int = {
    if (from >= until) return -1
    val slice = idx.slice(from, until)
    scala.util.Sorting.stableSort(
      slice,
      (a: Int, b: Int) =>
        points(a)(axis) < points(b)(axis) ||
          (points(a)(axis) == points(b)(axis) && a < b))
    System.arraycopy(slice, 0, idx, from, slice.length)
    val mid = from + (until - from) / 2
    val node = mid
    axisOf(node) = axis
    val nextAxis = (axis + 1) % dims
    left(node) = build(from, mid, nextAxis)
    right(node) = build(mid + 1, until, nextAxis)
    node
  }

  private def dist2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** All point indices within `eps` (inclusive) of `q`, in ascending index
    * order — matching what a linear scan produces, so callers that depend
    * on visit order (DBSCAN border assignment) behave identically. */
  def rangeQuery(q: Array[Float], eps: Double): Array[Int] = {
    val out = Array.newBuilder[Int]
    val eps2 = eps * eps
    def walk(node: Int): Unit = {
      if (node < 0) return
      val p = idx(node)
      if (dist2(q, points(p)) <= eps2) out += p
      val axis = axisOf(node)
      val delta = q(axis) - points(p)(axis)
      if (delta <= eps) walk(left(node))
      if (delta >= -eps) walk(right(node))
    }
    walk(root)
    val arr = out.result()
    java.util.Arrays.sort(arr)
    arr
  }

  /** Distance to the k-th nearest neighbor of `points(i)` counting the
    * point itself as its own 0-th neighbor (k < n required) — exactly the
    * value a full sorted distance array yields at position k. */
  def kthNeighborDistance(i: Int, k: Int): Double = {
    val q = points(i)
    // bounded max-heap of the k+1 smallest distances (self included)
    val heap = new java.util.PriorityQueue[java.lang.Double](k + 1, java.util.Collections.reverseOrder())
    def walk(node: Int): Unit = {
      if (node < 0) return
      val p = idx(node)
      val d2 = dist2(q, points(p))
      if (heap.size < k + 1) heap.add(d2)
      else if (d2 < heap.peek()) { heap.poll(); heap.add(d2) }
      val axis = axisOf(node)
      val delta = q(axis) - points(p)(axis)
      val bound = if (heap.size < k + 1) Double.PositiveInfinity else math.sqrt(heap.peek())
      if (delta <= bound) walk(left(node))
      if (delta >= -bound) walk(right(node))
    }
    walk(root)
    math.sqrt(heap.peek())
  }
}
