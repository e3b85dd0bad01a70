package graft.topic

/** Driver-side density clustering of reduced chunk embeddings.
  *
  * The reference uses HDBSCAN
  * (`/root/reference/src/topic_modeling/cluster.rs:62-94`). The default
  * path (no explicit eps) is now the faithful counterpart: a true
  * condensed-tree HDBSCAN ([[Hdbscan]] — Campello, Moulavi & Sander 2013)
  * that handles variable-density corpora a single density level cannot
  * split. Passing `Config.eps = Some(e)` pins the earlier deterministic
  * single-level DBSCAN instead — kept because a pinned density level is a
  * useful probing tool and because the oracle-checked topic queries pin
  * eps for a stable label structure on the tiny test corpus. Both paths
  * honor the pipeline contract the rest of the stages rely on: noise
  * label `-1`, contiguous labels `0..nTopics` in order of first
  * appearance, `minClusterSize` respected, determinism given identical
  * input — tested with the reference's own fixtures (blob separation,
  * varying-density blobs, single point, empty input).
  */
object Cluster {

  val OutlierLabel: Int = -1

  final case class Config(minClusterSize: Int = 10, eps: Option[Double] = None)

  final case class Result(labels: Array[Int], nTopics: Int)

  def cluster(points: Array[Array[Float]], cfg: Config = Config()): Result = {
    val n = points.length
    if (n < 2) return Result(Array.fill(n)(0), if (n == 0) 0 else 1)

    cfg.eps match {
      case None    => Hdbscan.cluster(points, cfg.minClusterSize)
      case Some(e) => dbscan(points, cfg.minClusterSize, e)
    }
  }

  /** Single-density-level DBSCAN at a pinned eps (the pre-HDBSCAN path,
    * reachable only via `Config.eps = Some(e)`). */
  private def dbscan(points: Array[Array[Float]], minClusterSize: Int, eps: Double): Result = {
    val n = points.length
    val minPts = math.max(2, math.min(minClusterSize, n))
    // KD-tree over the ≤5-dim reduced points: every DBSCAN region query
    // runs in ~O(log n) instead of O(n), turning the stage from quadratic
    // to n·log n at large chunk counts (measured 1.48 s → ~0.1 s at 5k
    // points). Range results come back in ascending index order, so
    // labels are identical to the linear-scan formulation.
    val tree = new KdTree(points)

    val labels = Array.fill(n)(Int.MinValue) // unvisited
    var nextLabel = 0
    val neighborsOf: Int => Array[Int] = { i => tree.rangeQuery(points(i), eps) }

    var i = 0
    while (i < n) {
      if (labels(i) == Int.MinValue) {
        val seeds = neighborsOf(i)
        if (seeds.length < minPts) labels(i) = OutlierLabel
        else {
          val label = nextLabel
          nextLabel += 1
          labels(i) = label
          val queue = scala.collection.mutable.Queue(seeds.toIndexedSeq: _*)
          while (queue.nonEmpty) {
            val q = queue.dequeue()
            if (labels(q) == OutlierLabel) labels(q) = label // border point
            if (labels(q) == Int.MinValue) {
              labels(q) = label
              val qn = neighborsOf(q)
              if (qn.length >= minPts) queue.enqueueAll(qn)
            }
          }
        }
      }
      i += 1
    }

    // drop clusters smaller than minClusterSize to noise, then relabel
    // contiguously in order of first appearance (deterministic)
    val sizes = labels.filter(_ >= 0).groupBy(identity).view.mapValues(_.length).toMap
    val remap = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    var t = 0
    while (t < n) {
      val l = labels(t)
      if (l >= 0) {
        if (sizes(l) < minPts) labels(t) = OutlierLabel
        else labels(t) = remap.getOrElseUpdate(l, remap.size)
      }
      t += 1
    }
    Result(labels, remap.size)
  }
}
