package graft.topic

/** Driver-side density clustering of reduced chunk embeddings.
  *
  * The reference uses HDBSCAN
  * (`/root/reference/src/topic_modeling/cluster.rs:62-94`); no JVM HDBSCAN
  * exists here, so this build substitutes '''deterministic DBSCAN with an
  * auto-derived eps''' (median k-th-nearest-neighbor distance). Like
  * HDBSCAN it is density-based, leaves genuinely off-topic points as noise
  * (`-1`) instead of forcing membership, and is deterministic given
  * identical input; unlike HDBSCAN it uses a single density level. This is
  * a documented deviation — the pipeline contract the rest of the stages
  * rely on (noise label `-1`, contiguous labels `0..nTopics`, determinism)
  * is preserved and tested with the reference's own fixtures (blob
  * separation, single point, empty input).
  */
object Cluster {

  val OutlierLabel: Int = -1

  final case class Config(minClusterSize: Int = 10, eps: Option[Double] = None)

  final case class Result(labels: Array[Int], nTopics: Int)

  def cluster(points: Array[Array[Float]], cfg: Config = Config()): Result = {
    val n = points.length
    if (n < 2) return Result(Array.fill(n)(0), if (n == 0) 0 else 1)

    val minPts = math.max(2, math.min(cfg.minClusterSize, n))
    val eps = cfg.eps.getOrElse(autoEps(points, minPts))

    // classic DBSCAN over a precomputed neighbor structure; O(n^2) distance
    // scan is fine at driver scale (chunk counts, not corpus rows)
    val labels = Array.fill(n)(Int.MinValue) // unvisited
    var nextLabel = 0
    val neighborsOf: Int => Array[Int] = { i =>
      val out = Array.newBuilder[Int]
      var j = 0
      while (j < n) {
        if (dist2(points(i), points(j)) <= eps * eps) out += j
        j += 1
      }
      out.result()
    }

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

  /** eps heuristic: median distance to the (minPts-1)-th nearest neighbor,
    * scaled up slightly so core points connect across blob interiors. */
  private def autoEps(points: Array[Array[Float]], minPts: Int): Double = {
    val n = points.length
    val k = math.min(minPts - 1, n - 1)
    val kth = Array.tabulate(n) { i =>
      val ds = new Array[Double](n)
      var j = 0
      while (j < n) { ds(j) = math.sqrt(dist2(points(i), points(j))); j += 1 }
      java.util.Arrays.sort(ds)
      ds(k) // ds(0) is self-distance 0
    }
    java.util.Arrays.sort(kth)
    val median = kth(n / 2)
    math.max(median * 1.5, 1e-12)
  }

  private def dist2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
}
