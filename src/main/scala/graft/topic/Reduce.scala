package graft.topic

/** Driver-side dimensionality reduction for chunk embeddings.
  *
  * The reference uses PaCMAP (JMLR 2021,
  * `/root/reference/src/topic_modeling/reduce.rs:44-96`); no JVM PaCMAP
  * exists, so this build substitutes '''seeded PCA via power iteration with
  * deflation''' — deterministic for a fixed seed, preserving the global
  * variance structure that clustering needs. This is a documented deviation:
  * the reference itself guarantees only approximate reproducibility
  * (`reduce.rs:125-135`) and validates embedding quality with a manual
  * harness, not CI (`mod.rs:21-24`), so parity here is structural (shape,
  * determinism, separation of well-separated blobs), not geometric.
  *
  * Runs on the driver over the collected `[n_chunks × dim]` matrix — the
  * same explicit global barrier the reference's `is_elementwise=False`
  * expresses (SURVEY §3.2). Chunk counts are corpus-scale, not row-scale;
  * for corpora whose chunk count exceeds driver memory, reduce a sample and
  * project the rest (the power-iteration basis projects any row).
  */
object Reduce {

  /** Minimum points for a meaningful reduction (reference
    * `MIN_POINTS_FOR_REDUCTION`, `reduce.rs:40-43`). */
  val MinPointsForReduction = 12

  /** A fitted reduction: the sample mean and the top-k principal
    * components. Serializable so it can ride a broadcast variable to the
    * executors — `project` is a pure function of one embedding row, which
    * is what lets the over-cap topic path fit on a bounded sample and
    * project every chunk distributed ([[TopicModeling]]). */
  final case class Basis(mean: Array[Double], components: Array[Array[Double]]) extends Serializable {
    def k: Int = components.length
    /** Project one row: `(p - mean) · componentsᵀ`, the exact arithmetic
      * (Double accumulation, ascending-j order) of [[reduce]]'s output
      * loop — `reduce(points, k, seed)(i) == fit(points, k, seed)
      * .project(points(i))` bitwise. */
    def project(p: Array[Float]): Array[Float] = {
      val out = new Array[Float](components.length)
      var c = 0
      while (c < components.length) {
        val v = components(c)
        var s = 0.0
        var j = 0
        while (j < v.length) { s += (p(j) - mean(j)) * v(j); j += 1 }
        out(c) = s.toFloat
        c += 1
      }
      out
    }
  }

  def reduce(points: Array[Array[Float]], outputDims: Int, seed: Long = 42L): Array[Array[Float]] = {
    val basis = fit(points, outputDims, seed)
    points.map(basis.project)
  }

  /** Fit the mean + top-k power-iteration basis on `points` without
    * projecting them (the sample-fit half of sample-fit-then-project). */
  def fit(points: Array[Array[Float]], outputDims: Int, seed: Long = 42L): Basis = {
    val n = points.length
    require(n >= MinPointsForReduction, s"reduce called with $n points; need at least $MinPointsForReduction")
    val dim = points.head.length
    require(dim > 0, "reduce called with zero-dimensional points")
    require(points.forall(_.length == dim), "reduce called with ragged embedding rows")
    val k = math.min(outputDims, dim)

    // center
    val mean = new Array[Double](dim)
    points.foreach { p => var d = 0; while (d < dim) { mean(d) += p(d); d += 1 } }
    var d = 0
    while (d < dim) { mean(d) /= n; d += 1 }
    val x = Array.tabulate(n, dim)((i, j) => points(i)(j) - mean(j))

    // top-k eigenvectors of X^T X via power iteration + deflation
    val rnd = new scala.util.Random(seed)
    val basis = Array.ofDim[Double](k, dim)
    var comp = 0
    while (comp < k) {
      var v = Array.fill(dim)(rnd.nextGaussian())
      normalize(v)
      var iter = 0
      var converged = false
      // early exit once successive iterates align to machine precision —
      // deterministic (a pure function of the input), and each power
      // iteration is an O(n·dim) pass over the whole matrix, so stopping
      // at convergence instead of a fixed 100 is the difference between
      // ~20 and 100 full-matrix sweeps per component at large chunk counts
      while (iter < 100 && !converged) {
        // w = X^T (X v)
        val xv = new Array[Double](n)
        var i = 0
        while (i < n) { xv(i) = dot(x(i), v); i += 1 }
        val w = new Array[Double](dim)
        i = 0
        while (i < n) {
          val row = x(i); val c = xv(i)
          var j = 0
          while (j < dim) { w(j) += row(j) * c; j += 1 }
          i += 1
        }
        // deflate against previous components
        var p = 0
        while (p < comp) { subtractProjection(w, basis(p)); p += 1 }
        normalize(w)
        converged = math.abs(dot(w, v)) > 1.0 - 1e-12
        v = w
        iter += 1
      }
      basis(comp) = v
      comp += 1
    }

    // sign convention: make each component's largest-|coord| entry positive
    // so the embedding is unique (eigenvectors are sign-ambiguous)
    basis.foreach { v =>
      var maxIdx = 0
      var j = 1
      while (j < dim) { if (math.abs(v(j)) > math.abs(v(maxIdx))) maxIdx = j; j += 1 }
      if (v(maxIdx) < 0) { j = 0; while (j < dim) { v(j) = -v(j); j += 1 } }
    }

    Basis(mean, basis)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def normalize(v: Array[Double]): Unit = {
    val n = math.sqrt(dot(v, v))
    if (n > 0) { var i = 0; while (i < v.length) { v(i) /= n; i += 1 } }
  }

  private def subtractProjection(w: Array[Double], v: Array[Double]): Unit = {
    val p = dot(w, v)
    var i = 0
    while (i < w.length) { w(i) -= p * v(i); i += 1 }
  }
}
