package graft.topic

/** Driver-side PaCMAP (Wang, Huang, Rudin & Shaposhnik, "Understanding
  * How Dimension Reduction Tools Work", JMLR 22(201), 2021) — the
  * reduction the reference runs
  * (`/root/reference/src/topic_modeling/reduce.rs:44-96`), ported from
  * the published algorithm with the reference's exact configuration:
  * PCA initialization, 10 neighbors, mid-near ratio 0.5 (→ 5 pairs),
  * far-pair ratio 2.0 (→ 20 pairs), learning rate 1.0, three phases of
  * (100, 100, 250) iterations, seeded.
  *
  * Faithfulness contract: the reference's own tests assert SHAPE and
  * approximate determinism only, never geometry (`reduce.rs:98-136` —
  * tolerance 1e-2 between two same-seed runs); this port is stronger —
  * strictly sequential driver arithmetic, so same seed + input ⇒
  * bit-identical output.
  *
  * Algorithm (paper §4; weights/gradients from its published reference
  * implementation):
  *   - '''Neighbor pairs''': for each point, the `nNeighbors` nearest by
  *     SCALED distance d²ᵢⱼ/(σᵢσⱼ), where σᵢ is the mean Euclidean
  *     distance to the 4th–6th raw nearest neighbors (adaptive local
  *     scaling), selected among the `nNeighbors + 50` raw-nearest
  *     candidates.
  *   - '''Mid-near pairs''': `⌈nNeighbors · midNearRatio⌉` per point —
  *     each sampled as the SECOND-nearest of 6 random distinct points.
  *   - '''Further pairs''': `⌈nNeighbors · farRatio⌉` per point, sampled
  *     uniformly outside the neighbor list.
  *   - '''Loss''' (d̃ = 1 + ‖yᵢ−yⱼ‖²): near w·d̃/(10+d̃), mid-near
  *     w·d̃/(10000+d̃), far w/(1+d̃); three-phase weight schedule
  *     (w_MN: 1000→3 linear, then 3, then 0; w_NB: 2, 3, 1; w_FP: 1).
  *   - '''Optimizer''': Adam (β₁=0.9, β₂=0.999, ε=1e-7, lr 1.0).
  *
  * Scale posture: exact kNN is O(n²·dim) on the driver, so candidate
  * search switches regimes at the reference crate's own
  * `approx_threshold` boundary ([[MaxExactPoints]], `reduce.rs:82`):
  * exact pairwise scan below, seeded driver-side IVF candidate search
  * above ([[ivfCandidates]] — the crate's approximate-neighbor regime,
  * re-expressed with the ANN tier's coarse-quantizer machinery), so an
  * 8 k–[[TopicModeling.Config.maxDriverChunks]] corpus keeps PaCMAP
  * geometry. Past the driver cap the topic pipeline's sampled path
  * uses the linear PCA basis ([[Reduce]]) — PaCMAP has no
  * out-of-sample transform, so a 100 TB corpus could not ride it
  * distributed anyway. */
object Pacmap {

  /** Reference crate `approx_threshold` (`reduce.rs:82`): exact
    * neighbor search below, IVF-approximate above — both regimes
    * implemented here, same boundary. */
  val MaxExactPoints = 8000

  final case class Config(
      nNeighbors: Int = 10,
      midNearRatio: Double = 0.5,
      farRatio: Double = 2.0,
      itersPhase1: Int = 100,
      itersPhase2: Int = 100,
      itersPhase3: Int = 250,
      learningRate: Double = 1.0)

  /** Reduce `points` to `outputDims`. Deterministic for a fixed seed. */
  def reduce(
      points: Array[Array[Float]],
      outputDims: Int,
      seed: Long = 42L,
      cfg: Config = Config()): Array[Array[Float]] = {
    val n = points.length
    require(n >= Reduce.MinPointsForReduction,
      s"reduce called with $n points; need at least ${Reduce.MinPointsForReduction}")
    val dim = points.head.length
    require(dim > 0, "reduce called with zero-dimensional points")

    val nN = math.min(cfg.nNeighbors, n - 2)
    val nMN = math.max(1, math.round(nN * cfg.midNearRatio).toInt)
    val nFPWanted = math.max(1, math.round(nN * cfg.farRatio).toInt)

    // ---- pair construction ------------------------------------------
    val rnd = new scala.util.Random(seed)

    // raw k-nearest candidates (k = nN + 50, the published margin):
    // exact O(n²·dim) scan below the reference crate's approx_threshold,
    // seeded IVF-bucketed approximate search above it — the same regime
    // switch pacmap-rs makes at `approx_threshold` (`reduce.rs:82`),
    // feeding the identical σ-scaling / pair / gradient machinery
    val kCand = math.min(n - 1, nN + 50)
    val (candIdx, candDist) =
      if (n <= MaxExactPoints) exactCandidates(points, kCand)
      else ivfCandidates(points, kCand, seed)
    var i = 0

    // adaptive scale σᵢ: mean raw distance to the 4th–6th nearest
    val sig = new Array[Double](n)
    i = 0
    while (i < n) {
      val hi = math.min(6, kCand)
      val lo = math.min(3, hi - 1)
      var s = 0.0
      var j = lo
      while (j < hi) { s += candDist(i)(j); j += 1 }
      sig(i) = math.max(s / math.max(1, hi - lo), 1e-10)
      i += 1
    }

    // neighbor pairs: nN smallest SCALED distances among the candidates
    val nbr = Array.ofDim[Int](n, nN)
    i = 0
    while (i < n) {
      val scaled = Array.tabulate(kCand) { j =>
        val d = candDist(i)(j)
        d * d / (sig(i) * sig(candIdx(i)(j)))
      }
      val order = Array.range(0, kCand).sortBy(scaled)
      var j = 0
      while (j < nN) { nbr(i)(j) = candIdx(i)(order(j)); j += 1 }
      i += 1
    }

    // mid-near pairs: second-closest of 6 random distinct points
    val mid = Array.ofDim[Int](n, nMN)
    i = 0
    while (i < n) {
      var m = 0
      while (m < nMN) {
        val picks = new Array[Int](6)
        var p = 0
        while (p < 6) {
          var c = rnd.nextInt(n)
          while (c == i || contains(picks, p, c)) c = rnd.nextInt(n)
          picks(p) = c
          p += 1
        }
        var best = -1; var bestD = Double.MaxValue
        var second = -1; var secondD = Double.MaxValue
        p = 0
        while (p < 6) {
          val d = sqDist(points(i), points(picks(p)))
          if (d < bestD) {
            second = best; secondD = bestD
            best = picks(p); bestD = d
          } else if (d < secondD) { second = picks(p); secondD = d }
          p += 1
        }
        mid(i)(m) = second
        m += 1
      }
      i += 1
    }

    // further pairs: uniform outside the neighbor list
    val nFP = math.min(nFPWanted, math.max(1, n - 1 - nN))
    val far = Array.ofDim[Int](n, nFP)
    i = 0
    while (i < n) {
      var f = 0
      while (f < nFP) {
        var c = rnd.nextInt(n)
        while (c == i || contains(nbr(i), nN, c) || contains(far(i), f, c)) c = rnd.nextInt(n)
        far(i)(f) = c
        f += 1
      }
      i += 1
    }

    // ---- optimization ------------------------------------------------
    // PCA init (seeded power iteration), scaled ×0.01 — the paper's
    // standard deterministic start, matching Initialization::Pca
    val k = math.min(outputDims, dim)
    val y: Array[Array[Double]] = {
      val pca = Reduce.reduce(points, k, seed)
      Array.tabulate(n, k)((r, c) => pca(r)(c) * 0.01)
    }
    val grad = Array.ofDim[Double](n, k)
    val m1 = Array.ofDim[Double](n, k)
    val m2 = Array.ofDim[Double](n, k)
    val beta1 = 0.9
    val beta2 = 0.999
    val eps = 1e-7
    val totalIters = cfg.itersPhase1 + cfg.itersPhase2 + cfg.itersPhase3

    var itr = 0
    while (itr < totalIters) {
      val (wMN, wNB, wFP) =
        if (itr < cfg.itersPhase1) {
          val t = itr.toDouble / cfg.itersPhase1
          (1000.0 * (1.0 - t) + 3.0 * t, 2.0, 1.0)
        } else if (itr < cfg.itersPhase1 + cfg.itersPhase2) (3.0, 3.0, 1.0)
        else (0.0, 1.0, 1.0)

      i = 0
      while (i < n) { java.util.Arrays.fill(grad(i), 0.0); i += 1 }

      i = 0
      while (i < n) {
        val yi = y(i)
        var j = 0
        while (j < nN) { // attractive: w · 20/(10+d̃)²
          accumulate(y, grad, i, nbr(i)(j), yi, attractive = true, num = 20.0, den = 10.0, w = wNB)
          j += 1
        }
        j = 0
        while (j < nMN) { // attractive: w · 20000/(10000+d̃)²
          if (wMN > 0.0)
            accumulate(y, grad, i, mid(i)(j), yi, attractive = true, num = 20000.0, den = 10000.0, w = wMN)
          j += 1
        }
        j = 0
        while (j < nFP) { // repulsive: w · 2/(1+d̃)²
          accumulate(y, grad, i, far(i)(j), yi, attractive = false, num = 2.0, den = 1.0, w = wFP)
          j += 1
        }
        i += 1
      }

      // Adam step
      val b1t = 1.0 - math.pow(beta1, itr + 1.0)
      val b2t = 1.0 - math.pow(beta2, itr + 1.0)
      i = 0
      while (i < n) {
        var c = 0
        while (c < k) {
          val g = grad(i)(c)
          m1(i)(c) = beta1 * m1(i)(c) + (1 - beta1) * g
          m2(i)(c) = beta2 * m2(i)(c) + (1 - beta2) * g * g
          y(i)(c) -= cfg.learningRate * (m1(i)(c) / b1t) / (math.sqrt(m2(i)(c) / b2t) + eps)
          c += 1
        }
        i += 1
      }
      itr += 1
    }

    Array.tabulate(n, k)((r, c) => y(r)(c).toFloat)
  }

  /** Exact candidate lists: full pairwise scan, the ≤ [[MaxExactPoints]]
    * regime. Returns `(candIdx, candDist)` with distances in EUCLIDEAN
    * (not squared) form, ascending. */
  private def exactCandidates(
      points: Array[Array[Float]],
      kCand: Int): (Array[Array[Int]], Array[Array[Double]]) = {
    val n = points.length
    val candIdx = Array.ofDim[Int](n, kCand)
    val candDist = Array.ofDim[Double](n, kCand)
    val di = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        di(j) = if (j == i) Double.MaxValue else sqDist(points(i), points(j))
        j += 1
      }
      // partial selection of the kCand smallest (selection via sorted indices;
      // n is driver-bounded so the n·log n sort is immaterial)
      val order = Array.range(0, n).sortBy(di)
      j = 0
      while (j < kCand) {
        candIdx(i)(j) = order(j)
        candDist(i)(j) = math.sqrt(di(order(j)))
        j += 1
      }
      i += 1
    }
    (candIdx, candDist)
  }

  /** Approximate candidate lists for the > [[MaxExactPoints]] regime —
    * the reference crate switches to approximate neighbors here
    * (`reduce.rs:82`); this port reuses the ANN tier's coarse-quantizer
    * idea DRIVER-SIDE: seeded Lloyd over √n-ish cells
    * ([[graft.similarity.Similarity.trainCentroids]] — the same trainer
    * the IVF operators use), then each point scans only the members of
    * its nearest cells, probing outward until it has seen ≥ 4 × kCand
    * candidates (or every cell). O(n · (cells + probedMembers) · dim)
    * instead of O(n²·dim): ~100 k points reduce in the same order of
    * time 8 k took exactly. Deterministic: seeded training sample,
    * seeded Lloyd, index-ordered cell member lists, (dist, idx)
    * tie-broken selection — same seed + input ⇒ bit-identical output,
    * stronger than the crate's own 1e-2 reproducibility contract. */
  private def ivfCandidates(
      points: Array[Array[Float]],
      kCand: Int,
      seed: Long): (Array[Array[Int]], Array[Array[Double]]) = {
    val n = points.length
    val nCells = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    // seeded bounded training sample (index-hash order, the trainedCentroids posture)
    val sampleIdx = Array.range(0, n)
      .sortBy(i => java.lang.Long.rotateLeft(i.toLong * 0x9e3779b97f4a7c15L ^ seed, 17))
      .take(math.min(n, 10000))
    val centroids = graft.similarity.Similarity.trainCentroids(
      sampleIdx.map(points(_)), nCells, seed)
    val k = centroids.length
    // cell member lists in ascending point order (deterministic)
    val cellOf = new Array[Int](n)
    val sizes = new Array[Int](k)
    var i = 0
    while (i < n) {
      val c = graft.similarity.Similarity.nearestCell(points(i), centroids)
      cellOf(i) = c
      sizes(c) += 1
      i += 1
    }
    val members = Array.tabulate(k)(c => new Array[Int](sizes(c)))
    val fill = new Array[Int](k)
    i = 0
    while (i < n) {
      val c = cellOf(i)
      members(c)(fill(c)) = i
      fill(c) += 1
      i += 1
    }
    val candIdx = Array.ofDim[Int](n, kCand)
    val candDist = Array.ofDim[Double](n, kCand)
    val wanted = 4 * kCand
    i = 0
    while (i < n) {
      // probe cells in ascending centroid distance until enough candidates
      val order = centroids.indices
        .map(c => (sqDist2(points(i), centroids(c)), c))
        .sorted
      val cand = new scala.collection.mutable.ArrayBuffer[Int](wanted + 64)
      var p = 0
      while (p < order.length && cand.length < wanted) {
        val ms = members(order(p)._2)
        var m = 0
        while (m < ms.length) {
          if (ms(m) != i) cand += ms(m)
          m += 1
        }
        p += 1
      }
      val best = cand
        .map(j => (sqDist(points(i), points(j)), j))
        .sortInPlace()
      var j = 0
      while (j < kCand) {
        // a probe set can come up short only on degenerate inputs
        // (kCand ≤ n-1 guards the global count); clamp defensively
        val (d, idx) = best(math.min(j, best.length - 1))
        candIdx(i)(j) = idx
        candDist(i)(j) = math.sqrt(d)
        j += 1
      }
      i += 1
    }
    (candIdx, candDist)
  }

  /** Test access to the approximate candidate machinery. */
  private[topic] def ivfCandidatesForTest(
      points: Array[Array[Float]],
      kCand: Int,
      seed: Long): (Array[Array[Int]], Array[Array[Double]]) =
    ivfCandidates(points, kCand, seed)

  @inline private def sqDist2(a: Array[Float], ct: Array[Float]): Double = {
    var s = 0.0
    var j = 0
    while (j < a.length) { val d = a(j).toDouble - ct(j); s += d * d; j += 1 }
    s
  }

  @inline private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var j = 0
    while (j < a.length) { val d = a(j).toDouble - b(j); s += d * d; j += 1 }
    s
  }

  @inline private def contains(arr: Array[Int], upto: Int, v: Int): Boolean = {
    var j = 0
    while (j < upto) { if (arr(j) == v) return true; j += 1 }
    false
  }

  /** Add one pair's gradient: d̃ = 1 + ‖yᵢ−yⱼ‖²; attractive pulls i
    * toward j with weight w·num/(den+d̃)², repulsive pushes apart. The
    * gradient lands on BOTH endpoints (the published implementation
    * updates i and j symmetrically). */
  @inline private def accumulate(
      y: Array[Array[Double]],
      grad: Array[Array[Double]],
      i: Int,
      jIdx: Int,
      yi: Array[Double],
      attractive: Boolean,
      num: Double,
      den: Double,
      w: Double): Unit = {
    val yj = y(jIdx)
    var dTilde = 1.0
    var c = 0
    while (c < yi.length) { val d = yi(c) - yj(c); dTilde += d * d; c += 1 }
    val r = den + dTilde
    val coef0 = w * num / (r * r)
    val coef = if (attractive) coef0 else -coef0
    c = 0
    while (c < yi.length) {
      val g = coef * (yi(c) - yj(c))
      grad(i)(c) += g
      grad(jIdx)(c) -= g
      c += 1
    }
  }
}
