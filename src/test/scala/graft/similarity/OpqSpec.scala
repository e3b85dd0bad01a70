package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OPQ (Ge 2013): rotation orthogonality, ranking invariance,
  * determinism, and the headline property — on anisotropic data the
  * learned rotation recovers recall plain PQ loses to unbalanced
  * subspace variance. */
class OpqSpec extends SparkSpec {

  import spark.implicits._

  /** Anisotropic corpus: most variance concentrated in the first
    * subspace's dimensions — the case PQ handles worst and OPQ exists
    * for. */
  private def anisotropic(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map { i =>
      val v = Array.tabulate(dim) { d =>
        val scale = if (d < dim / 4) 10.0 else 0.3
        (rnd.nextGaussian() * scale).toFloat
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  private def exactTopK(df: org.apache.spark.sql.DataFrame, nq: Int, k: Int) =
    Similarity.bruteForceTopK(df.filter($"vec_id" < nq), df, k = k)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet

  private def recallOf(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
    approx.intersect(exact).size.toDouble / exact.size

  test("learned rotation is orthogonal and deterministic") {
    val df = anisotropic(300, 16, seed = 5L)
    val (r1, cbs1) = Opq.trainedRotation(df, m = 4, k = 8, seed = 3L, sampleSize = 300, iters = 4)
    val (r2, _) = Opq.trainedRotation(df, m = 4, k = 8, seed = 3L, sampleSize = 300, iters = 4)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq, "training must be deterministic")
    assert(cbs1.length == 4 && cbs1.forall(_.length == 8))
    // RᵀR ≈ I
    val dim = r1.length
    for (a <- 0 until dim; b <- 0 until dim) {
      val dot = (0 until dim).map(i => r1(i)(a) * r1(i)(b)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"RtR[$a][$b] = $dot")
    }
  }

  test("rotation preserves pairwise distances (ranking invariance)") {
    val df = anisotropic(50, 16, seed = 7L)
    val (r, _) = Opq.trainedRotation(df, m = 4, k = 8, seed = 3L, sampleSize = 50, iters = 3)
    val vecs = df.orderBy("vec_id").select("embedding").as[Seq[Float]].collect().map(_.toArray)
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    for (i <- 0 until 10; j <- (i + 1) until 10) {
      val orig = d2(vecs(i), vecs(j))
      val rot = d2(Opq.rotate(r, vecs(i)), Opq.rotate(r, vecs(j)))
      assert(math.abs(orig - rot) / (orig + 1e-12) < 1e-4, s"($i,$j): $orig vs $rot")
    }
  }

  test("on anisotropic data OPQ recall beats plain PQ at identical code size") {
    val df = anisotropic(600, 16, seed = 11L).cache()
    try {
      val nq = 8; val k = 10
      val exact = exactTopK(df, nq, k)
      val queries = df.filter($"vec_id" < nq)

      val plain = ProductQuant.pqTopK(queries, df, k = k, m = 4, kCent = 8,
          seed = 3L, sampleSize = 600)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

      val (r, cbs) = Opq.trainedRotation(df, m = 4, k = 8, seed = 3L, sampleSize = 600, iters = 8)
      val rotQ = queries.select($"vec_id", Opq.rotateCol($"embedding", r).as("embedding"))
      val rotCodes = df.select($"vec_id".as("neighbor_id"),
        ProductQuant.encodeCol(Opq.rotateCol($"embedding", r), cbs).as("codes"))
      val opq = ProductQuant.adcTopK(rotCodes, rotQ, cbs, k = k)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

      val rPlain = recallOf(plain, exact)
      val rOpq = recallOf(opq, exact)
      info(f"recall@$k: plain PQ $rPlain%.3f vs OPQ $rOpq%.3f")
      assert(rOpq > rPlain, f"OPQ ($rOpq%.3f) must beat plain PQ ($rPlain%.3f) here")
    } finally { df.unpersist(); () }
  }

  test("OPQ x IVFADC recall >= plain IVFADC at identical code size (anisotropic)") {
    // the composed production stack (q_knn_opq_ivf): rotation as
    // pre-transform, cells + residual codebooks trained in the rotated
    // space — vs the same IVFADC with no rotation
    val df = anisotropic(600, 16, seed = 13L).cache()
    try {
      val nq = 8; val k = 10; val nCells = 6; val nProbe = 3
      val exact = exactTopK(df, nq, k)
      val queries = df.filter($"vec_id" < nq)

      val plain = IvfPq.ivfPqTopK(queries, df, k = k, nCells = nCells, nProbe = nProbe,
          m = 4, kCent = 8, seed = 3L, sampleSize = 600)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

      val (r, _) = Opq.trainedRotation(df, m = 4, k = 8, seed = 3L, sampleSize = 600, iters = 8)
      val rotAll = df.select($"vec_id", Opq.rotateCol($"embedding", r).as("embedding"))
      val opqIvf = IvfPq.ivfPqTopK(rotAll.filter($"vec_id" < nq), rotAll,
          k = k, nCells = nCells, nProbe = nProbe,
          m = 4, kCent = 8, seed = 3L, sampleSize = 600)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

      val rPlain = recallOf(plain, exact)
      val rOpq = recallOf(opqIvf, exact)
      info(f"recall@$k: plain IVFADC $rPlain%.3f vs OPQ+IVFADC $rOpq%.3f")
      assert(rOpq >= rPlain,
        f"OPQ+IVFADC ($rOpq%.3f) must not lose to plain IVFADC ($rPlain%.3f) here")
    } finally { df.unpersist(); () }
  }
}
