package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The recall/latency dial. The TRUE invariant of probing more cells is
  * that the candidate set grows (cells probed at p−1 are a prefix of
  * cells probed at p), so per-query candidate counts are weakly
  * monotone in nProbe. Final codes-only ADC recall is typically but
  * NOT universally increasing — an added candidate whose quantized
  * distance beats a true neighbor's displaces it from the top-k (the
  * first q_knn_probe_recall fixture run demonstrated a real dip:
  * 0.2 → 0.1 on one query), which is exactly why the serving pipeline
  * re-ranks shortlists exactly (q_knn_pq_rerank). This spec pins the
  * superset/monotone-candidates invariant, not a recall myth. */
class ProbeSweepSpec extends SparkSpec {

  import spark.implicits._

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private def corpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map(i => (i, unit(Array.fill(dim)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
  }

  test("candidate count per query is weakly monotone in nProbe") {
    val df = corpus(300, 16, seed = 37L).cache()
    try {
      val cents = Similarity.trainedCentroids(df, nCells = 8, seed = 5L, sampleSize = 300)
      val cbs = IvfPq.trainedResidualCodebooks(df, cents, m = 4, k = 8, seed = 5L, sampleSize = 300)
      val queries = df.filter($"vec_id" < 4)
      // k = corpus size → the result IS the scored candidate set
      val counts = (1 to 4).map { p =>
        IvfPq.ivfPqTopK(queries, df, k = 300, nCells = 8, nProbe = p,
            m = 4, kCent = 8, seed = 5L, sampleSize = 300,
            coarseCentroids = cents, residCodebooks = cbs)
          .groupBy("query_id").agg(count(lit(1)).as("n"))
          .as[(Long, Long)].collect().toMap
      }
      for (q <- 0L until 4L; p <- 0 until 3) {
        val a = counts(p).getOrElse(q, 0L)
        val b = counts(p + 1).getOrElse(q, 0L)
        assert(b >= a, s"query $q: candidates shrank $a -> $b at nProbe ${p + 2}")
      }
      // and probing every cell reaches the whole corpus (minus self)
      val full = IvfPq.ivfPqTopK(queries, df, k = 300, nCells = 8, nProbe = 8,
          m = 4, kCent = 8, seed = 5L, sampleSize = 300,
          coarseCentroids = cents, residCodebooks = cbs)
        .groupBy("query_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(full.values.forall(_ == 299L), full.toString)
    } finally { df.unpersist(); () }
  }
}
