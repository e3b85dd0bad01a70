package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The distributed-training parity contract: the partial-sum Lloyd path
  * (used above [[Similarity.DistributedTrainFrom]] cells — the
  * `nCells ∝ corpus` knob rule pushed past k≈thousands) must produce
  * BITWISE the same Float centroids/codebooks as driver Lloyd on the
  * same corpus, seed and sample spec. Inputs are fixed fixtures, so
  * these pins are deterministic, not statistical. */
class DistributedKmeansSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
  }

  private def eq2(a: Array[Array[Float]], b: Array[Array[Float]]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => java.util.Arrays.equals(x, y) }

  test("positionedSample reproduces the driver path's hash-ordered sample exactly") {
    val df = corpus(500, 8, seed = 3L).cache()
    try {
      for (sampleSize <- Seq(120, 1000)) { // below n (cutoff regime) and above n (take-all)
        val driver = df
          .orderBy(xxhash64(lit(42L), col("vec_id")))
          .limit(sampleSize)
          .select(col("embedding")).as[Seq[Float]].collect().map(_.toArray)
        val (rdd, n) = Similarity.positionedSample(df, "vec_id", "embedding", 42L, sampleSize)
        try {
          assert(n == driver.length.toLong)
          val dist = rdd.collect().sortBy(_._1)
          assert(dist.map(_._1).toSeq == (0L until n).toSeq, "positions must be 0..n-1")
          assert(eq2(dist.map(_._2), driver), "sample content+order must match the driver path")
        } finally { rdd.unpersist(blocking = true); () }
      }
    } finally { df.unpersist(); () }
  }

  test("the hash-cutoff pre-filter regime still yields the exact driver sample") {
    // total > 4 × sampleSize forces the cutoff pre-filter path
    val df = corpus(5000, 8, seed = 7L).cache()
    try {
      val driver = df
        .orderBy(xxhash64(lit(11L), col("vec_id")))
        .limit(100)
        .select(col("embedding")).as[Seq[Float]].collect().map(_.toArray)
      val (rdd, n) = Similarity.positionedSample(df, "vec_id", "embedding", 11L, 100)
      try {
        assert(n == 100L)
        assert(eq2(rdd.collect().sortBy(_._1).map(_._2), driver))
      } finally { rdd.unpersist(blocking = true); () }
    } finally { df.unpersist(); () }
  }

  test("distributed Lloyd equals driver Lloyd bitwise across k, incl. empty cells") {
    val df = corpus(400, 16, seed = 5L).cache()
    try {
      val driverSample = df
        .orderBy(xxhash64(lit(42L), col("vec_id")))
        .limit(300)
        .select(col("embedding")).as[Seq[Float]].collect().map(_.toArray)
      val (rdd, n) = Similarity.positionedSample(df, "vec_id", "embedding", 42L, 300)
      try {
        // k = 290 near n forces empty cells in later iterations; k = 4/16/37
        // cover tiny through odd non-power sizes
        for (k <- Seq(4, 16, 37, 290)) {
          val driver = Similarity.trainCentroids(driverSample, k, 42L)
          val dist = Similarity.trainCentroidsDistributed(rdd, n, k, 42L)
          assert(eq2(driver, dist), s"centroids diverge at k=$k")
        }
      } finally { rdd.unpersist(blocking = true); () }
    } finally { df.unpersist(); () }
  }

  test("public trainedCentroids dispatches to the distributed path above the threshold") {
    val df = corpus(600, 8, seed = 9L).cache()
    try {
      // force the distributed path at a small k by lowering the threshold;
      // result must equal the default (driver) path bit-for-bit
      val driver = Similarity.trainedCentroids(df, "vec_id", "embedding",
        nCells = 8, seed = 42L, sampleSize = 400)
      val dist = Similarity.trainedCentroids(df, "vec_id", "embedding",
        nCells = 8, seed = 42L, sampleSize = 400, distributedFrom = 1)
      assert(eq2(driver, dist))
    } finally { df.unpersist(); () }
  }

  test("distributed codebook training equals the per-subspace driver path bitwise") {
    val df = corpus(500, 16, seed = 13L).cache()
    try {
      val driver = ProductQuant.trainedCodebooks(df, "vec_id", "embedding",
        m = 4, k = 8, seed = 7L, sampleSize = 300)
      val dist = ProductQuant.trainedCodebooks(df, "vec_id", "embedding",
        m = 4, k = 8, seed = 7L, sampleSize = 300, distributedFrom = 1)
      assert(driver.length == dist.length)
      driver.indices.foreach { i =>
        assert(eq2(driver(i), dist(i)), s"codebook $i diverges")
      }
    } finally { df.unpersist(); () }
  }

  test("semDedup survivors are identical under forced distributed training") {
    val df = corpus(300, 16, seed = 17L).cache()
    try {
      val base = Similarity.semDedup(df, "vec_id", "embedding",
        threshold = 0.2, nCells = 8, seed = 42L, sampleSize = 300)
        .select("vec_id").as[Long].collect().sorted.toSeq
      val dist = Similarity.semDedup(df, "vec_id", "embedding",
        threshold = 0.2, nCells = 8, seed = 42L, sampleSize = 300, distributedFrom = 1)
        .select("vec_id").as[Long].collect().sorted.toSeq
      assert(base.nonEmpty && base == dist)
    } finally { df.unpersist(); () }
  }
}
