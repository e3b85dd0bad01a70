package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantSpec extends SparkSpec {

  import spark.implicits._

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private def clustered(n: Int, centers: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val cs = Array.fill(centers, dim)(rnd.nextGaussian().toFloat)
    (0L until n).map { i =>
      val c = cs((i % centers).toInt)
      val v = c.zip(Array.fill(dim)(rnd.nextGaussian().toFloat * 0.15f)).map { case (a, b) => a + b }
      (i, unit(v))
    }
  }

  test("codes: one per subspace, in [0, k), deterministic") {
    val df = clustered(200, 6, 32, seed = 3L).toDF("vec_id", "embedding")
    val cbs = ProductQuant.trainedCodebooks(df, m = 4, k = 8, seed = 5L)
    assert(cbs.length == 4 && cbs.forall(_.length == 8) && cbs.forall(_.forall(_.length == 8)))
    val codes = df
      .select($"vec_id", ProductQuant.encodeCol($"embedding", cbs).as("codes"))
      .as[(Long, Seq[Int])]
      .collect()
    assert(codes.length == 200)
    assert(codes.forall(_._2.length == 4))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 8)))
    val cbs2 = ProductQuant.trainedCodebooks(df, m = 4, k = 8, seed = 5L)
    assert(cbs.map(_.map(_.toSeq).toSeq).toSeq == cbs2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode argmin matches a reference scan (codes decode to nearest sub-centroid)") {
    val df = clustered(80, 4, 16, seed = 9L).toDF("vec_id", "embedding")
    val cbs = ProductQuant.trainedCodebooks(df, m = 4, k = 6, seed = 11L)
    val dsub = 4
    val rows = df
      .select($"vec_id", $"embedding", ProductQuant.encodeCol($"embedding", cbs).as("codes"))
      .as[(Long, Seq[Float], Seq[Int])]
      .collect()
    for ((_, vec, codes) <- rows; m <- 0 until 4) {
      val v = vec.toArray
      val dists = cbs(m).map(ct => ProductQuant.subDist2(v, m * dsub, ct))
      val best = dists.indexOf(dists.min) // first occurrence = lowest id on ties
      assert(codes(m) == best)
    }
  }

  test("adc top-k returns same-cluster neighbors (quantization preserves cluster geometry)") {
    // PQ is a coarse compressor: points of one tight cluster share nearly
    // identical codes, so ADC cannot rank WITHIN a cluster (production
    // stacks re-rank the ADC short-list with exact vectors — here the
    // pure-ADC output is what the oracle checks). The property ADC must
    // preserve is BETWEEN-cluster geometry: top-k neighbors come from the
    // query's own cluster, not a foreign one.
    val df = clustered(300, 6, 32, seed = 13L).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 10)
    val out = ProductQuant.pqTopK(queries, df, k = 5, m = 8, kCent = 16, seed = 13L)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.length == 50)
    val purity = out.count { case (q, n) => q % 6 == n % 6 }.toDouble / out.length
    assert(purity >= 0.9, s"cluster purity $purity — ADC mixed clusters")
  }

  test("adc distance equals the lut-sum of the encoded centroids") {
    val df = clustered(60, 3, 16, seed = 21L).toDF("vec_id", "embedding")
    val cbs = ProductQuant.trainedCodebooks(df, m = 4, k = 4, seed = 23L)
    val out = ProductQuant.pqTopK(df.filter($"vec_id" < 2), df, k = 3, m = 4, kCent = 4, seed = 23L)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val vecs = df.as[(Long, Seq[Float])].collect().toMap
    val dsub = 4
    for ((q, n, _, adist) <- out) {
      val qv = vecs(q).toArray
      val nv = vecs(n).toArray
      val codes = (0 until 4).map { m =>
        val d = cbs(m).map(ct => ProductQuant.subDist2(nv, m * dsub, ct))
        d.indexOf(d.min)
      }
      val expect = (0 until 4).foldLeft(0.0) { (acc, m) =>
        acc + ProductQuant.subDist2(qv, m * dsub, cbs(m)(codes(m)))
      }
      val rounded = BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(adist - rounded) < 1e-9)
    }
  }

  test("ivfadc: residual codes match a reference scan and neighbors stay in-cluster") {
    val df = clustered(240, 6, 32, seed = 41L).toDF("vec_id", "embedding")
    val cents = Similarity.trainedCentroids(df, nCells = 6, seed = 43L)
    val cbs = IvfPq.trainedResidualCodebooks(df, cents, m = 4, k = 8, seed = 43L)
    val dsub = 8
    // reference residual encode for a handful of rows
    val rows = df.limit(20).as[(Long, Seq[Float])].collect()
    val enc = df.select($"vec_id",
        org.apache.spark.sql.graft.Bridge.column(
          PqEncodeResidExpr(
            org.apache.spark.sql.graft.Bridge.expression($"embedding"), cents, cbs)).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    for ((id, vec) <- rows) {
      val v = vec.toArray
      val cell = cents(Similarity.nearestCell(v, cents))
      for (m <- 0 until 4) {
        val d = cbs(m).map(cb => PqLutExpr.residSubDist2(v, cell, m * dsub, cb))
        assert(enc(id)(m) == d.indexOf(d.min))
      }
    }
    // between-cluster geometry: probed-cell ADC keeps neighbors in-cluster
    val out = IvfPq.ivfPqTopK(df.filter($"vec_id" < 10), df,
        k = 5, nCells = 6, nProbe = 2, m = 4, kCent = 8, seed = 43L)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    val purity = out.count { case (q, n) => q % 6 == n % 6 }.toDouble / out.length
    assert(purity >= 0.9, s"cluster purity $purity")
    // determinism
    val out2 = IvfPq.ivfPqTopK(df.filter($"vec_id" < 10), df,
        k = 5, nCells = 6, nProbe = 2, m = 4, kCent = 8, seed = 43L)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.toSeq == out2.toSeq)
  }

  test("adc shortlist + exact re-rank restores the recall pure ADC cannot reach") {
    // same clustered data on which raw ADC@5 measured 0.2 recall (codes
    // collapse within a tight cluster): the exact-cosine re-rank over a
    // 4k shortlist recovers the true neighbors — the production serving
    // contract, and the reason pqTopKRerank exists
    val df = clustered(300, 6, 32, seed = 13L).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val reranked = ProductQuant.pqTopKRerank(queries, df,
        k = 5, shortlistK = 20, m = 8, kCent = 16, seed = 13L)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & reranked).size.toDouble / exact.size
    assert(recall >= 0.7, s"re-ranked recall $recall")
  }

  test("self is excluded and ranks are dense from 1") {
    val df = clustered(100, 4, 16, seed = 31L).toDF("vec_id", "embedding")
    val out = ProductQuant.pqTopK(df.filter($"vec_id" < 3), df, k = 5, m = 4, kCent = 8, seed = 31L)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.forall { case (q, n, _, _) => q != n })
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 3)
    byQ.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.length == 5)
    }
  }
}
