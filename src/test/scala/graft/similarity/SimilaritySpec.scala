package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  /** Seeded clustered vectors: `n` points around `centers` cluster centers
    * in `dim` dimensions. */
  private def clustered(n: Int, centers: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val cs = Array.fill(centers, dim)(rnd.nextGaussian().toFloat)
    (0L until n).map { i =>
      val c = cs((i % centers).toInt)
      val v = c.zip(Array.fill(dim)(rnd.nextGaussian().toFloat * 0.15f)).map { case (a, b) => a + b }
      (i, unit(v))
    }
  }

  test("brute-force top-k: exact cosine, ranked, self excluded") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity
      .bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 2)
      .orderBy("rank")
      .as[(Long, Long, Long, Double)]
      .collect()
    assert(out.map(_._2).toSeq == Seq(1L, 2L)) // nearest then orthogonal
    assert(out(0)._4 > 0.99 && math.abs(out(1)._4) < 1e-9)
  }

  test("lsh finds the planted near-duplicate neighbor") {
    val data = clustered(200, 8, 32, seed = 7L)
    // plant: vector 200 = tiny perturbation of vector 0
    val planted = (200L, unit(data.head._2.map(x => x + 0.01f)))
    val df = (data :+ planted).toDF("vec_id", "embedding")
    val out = Similarity
      .lshTopK(df.filter($"vec_id" === 200), df, k = 5, tables = 12, bits = 8)
      .as[(Long, Long, Long, Double)]
      .collect()
    assert(out.nonEmpty)
    assert(out.head._2 == 0L, s"expected planted neighbor 0 first, got ${out.toSeq}")
  }

  test("lsh recall vs brute force is high on clustered data") {
    val df = clustered(300, 6, 32, seed = 11L).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, df, k = 5, tables = 12, bits = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("ivf recall vs brute force is high on clustered data") {
    val df = clustered(300, 6, 32, seed = 13L).toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(queries, df, k = 5, nCells = 12, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("ivf is deterministic for a fixed seed") {
    val df = clustered(100, 4, 16, seed = 17L).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 3)
    val a = Similarity.ivfTopK(q, df, k = 3, nCells = 8).collect().toSeq
    val b = Similarity.ivfTopK(q, df, k = 3, nCells = 8).collect().toSeq
    assert(a == b)
  }

  test("local top-k prune is lossless, including boundary ties across partitions") {
    // duplicate embeddings force exact sim ties; many partitions force the
    // prune to run per-slice — the pruned result must equal the unpruned
    // window ranking exactly
    val rnd = new scala.util.Random(23)
    val base = Array.fill(8)(unit(Array.fill(8)(rnd.nextGaussian().toFloat)))
    val vecs = (0L until 120L).map(i => (i, base((i % 8).toInt))) // 15 copies of each
    val df = vecs.toDF("vec_id", "embedding").repartition(10)
    val queries = df.filter($"vec_id" < 4)

    val pruned = Similarity.bruteForceTopK(queries, df, k = 7)
      .as[(Long, Long, Long, Double)].collect().toSet

    // reference: same ranking without the mapPartitions prune
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select($"vec_id".as("query_id"), $"embedding".as("q_vec")))
    val scored = df.select($"vec_id".as("neighbor_id"), $"embedding".as("c_vec"))
      .crossJoin(q)
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn("sim", Similarity.cosine($"q_vec", $"c_vec"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id")
    val unpruned = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 7)
      .select($"query_id", $"neighbor_id", $"rank", $"sim")
      .as[(Long, Long, Long, Double)].collect().toSet

    assert(pruned == unpruned)
  }

  test("ivf sample is unbiased on a cluster-sorted corpus (quantizer sees all cells)") {
    // storage order == cluster order (the pathological case for a limit()
    // sample: the first partitions hold only one cluster); queries come
    // from the LAST cluster, which a prefix sample would never train on
    val rnd = new scala.util.Random(29)
    val cs = Array.fill(6, 16)(rnd.nextGaussian().toFloat)
    val vecs = (0L until 600L).map { i =>
      val c = cs((i / 100).toInt) // sequential blocks, not interleaved
      (i, unit(c.zip(Array.fill(16)(rnd.nextGaussian().toFloat * 0.15f)).map { case (a, b) => a + b }))
    }
    val df = vecs.toDF("vec_id", "embedding").repartitionByRange(6, $"vec_id")
    val queries = df.filter($"vec_id" >= 590)
    val exact = Similarity.bruteForceTopK(queries, df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity
      .ivfTopK(queries, df, k = 5, nCells = 12, nProbe = 3, sampleSize = 150)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall — quantizer sample missed the tail clusters")
  }

  test("semdedup: drops within-cell semantic dupes, keeps the least prototypical") {
    // two tight clusters of near-identical vectors + one isolated point:
    // each cluster collapses to ONE survivor; the isolated point survives
    val corpus = (clustered(12, 2, 8, seed = 9L) :+ ((99L, unit(Array.fill(8)(0.7f)))))
      .toDF("vec_id", "embedding")
    val survivors = Similarity
      .semDedup(corpus, "vec_id", "embedding", threshold = 0.9, nCells = 4, seed = 42L)
      .select("vec_id").as[Long].collect().sorted
    assert(survivors.contains(99L))
    assert(survivors.length < 13, s"nothing deduped: ${survivors.toSeq}")
    // deterministic
    val again = Similarity
      .semDedup(corpus, "vec_id", "embedding", threshold = 0.9, nCells = 4, seed = 42L)
      .select("vec_id").as[Long].collect().sorted
    assert(survivors.toSeq == again.toSeq)
    // raising the threshold above any pairwise sim keeps everyone
    val all = Similarity
      .semDedup(corpus, "vec_id", "embedding", threshold = 1.1, nCells = 4, seed = 42L)
      .count()
    assert(all == 13)
  }

  test("cosine handles empty and mismatched arrays as null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array.empty[Float], Array(1.0f)),
      (Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val sims = df.select(Similarity.cosine($"a", $"b").as("s")).as[Option[Double]].collect()
    assert(sims(0).exists(s => math.abs(s - 1.0) < 1e-12))
    assert(sims(1).isEmpty && sims(2).isEmpty)
  }
}
