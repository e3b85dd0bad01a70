package graft.embed

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorQuantSpec extends SparkSpec {
  import spark.implicits._

  test("codes are exact on representable grids; zero vectors stay zero") {
    val docs = Seq(
      (0L, Seq(1.27f, -1.27f, 0.635f, 0.0f)), // scale = 0.01
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = VectorQuant.quantizeInt8(docs, "embedding", "vec_id")
      .orderBy("vec_id").collect()
    assert(out(0).getSeq[Int](2) == Seq(127, -127, 64, 0)) // 0.635/0.01 = 63.5 -> away from zero
    assert(out(1).getDouble(1) == 0.0 && out(1).getSeq[Int](2).forall(_ == 0))
  }

  test("native quantize expression equals the HOF Column program bitwise") {
    // the replaced formulation, kept here as the reference implementation
    def hofQuantize(df: org.apache.spark.sql.DataFrame) = {
      val xs = transform(col("embedding"), x => x.cast("double"))
      val maxAbs = array_max(transform(xs, x => abs(x)))
      val scale = maxAbs / lit(127.0)
      df.select(
        col("vec_id"),
        scale.as("scale"),
        when(maxAbs > 0.0,
          transform(xs, x =>
            greatest(lit(-127), least(lit(127), round(x / scale).cast("int")))))
          .otherwise(transform(xs, _ => lit(0)))
          .as("qvec"))
    }
    val rnd = new scala.util.Random(13)
    val docs = ((0L until 300L).map(i => (i, Seq.fill(64)(rnd.nextGaussian().toFloat))) ++ Seq(
      (900L, Seq.empty[Float]), //            scale null, empty codes
      (901L, Seq(0.0f, 0.0f)), //             zero vector
      (902L, null))).toDF("vec_id", "embedding")
    val a = VectorQuant.quantizeInt8(docs, "embedding", "vec_id").orderBy("vec_id").collect()
    val b = hofQuantize(docs).orderBy("vec_id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"native $x != hof $y") }
  }

  test("dequantized cosine stays within int8 tolerance of the exact one") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val q = VectorQuant.dequantize(VectorQuant.quantizeInt8(emb, "embedding", "vec_id"))
    val joined = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("x"))
      .join(q.select(col("vec_id"), col("xhat")), "vec_id")
    def dot(a: String, b: String) =
      aggregate(zip_with(col(a), col(b), (p, r) => p * r), lit(0.0), (acc, v) => acc + v)
    val errs = joined.select(
        (dot("x", "xhat") /
          (sqrt(dot("x", "x")) * sqrt(dot("xhat", "xhat")))).as("cos"))
      .collect().map(_.getDouble(0))
    // int8 symmetric quantization keeps cosine with the original > 0.999
    assert(errs.forall(_ > 0.999), errs.min)
  }

  test("int8 similarities track the exact cosine within quantization error") {
    // this corpus is structureless (neighbors ~equidistant), so RANK
    // agreement at the top-k cut line is not a meaningful contract —
    // similarity VALUE accuracy is
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    val exact = graft.similarity.Similarity.bruteForceTopK(qs, emb, k = 1000)
      .select("query_id", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val quant = graft.similarity.Similarity.int8TopK(qs, emb, k = 10)
      .select("query_id", "neighbor_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(quant.nonEmpty)
    quant.foreach { case (pair, s) =>
      assert(math.abs(s - exact(pair)) < 0.02, s"$pair: int8 $s vs exact ${exact(pair)}")
    }
  }

  test("keep columns ride the quantize scan unchanged") {
    val docs = Seq(
      (0L, Seq(1.27f, 0.0f), "a"),
      (1L, Seq(0.0f, 2.54f), "b")).toDF("vec_id", "embedding", "tag")
    val out = VectorQuant
      .quantizeInt8(docs, "embedding", "vec_id", keep = Seq(col("tag")))
      .orderBy("vec_id").collect()
    assert(out.map(_.getString(3)).toSeq === Seq("a", "b"))
    assert(out(0).getSeq[Int](2) === Seq(127, 0))
  }

  test("ivfInt8TopK with all cells probed equals int8TopK exactly") {
    // probing every cell makes routing lossless: the composed stack must
    // then reproduce the flat int8 ranking bit-for-bit
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    val flat = graft.similarity.Similarity.int8TopK(qs, emb, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ivf = graft.similarity.Similarity
      .ivfInt8TopK(qs, emb, k = 10, nCells = 4, nProbe = 4, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(ivf.sorted.toSeq === flat.sorted.toSeq)
  }

  test("ivfInt8TopK is deterministic and returns k rows per query under partial probing") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 3)
    def run() = graft.similarity.Similarity
      .ivfInt8TopK(qs, emb, k = 5, nCells = 8, nProbe = 3, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val a = run()
    assert(a.toSeq === run().toSeq)
    assert(a.groupBy(_._1).forall(_._2.length == 5))
  }

  test("int8 top-k recall is perfect when the corpus HAS neighborhood structure") {
    import spark.implicits._
    // 3 well-separated clusters of 8 members each: separation >> int8 error
    val dim = 16
    val vecs = for (c <- 0 until 3; m <- 0 until 8) yield {
      val v = Array.fill(dim)(0.05f)
      v(c * 5) = 1.0f
      v((c * 5 + 1) % dim) += m * 0.01f // small within-cluster spread
      ((c * 8 + m).toLong, v.toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") % 8 === 0) // one query per cluster
    val quant = graft.similarity.Similarity.int8TopK(qs, emb, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every retrieved neighbor is from the query's own cluster
    assert(quant.nonEmpty && quant.forall { case (q, n) => n / 8 == q / 8 })
  }
}
