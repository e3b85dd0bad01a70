package graft.embed

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pooling math ported from the reference's unit tests
  * (`src/topic_modeling/embedding.rs:445-499`). */
class PoolingSpec extends AnyFunSuite {

  test("mean_pool_normalize matches hand computation") {
    // batch=1, seq=2, dim=2; second token masked out → pooled vector equals
    // the first token's (3,4), then L2-normalized to (0.6, 0.8).
    val hidden = Array(3.0f, 4.0f, 100.0f, 100.0f)
    val mask = Array(1L, 0L)
    val out = Pooling.meanPoolNormalize(hidden, 1, 2, 2, mask)
    assert(math.abs(out.head(0) - 0.6f) < 1e-5)
    assert(math.abs(out.head(1) - 0.8f) < 1e-5)
  }

  test("2d output path normalizes rows") {
    val out = Pooling.normalizeRows(Array(3.0f, 4.0f), 1, 2)
    assert(math.abs(out.head(0) - 0.6f) < 1e-5)
    assert(math.abs(out.head(1) - 0.8f) < 1e-5)
  }

  test("all-masked row pools to the zero vector (norm guard)") {
    val out = Pooling.meanPoolNormalize(Array(3.0f, 4.0f), 1, 1, 2, Array(0L))
    assert(out.head.toSeq == Seq(0.0f, 0.0f))
  }

  test("shape mismatches are rejected") {
    intercept[IllegalArgumentException] {
      Pooling.meanPoolNormalize(Array(1.0f), 1, 2, 2, Array(1L, 1L))
    }
    intercept[IllegalArgumentException] {
      Pooling.meanPoolNormalize(Array(1.0f, 2.0f, 3.0f, 4.0f), 1, 2, 2, Array(1L))
    }
  }
}

class EmbedderSpec extends SparkSpec {

  import spark.implicits._

  test("hash-projection model: deterministic, unit-norm, dim-sized") {
    val m = HashProjectionModel(64)
    val Seq(a, b) = m.encodeBatch(Seq("spark joins tables", "spark joins tables"))
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("batch-size invariance: same vectors regardless of batching") {
    val m = HashProjectionModel(32)
    val texts = Seq("one two three", "four five", "six", "seven eight nine ten")
    val oneByOne = texts.map(t => m.encodeBatch(Seq(t)).head.toSeq)
    val batched = m.encodeBatch(texts).map(_.toSeq)
    assert(oneByOne == batched)
  }

  test("null → empty vector; empty text → zero vector") {
    val m = HashProjectionModel(16)
    val out = m.encodeBatch(Seq(null, "", "word"))
    assert(out(0).isEmpty)
    assert(out(1).toSeq == Seq.fill(16)(0.0f))
    assert(out(2).length == 16)
  }

  test("registry: get-or-load singleton, prefetch, inventory") {
    EmbedderRegistry.prefetch()
    assert(EmbedderRegistry.loadedEmbedders.contains(EmbedderRegistry.DefaultModelId))
    assert(EmbedderRegistry.ensure() eq EmbedderRegistry.ensure())
    intercept[UnsupportedOperationException] { EmbedderRegistry.ensure("onnx:all-MiniLM-L6-v2") }
  }

  test("mapPartitions engine appends embeddings; matches the Column API") {
    val df = Seq((1L, "spark joins tables"), (2L, null.asInstanceOf[String]), (3L, "fast scans"))
      .toDF("id", "text")
    val viaEngine = Embedders.embed(df, "text", "emb")
      .select($"id", $"emb").as[(Long, Seq[Float])].collect().toMap
    val viaColumn = df.select($"id", Embedders.embedding($"text").as("emb"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(viaEngine == viaColumn)
    assert(viaEngine(2L).isEmpty)
    assert(viaEngine(1L).length == 64)
  }

  test("embeddingList regroups nested input") {
    val df = Seq((1L, Seq("a b", "c d"))).toDF("id", "texts")
    val out = df.select(Embedders.embeddingList($"texts").as("e"))
      .as[Seq[Seq[Float]]].head()
    assert(out.length == 2 && out.forall(_.length == 64))
    val single = HashProjectionModel(64).encodeBatch(Seq("a b")).head.toSeq
    assert(out.head == single)
  }
}
