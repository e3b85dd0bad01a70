package graft.embed

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

import graft.text.PlainTokenizer

/** Sentence-embedding engine re-expressed for Spark executors (reference
  * `/root/reference/src/expressions.rs:565-752` and
  * `/root/reference/src/topic_modeling/embedding.rs:48-432`).
  *
  * The ONNX runtime is not available in this zero-egress build, so the
  * default model is a '''deterministic hash-projection pseudo-embedder'''
  * behind the same API (SURVEY §7.2 P5): each token hashes to a fixed
  * pseudo-Gaussian vector, token vectors form the `[batch, seq, dim]`
  * hidden state, and the reference's exact mean-pool + L2 math
  * (`embedding.rs:168-250`, ported below with its unit tests) produces the
  * sentence vector. A real ONNX model drops in by implementing
  * [[EmbeddingModel]] — the Spark-side plumbing (executor-singleton
  * registry, mapPartitions batch-32 engine, null → empty row) is identical.
  *
  * Scale: embedding is elementwise over partitions — no shuffle. Models
  * load once per executor JVM via the registry (never in task closures);
  * batching happens inside `mapPartitions` exactly like the reference's
  * batch-32 loop, so a heavyweight backend amortizes per-batch overhead.
  */
trait EmbeddingModel extends Serializable {
  def dim: Int
  /** Sequence cap, mirroring the reference's truncation at 512. */
  def maxSeqLen: Int = 512
  /** Token count with truncation disabled (chunking sizer). */
  def countTokens(text: String): Int
  /** Encode a batch; rows for null texts must be empty arrays. */
  def encodeBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic hash-projection model: token t's vector has components
  * drawn pseudo-randomly (splitmix64) from hash(t, component). Same text ⇒
  * same vector on every executor, no model files, no network. */
final case class HashProjectionModel(dim: Int = 64, seed: Long = 42L) extends EmbeddingModel {

  override def countTokens(text: String): Int =
    if (text == null) 0 else PlainTokenizer.tokenize(text).length

  private def component(tokenHash: Long, d: Int): Float = {
    var h = tokenHash ^ (d * 0x9e3779b97f4a7c15L) ^ seed
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^= (h >>> 31)
    val u1 = (h >>> 11).toDouble / (1L << 53).toDouble
    val u2 = ((h * 0x2545f4914f6cdd1dL) >>> 11).toDouble / (1L << 53).toDouble
    (u1 + u2 - 1.0).toFloat
  }

  private def tokenHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  override def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = {
    // Build the [batch, seq, dim] hidden state + attention mask exactly as
    // an encoder would (padding to the batch's longest, truncating at
    // maxSeqLen), then run the reference pooling math.
    val tokenized = texts.map { t =>
      if (t == null) null
      else PlainTokenizer.tokenize(t).take(maxSeqLen).map(tok => tokenHash(tok.token))
    }
    val seq = math.max(1, if (tokenized.forall(_ == null)) 1 else tokenized.filter(_ != null).map(_.length).maxOption.getOrElse(1))
    val batch = texts.length
    val hidden = new Array[Float](batch * seq * dim)
    val mask = new Array[Long](batch * seq)
    tokenized.zipWithIndex.foreach {
      case (null, _) => ()
      case (hashes, row) =>
        hashes.zipWithIndex.foreach { case (th, pos) =>
          mask(row * seq + pos) = 1L
          val off = (row * seq + pos) * dim
          var d = 0
          while (d < dim) { hidden(off + d) = component(th, d); d += 1 }
        }
    }
    val pooled = Pooling.meanPoolNormalize(hidden, batch, seq, dim, mask)
    // null rows → empty vectors (reference null contract); empty texts pool
    // to the zero vector (mask all-0, denom clamps) and stay zero.
    tokenized.zip(pooled).map { case (t, v) => if (t == null) Array.empty[Float] else v }
  }
}

/** The reference's pooling/normalization math, kept pure so tests match
  * hand computation (`embedding.rs:168-250`, tests `:445-499`). */
object Pooling {

  /** Mean-pool `[batch, seq, dim]` hidden states over a `[batch, seq]`
    * mask, then L2-normalize each row. */
  def meanPoolNormalize(
      hidden: Array[Float],
      batch: Int,
      seq: Int,
      dim: Int,
      mask: Array[Long]): Seq[Array[Float]] = {
    require(hidden.length == batch * seq * dim, s"hidden length ${hidden.length} != [$batch,$seq,$dim]")
    require(mask.length == batch * seq, s"mask length ${mask.length} != [$batch,$seq]")
    val rows = Array.fill(batch)(new Array[Float](dim))
    var row = 0
    while (row < batch) {
      var count = 0.0f
      var token = 0
      while (token < seq) {
        val m = mask(row * seq + token).toFloat
        if (m != 0.0f) {
          count += m
          val off = (row * seq + token) * dim
          var d = 0
          while (d < dim) { rows(row)(d) += hidden(off + d) * m; d += 1 }
        }
        token += 1
      }
      val denom = math.max(count, 1e-9f)
      var d = 0
      while (d < dim) { rows(row)(d) /= denom; d += 1 }
      row += 1
    }
    rows.foreach(normalizeInPlace)
    rows.toSeq
  }

  /** L2-normalize flat `[batch, dim]` rows (the `[batch, dim]` ONNX output
    * shape needs no pooling — reference `normalize_rows`). */
  def normalizeRows(data: Array[Float], batch: Int, dim: Int): Seq[Array[Float]] = {
    val rows = data.grouped(dim).take(batch).toSeq.map(_.clone())
    rows.foreach(normalizeInPlace)
    rows
  }

  private def normalizeInPlace(row: Array[Float]): scala.Unit = {
    var sum = 0.0f
    var i = 0
    while (i < row.length) { sum += row(i) * row(i); i += 1 }
    val norm = math.sqrt(sum.toDouble).toFloat
    if (norm > 0.0f) {
      i = 0
      while (i < row.length) { row(i) /= norm; i += 1 }
    }
  }
}

/** Executor-side embedder registry: get-or-load keyed by model id, mirroring
  * the reference's double-checked `RwLock<HashMap>` (`embedding.rs:252-282`)
  * with a `ConcurrentHashMap` per JVM. Models never travel in closures. */
object EmbedderRegistry {

  val DefaultModelId = "pseudo:hash-projection-64"

  private val registry = new ConcurrentHashMap[String, EmbeddingModel]()

  /** When set, names the model the local ONNX artifact actually is
    * (e.g. `all-MiniLM-L6-v2`). `onnx:<name>` then resolves ONLY for the
    * matching name — without this check every `onnx:*` id silently
    * served the single env-configured artifact under the wrong
    * registry key (and dim). Unset ⇒ any single `onnx:*` id loads, but
    * a SECOND distinct id fails fast rather than alias the first. */
  val OnnxModelIdEnv = "GRAFT_ONNX_MODEL_ID"

  private def onnxNameMatches(id: String): Boolean = {
    val requested = id.stripPrefix("onnx:")
    sys.env.get(OnnxModelIdEnv) match {
      case Some(configured) => requested == configured
      case None =>
        // no declared name: allow only if no OTHER onnx id is already loaded
        val loaded = registry.keys.asScala.filter(_.startsWith("onnx:")).toSeq
        loaded.isEmpty || loaded == Seq(id)
    }
  }

  /** Resolve a model id to a loader. The pseudo family always loads;
    * `onnx:*` loads through [[OnnxRuntimeGate]] when a LOCAL runtime +
    * model + vocab are configured (never the network) AND the requested
    * name matches the configured artifact, and otherwise fails fast
    * with the concrete missing preconditions. */
  private def load(id: String): EmbeddingModel = id match {
    case s if s.startsWith("pseudo:hash-projection-") =>
      val dim = s.stripPrefix("pseudo:hash-projection-").toInt
      HashProjectionModel(dim)
    case TransformerModel.FixtureModelId =>
      // the ungated real-forward-pass tier: MiniLM-shape encoder at
      // reduced width, deterministic random-init weights (see
      // [[TransformerModel]]) — loads with no env, no artifact
      TransformerModel.fixture()
    case BertWeightsGate.ModelId if BertWeightsGate.available =>
      // gated real-weights pure-JVM BERT: a local safetensors checkpoint
      // + vocab.txt, no extra runtime on the classpath (see [[BertModel]])
      BertModel.fromGate()
    case BertWeightsGate.ModelId =>
      throw new UnsupportedOperationException(
        s"embedder '${BertWeightsGate.ModelId}' needs local checkpoint files " +
          s"(${BertWeightsGate.unavailableReason})")
    case s if s.startsWith("onnx:") && OnnxRuntimeGate.available =>
      if (!onnxNameMatches(s))
        throw new IllegalArgumentException(
          s"embedder '$s' does not match the locally configured ONNX artifact " +
            s"(${sys.env.getOrElse(OnnxModelIdEnv, "unnamed; another onnx:* id is already loaded")}); " +
            s"set $OnnxModelIdEnv to the artifact's model name to serve it")
      OnnxEmbeddingModel.fromEnv()
    case other =>
      throw new UnsupportedOperationException(
        s"embedder '$other' requires an ONNX model, unavailable in this " +
          s"zero-egress build (${OnnxRuntimeGate.unavailableReason}); " +
          s"use $DefaultModelId, or configure a local runtime via " +
          s"${OnnxRuntimeGate.ModelPathEnv}/${OnnxRuntimeGate.VocabPathEnv}")
  }

  def ensure(id: String = DefaultModelId): EmbeddingModel =
    registry.computeIfAbsent(id, load(_))

  /** Register (or replace) an offline model under `id` — the non-native
    * registration path, mirroring `TokenizerModels.register` (the
    * reference registers arbitrary backends the same way,
    * `embedding.rs:252-282`). Registered entries win over [[load]]. */
  def register(id: String, model: EmbeddingModel): scala.Unit = { registry.put(id, model); () }

  /** Idempotent warm-load (API parity with `prefetch_embedder`). */
  def prefetch(id: String = DefaultModelId): scala.Unit = { ensure(id); () }

  /** Sorted loaded ids (API parity with `loaded_embedders`). */
  def loadedEmbedders: Seq[String] = registry.keys.asScala.toSeq.sorted
}

/** DataFrame-level embedding API. */
object Embedders {

  /** Append an `Array[Float]` embedding column via the batch-32
    * `mapPartitions` engine (the reference's batching,
    * `src/expressions.rs:570`). Null text → empty array. */
  def embed(
      df: DataFrame,
      textCol: String,
      outCol: String = "embedding",
      modelId: String = EmbedderRegistry.DefaultModelId,
      batchSize: Int = 32): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, ArrayType(FloatType), nullable = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val encoder = Encoders.row(schema)
    df.mapPartitions { rows =>
      val model = EmbedderRegistry.ensure(modelId) // per-executor singleton
      rows.grouped(batchSize).flatMap { chunk =>
        val texts = chunk.map(r => if (r.isNullAt(textIdx)) null else r.getString(textIdx))
        val vecs = model.encodeBatch(texts)
        chunk.zip(vecs).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(encoder)
  }

  /** Column API for `String → Array[Float]` (the reference's polymorphic
    * `embedding` expression on String input). Identical output to
    * [[embed]] — the pseudo-model is batch-size-invariant. */
  def embedding(c: Column, modelId: String = EmbedderRegistry.DefaultModelId): Column = {
    val f = udf { text: String =>
      EmbedderRegistry.ensure(modelId).encodeBatch(Seq(text)).head
    }
    f(c)
  }

  /** `Array[String] → Array[Array[Float]]` variant (reference
    * `src/expressions.rs:690-752`: flatten, embed, regroup). */
  def embeddingList(c: Column, modelId: String = EmbedderRegistry.DefaultModelId): Column = {
    val f = udf { texts: Seq[String] =>
      if (texts == null) Seq.empty[Seq[Float]]
      else EmbedderRegistry.ensure(modelId).encodeBatch(texts).map(_.toSeq)
    }
    f(c)
  }
}
