package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines (builder mandate).
  *
  * Media travel as opaque `binary` columns with a typed metadata struct —
  * Spark's Tungsten format handles binary efficiently and parquet stores it
  * page-compressed. Decode / feature-extraction run '''batched inside
  * `mapPartitions`''' (the Scala analog of `mapInPandas`): elementwise, no
  * shuffle, decoder state amortized per batch, partitioning preserved.
  *
  * Decode is REAL for images ([[ImageIoDecoder]], javax.imageio), audio
  * ([[WavAudioDecoder]], javax.sound.sampled) and ONE video container —
  * multi-frame GIF ([[GifVideoDecoder]], the javax.imageio GIF sequence
  * reader) — all pure-JDK, no new dependency. Only CODEC video (H.264
  * etc.) remains a clearly-marked '''STUB''' (no such decoder exists in
  * any JVM), implemented as a deterministic fake derived from the
  * bytes, so the Spark-side contract (schemas, batching, null handling,
  * partition preservation) is real and tested while the codec is
  * swappable: implement [[MediaDecoder]] with a real library and
  * nothing else changes. */
trait MediaDecoder extends Serializable {
  def decode(bytes: Array[Byte], mime: String): MediaMeta
  /** Fixed-dimension feature vector (e.g. a CLIP-style embedding). */
  def features(bytes: Array[Byte], mime: String, dim: Int): Array[Float]
  /** Sample up to `maxFrames` frames (video/audio segmentation). */
  def sampleFrames(bytes: Array[Byte], mime: String, maxFrames: Int): Seq[Array[Byte]]
  /** Re-encode the payload at `width`×`height`. */
  def resize(bytes: Array[Byte], mime: String, width: Int, height: Int): Array[Byte]
}

final case class MediaMeta(
    mime: String,
    width: Int,
    height: Int,
    nFrames: Int,
    durationMs: Long)

/** STUB decoder: all values derived deterministically from a 64-bit hash of
  * the payload — a stand-in for codec output that keeps every pipeline
  * property (determinism, schema, batch shape) testable offline. */
object FakeDecoder extends MediaDecoder {

  private def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  override def decode(bytes: Array[Byte], mime: String): MediaMeta = {
    // STUB: a real implementation reads the container header here.
    val h = hash(bytes)
    MediaMeta(
      mime = mime,
      width = 64 + math.floorMod(h, 1920).toInt,
      height = 64 + math.floorMod(h >>> 16, 1080).toInt,
      nFrames = 1 + math.floorMod(h >>> 32, 32).toInt,
      durationMs = math.floorMod(h >>> 24, 60000L))
  }

  override def features(bytes: Array[Byte], mime: String, dim: Int): Array[Float] = {
    // STUB: a real implementation runs a vision/audio encoder here.
    val h = hash(bytes)
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      var x = h ^ (d * 0x9e3779b97f4a7c15L)
      x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
      x ^= (x >>> 27)
      out(d) = ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      d += 1
    }
    out
  }

  override def resize(bytes: Array[Byte], mime: String, width: Int, height: Int): Array[Byte] = {
    // STUB: a real implementation decodes, scales, re-encodes. The fake
    // keeps a deterministic prefix whose length scales with the pixel
    // ratio — enough to pin the payload-size and plumbing contracts.
    if (bytes.isEmpty) return bytes
    val meta = decode(bytes, mime)
    val ratio = (width.toLong * height).toDouble / (meta.width.toLong * meta.height)
    val newLen = math.max(1L, math.min(bytes.length.toLong, (bytes.length * ratio).toLong)).toInt
    java.util.Arrays.copyOfRange(bytes, 0, newLen)
  }

  override def sampleFrames(bytes: Array[Byte], mime: String, maxFrames: Int): Seq[Array[Byte]] = {
    // STUB: a real implementation seeks keyframes; the fake slices evenly.
    if (bytes.isEmpty || maxFrames <= 0) return Seq.empty
    val n = math.min(maxFrames, math.max(1, bytes.length / 8))
    (0 until n).map { i =>
      val from = i * bytes.length / n
      val until = (i + 1) * bytes.length / n
      java.util.Arrays.copyOfRange(bytes, from, until)
    }
  }
}

object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)))

  private def mapBatched(
      df: DataFrame,
      appended: StructField,
      batchSize: Int)(
      f: (Seq[Row], Int) => Seq[Any]): DataFrame = {
    val schema = StructType(df.schema.fields :+ appended)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val values = f(batch, batch.length)
        batch.zip(values).map { case (r, v) => Row.fromSeq(r.toSeq :+ v) }
      }
    }(Encoders.row(schema))
  }

  /** Append a typed metadata struct decoded from the binary column.
    * Null payloads → null meta. */
  def extractMetadata(
      df: DataFrame,
      binCol: String,
      mimeCol: String,
      outCol: String = "media_meta",
      decoder: MediaDecoder = FakeDecoder,
      batchSize: Int = 32): DataFrame = {
    val binIdx = df.schema.fieldIndex(binCol)
    val mimeIdx = df.schema.fieldIndex(mimeCol)
    mapBatched(df, StructField(outCol, MetaSchema), batchSize) { (batch, _) =>
      batch.map { r =>
        if (r.isNullAt(binIdx)) null
        else {
          val m = decoder.decode(r.getAs[Array[Byte]](binIdx), r.getString(mimeIdx))
          Row(m.mime, m.width, m.height, m.nFrames, m.durationMs)
        }
      }
    }
  }

  /** Append a fixed-dimension feature vector per media payload.
    * Null payloads → empty vector. */
  def mediaFeatures(
      df: DataFrame,
      binCol: String,
      mimeCol: String,
      dim: Int = 64,
      outCol: String = "media_features",
      decoder: MediaDecoder = FakeDecoder,
      batchSize: Int = 32): DataFrame = {
    val binIdx = df.schema.fieldIndex(binCol)
    val mimeIdx = df.schema.fieldIndex(mimeCol)
    mapBatched(df, StructField(outCol, ArrayType(FloatType)), batchSize) { (batch, _) =>
      batch.map { r =>
        if (r.isNullAt(binIdx)) Seq.empty[Float]
        else decoder.features(r.getAs[Array[Byte]](binIdx), r.getString(mimeIdx), dim).toSeq
      }
    }
  }

  /** Replace the binary column with a payload re-encoded at
    * `width`×`height` (batched, partition-preserving). Null payloads stay
    * null. */
  def resizeMedia(
      df: DataFrame,
      binCol: String,
      mimeCol: String,
      width: Int,
      height: Int,
      outCol: String = "resized",
      decoder: MediaDecoder = FakeDecoder,
      batchSize: Int = 32): DataFrame = {
    val binIdx = df.schema.fieldIndex(binCol)
    val mimeIdx = df.schema.fieldIndex(mimeCol)
    mapBatched(df, StructField(outCol, BinaryType), batchSize) { (batch, _) =>
      batch.map { r =>
        if (r.isNullAt(binIdx)) null
        else decoder.resize(r.getAs[Array[Byte]](binIdx), r.getString(mimeIdx), width, height)
      }
    }
  }

  /** Explode sampled frames: one output row per frame with `frame_idx` and
    * the frame payload. Rows with null payloads are dropped (no frames). */
  def sampleFrames(
      df: DataFrame,
      binCol: String,
      mimeCol: String,
      maxFrames: Int = 8,
      decoder: MediaDecoder = FakeDecoder,
      batchSize: Int = 32): DataFrame = {
    val withFrames = {
      val binIdx = df.schema.fieldIndex(binCol)
      val mimeIdx = df.schema.fieldIndex(mimeCol)
      mapBatched(df, StructField("frames", ArrayType(BinaryType)), batchSize) { (batch, _) =>
        batch.map { r =>
          if (r.isNullAt(binIdx)) Seq.empty[Array[Byte]]
          else decoder.sampleFrames(r.getAs[Array[Byte]](binIdx), r.getString(mimeIdx), maxFrames)
        }
      }
    }
    withFrames
      .select(col("*"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .drop("frames", binCol)
  }
}
