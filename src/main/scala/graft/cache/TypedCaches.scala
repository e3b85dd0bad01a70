package graft.cache

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two concrete cache tables as typed views over
  * [[TextCache]]:
  *
  *   - token cache keyed `(model, params_hash, content_hash)` where
  *     `params_hash` digests the tokenize flags
  *     (`/root/reference/src/expressions.rs:235-299`: params JSON →
  *     SHA-256),
  *   - embedding cache keyed `(model, revision, provider, content_hash)`
  *     (`/root/reference/src/topic_modeling/embedding_cache.rs:20-160`).
  *
  * Correctness contract for both: cached == uncached. */
object TypedCaches {

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** The reference hashes the kwargs JSON; field order fixed. */
  def tokenizeParamsHash(lowercase: Boolean, removePunct: Boolean): String =
    sha256Hex(s"""{"lowercase":$lowercase,"remove_punct":$removePunct}""")

  /** Tokenize with a content-addressed cache: identical output to
    * `Tokenize.tokenize`, but each distinct text is tokenized once per
    * `(model, params)` for the lifetime of the cache directory. */
  def cachedTokenize(
      spark: SparkSession,
      cachePath: String,
      df: DataFrame,
      textCol: String,
      model: String = graft.text.TokenizerModels.PlainWordsEn,
      lowercase: Boolean = true,
      removePunct: Boolean = true,
      outCol: String = "tokens"): DataFrame = {
    val key = s"token|$model|${tokenizeParamsHash(lowercase, removePunct)}"
    new TextCache(spark, cachePath).withCachedColumn(df, textCol, key, outCol) { misses =>
      misses.select(
        col("content_hash"),
        graft.text.Tokenize.tokenize(col(textCol), model, lowercase, removePunct).as(outCol))
    }
  }

  /** Embed with a content-addressed cache (model id stands in for the
    * reference's `(model, revision, provider)` triple — the pseudo model
    * has no revision; an ONNX backend would fold both into its id). */
  def cachedEmbed(
      spark: SparkSession,
      cachePath: String,
      df: DataFrame,
      textCol: String,
      modelId: String = graft.embed.EmbedderRegistry.DefaultModelId,
      outCol: String = "embedding"): DataFrame = {
    val key = s"embedding|$modelId"
    new TextCache(spark, cachePath).withCachedColumn(df, textCol, key, outCol) { misses =>
      graft.embed.Embedders.embed(misses, textCol, outCol, modelId)
        .select(col("content_hash"), col(outCol))
    }
  }
}
