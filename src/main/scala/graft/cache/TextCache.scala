package graft.cache

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-addressed text cache, re-expressed Spark-first (reference
  * `/root/reference/src/cache.rs:49-163`: SHA-256 content addressing,
  * unique-miss computation outside the lock, INSERT OR IGNORE, expansion
  * back to input order).
  *
  * The DuckDB table + file-lock design becomes a parquet table per cache
  * key + left-anti join — lock-free by construction (SURVEY §2.7):
  *
  *   1. hash every distinct input text (`sha2`, uniform keys, no skew),
  *   2. '''left-anti join''' against the cache table → unique misses only,
  *   3. run the expensive compute on misses, append results to the table,
  *   4. equi-join the union back to the input (the "expand to input order"
  *      step — order is carried by the input rows themselves).
  *
  * Each cache key gets its own subdirectory so value schemas stay
  * homogeneous (the reference likewise keeps separate token/embedding
  * tables, `src/expressions.rs:235-299`,
  * `src/topic_modeling/embedding_cache.rs:20-160`).
  *
  * The correctness contract is the reference's own: cached == uncached
  * (`tests/test_tokenize_cache.py:22-34`), pinned by `TextCacheSpec`.
  *
  * Concurrency: the reference serializes cross-process writers with an fs2
  * file lock; here appends are atomic at the parquet-file level and
  * duplicate rows from racing writers are harmless — reads deduplicate on
  * `content_hash`, mirroring INSERT OR IGNORE semantics. */
final class TextCache(spark: SparkSession, path: String) {

  private def keyDir(cacheKey: String): String = {
    val safe = cacheKey.map(c => if (c.isLetterOrDigit || c == '-' || c == '_') c else '_')
    s"$path/$safe"
  }

  private def cachedPairs(cacheKey: String, valueCol: String): Option[DataFrame] =
    try {
      Some(
        spark.read.parquet(keyDir(cacheKey))
          .dropDuplicates("content_hash") // racing writers: first wins
          .select(col("content_hash"), col("value").as(valueCol)))
    } catch {
      // Only the two "cache not created yet" shapes: a missing path, or a
      // directory with no readable footers (e.g. only _SUCCESS after an
      // empty-miss append). Corrupt files / transient IO errors propagate —
      // silently recomputing everything would mask real storage problems.
      case _: org.apache.spark.sql.AnalysisException => None
      case _: java.io.FileNotFoundException => None
    }

  /** Run `compute` over the rows of `df` whose hashed `textCol` is not yet
    * cached under `cacheKey`, persist the new `(hash, value)` pairs, and
    * return `df` with `valueCol` attached for every row.
    *
    * `compute` receives a DataFrame of distinct `(content_hash, textCol)`
    * misses and must return `(content_hash, valueCol)`. */
  def withCachedColumn(
      df: DataFrame,
      textCol: String,
      cacheKey: String,
      valueCol: String)(compute: DataFrame => DataFrame): DataFrame = {
    val hashed = df.withColumn("content_hash", sha2(coalesce(col(textCol), lit("")), 256))

    val distinctTexts =
      hashed.select(col("content_hash"), col(textCol)).dropDuplicates("content_hash")

    // ONE cache snapshot per call, shared by the miss anti-join and (on
    // the all-hit path) the final lookup. The warm path used to pay a
    // second directory listing + footer read for a lookup identical to
    // this snapshot — the r12 driver capture flagged exactly that
    // (q_embed_cached hit path, two reads of the same cache table).
    val snapshot = cachedPairs(cacheKey, valueCol)

    val misses = snapshot match {
      case Some(cached) => distinctTexts.join(cached.select("content_hash"), Seq("content_hash"), "left_anti")
      case None => distinctTexts
    }

    // The miss plan must evaluate exactly ONCE (it is the expensive work a
    // cache exists to amortize): persist, materialize fully with count()
    // (a take-1 `isEmpty` would cache only the first partition and re-run
    // the rest at write time), and serve the lookup from the persisted
    // blocks rather than re-reading what was just appended.
    val newRows = compute(misses).select(col("content_hash"), col(valueCol).as("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val missCount = newRows.count()
      if (missCount > 0) newRows.write.mode("append").parquet(keyDir(cacheKey))

      val lookup =
        if (missCount == 0 && snapshot.isDefined)
          // all-hit path: the snapshot already covers every input hash —
          // reuse it, no second read
          snapshot.get
        else
          // misses were appended: re-read so the lookup serves them from
          // the durable table (the persisted newRows are unpersisted in
          // the finally below, BEFORE the returned lazy plan executes, so
          // the lookup must not reference them — re-running the compute
          // at join time would break the evaluate-once contract)
          cachedPairs(cacheKey, valueCol).getOrElse(
            // df was empty and nothing was ever cached: empty lookup
            newRows.select(col("content_hash"), col("value").as(valueCol)).limit(0))
      hashed
        .join(lookup, Seq("content_hash"), "left")
        .drop("content_hash")
    } finally {
      newRows.unpersist()
    }
  }
}
