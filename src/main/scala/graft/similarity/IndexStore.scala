package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persist-and-serve contract for the PQ ANN tier — the missing piece of
  * the 100 TB serving story: index BUILD and index QUERY are separate
  * jobs in production (build runs once over the corpus and writes
  * artifacts; serving jobs read them and never retrain). The layout is
  * two parquet tables under one index directory:
  *
  *   - `codebooks/`: `(m, k, centroid array<float>)` — the trained
  *     per-subspace codebooks, `PqM`×`PqCent` rows (tiny; serving
  *     collects them once and broadcasts ADC LUTs),
  *   - `codes/`: `(neighbor_id, codes array<int>)` — the corpus encoded
  *     at build time, the only corpus-sized artifact; at scale this is
  *     the ~32×-compressed scan the PQ paper exists for (Jégou 2011,
  *     `/root/reference` has no ANN tier — this is beyond-reference).
  *
  * Serving reuses the exact stages of the in-session path
  * ([[ProductQuant.adcTopK]] + [[ProductQuant.rerankShortlist]]), so
  * served results are bit-identical to q_knn_pq_rerank and sit under the
  * same exact DuckDB oracle. The served plan contains NO k-means and no
  * encode scan — only the codes read, the broadcast LUT join, and the
  * shortlist re-rank against the vector table. */
object IndexStore {

  /** Build the PQ index: train codebooks (unless pretrained ones are
    * passed), encode the corpus once, write both artifacts. */
  def writePqIndex(
      corpus: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 8,
      kCent: Int = 16,
      seed: Long = 42L,
      sampleSize: Int = 10000,
      codebooks: Array[Array[Array[Float]]] = null): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cbs =
      if (codebooks != null) codebooks
      else ProductQuant.trainedCodebooks(corpus, idCol, vecCol, m, kCent, seed, sampleSize)
    val cbRows = for {
      mi <- cbs.indices
      ki <- cbs(mi).indices
    } yield (mi, ki, cbs(mi)(ki).toSeq)
    cbRows.toDF("m", "k", "centroid")
      .repartition(1) // PqM*PqCent rows — one tiny file
      .write.mode("overwrite").parquet(s"$path/codebooks")
    corpus
      .select(col(idCol).as("neighbor_id"), ProductQuant.encodeCol(col(vecCol), cbs).as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Load the codebooks artifact back into the `[m][k][dsub]` layout the
    * encode/LUT expressions take. A bounded driver action by
    * construction (m×k rows). */
  def readCodebooks(spark: SparkSession, path: String): Array[Array[Array[Float]]] = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/codebooks")
      .select(col("m"), col("k"), col("centroid"))
      .as[(Int, Int, Seq[Float])]
      .collect()
    require(rows.nonEmpty, s"IndexStore: empty codebooks at $path")
    val mMax = rows.map(_._1).max + 1
    val kMax = rows.map(_._2).max + 1
    val out = Array.ofDim[Array[Float]](mMax, kMax)
    rows.foreach { case (mi, ki, c) => out(mi)(ki) = c.toArray }
    require(out.forall(_.forall(_ != null)), s"IndexStore: sparse codebook grid at $path")
    out
  }

  /** Incremental index maintenance: encode NEW vectors with the
    * persisted codebooks (read back, never retrained — retraining would
    * silently invalidate every previously stored code) and append their
    * codes. The streaming-ingest half of the serving contract: a 100 TB
    * index is built once and then receives daily/hourly deltas; append
    * cost is one elementwise encode scan over the delta only. */
  def appendToPqIndex(
      newVectors: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val cbs = readCodebooks(newVectors.sparkSession, path)
    newVectors
      .select(col(idCol).as("neighbor_id"), ProductQuant.encodeCol(col(vecCol), cbs).as("codes"))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Streaming delta ingest — the production shape of [[appendToPqIndex]]:
    * index deltas arrive as a STREAM (a file-source drop directory, a log
    * at 100 TB) and must land exactly once across restarts. Each
    * micro-batch is encoded with the PERSISTED codebooks (read once
    * before the stream starts — they never change; retraining would
    * invalidate stored codes) and written to a batch-id-scoped
    * subdirectory with overwrite semantics: a replayed batch after a
    * crash rewrites the SAME directory, so the sink is idempotent and
    * the checkpoint + deterministic-path pair gives exactly-once codes —
    * the standard foreachBatch idempotent-sink construction.
    * [[servePqTopK]] reads the codes tree recursively, so served results
    * include every committed delta with no compaction step. */
  def streamAppendToPqIndex(
      deltas: DataFrame,
      path: String,
      checkpoint: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): org.apache.spark.sql.streaming.StreamingQuery = {
    val cbs = readCodebooks(deltas.sparkSession, path)
    deltas.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .select(col(idCol).as("neighbor_id"),
            ProductQuant.encodeCol(col(vecCol), cbs).as("codes"))
          .write.mode("overwrite").parquet(s"$path/codes/delta-$batchId")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** The full code table: the build job's flat files plus every
    * committed streaming delta subdirectory. */
  def readCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$path/codes")

  /** Serve top-k from the persisted index: ADC shortlist over the stored
    * codes, exact cosine re-rank against the vector table. No training,
    * no corpus encode — the build job already paid both. */
  def servePqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10,
      shortlistK: Int = 40): DataFrame = {
    val spark = corpus.sparkSession
    val cbs = readCodebooks(spark, path)
    val codes = readCodes(spark, path)
    val shortlist = ProductQuant
      .adcTopK(codes, queries, cbs, idCol, vecCol, shortlistK)
      .select(col("query_id"), col("neighbor_id"))
    ProductQuant.rerankShortlist(shortlist, queries, corpus, idCol, vecCol, k)
  }
}
