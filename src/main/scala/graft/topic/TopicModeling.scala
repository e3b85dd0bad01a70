package graft.topic

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.embed.EmbedderRegistry
import graft.text.TokenizerModels

/** One stage-timing entry, mirroring the reference's
  * `StageTiming { stage, elapsed_ms }`
  * (`/root/reference/src/topic_modeling/mod.rs:148-152`). */
final case class StageTiming(stage: String, elapsed_ms: Double)

/** Full topic-modeling pipeline as a `DataFrame => DataFrames` transform
  * (reference `/root/reference/src/topic_modeling/mod.rs:209-399` and row
  * assembly `plugin.rs:98-294`).
  *
  * Staging (SURVEY §3.2): chunking and embedding are distributed
  * (`posexplode` + `mapPartitions`); the reduce/cluster stages are the
  * genuinely global, small-data steps — the `[n_chunks × dim]` matrix is
  * collected to the driver (the explicit barrier that Polars'
  * `is_elementwise=False` expresses). c-TF-IDF, rollup and the per-document
  * assembly are distributed algebra again. Nothing corpus-sized lives on
  * the driver except the chunk embedding matrix and the `(doc_id,
  * chunk_idx, label)` triples that ride along with it.
  *
  * Plan shape (the 100 TB contract): the chunk frame is persisted
  * (MEMORY_AND_DISK) and materialized exactly once, in the `chunking`
  * stage; the embedding collect and the c-TF-IDF aggregation read that one
  * materialization, and the rollup/assembly stages are rebuilt from the
  * already-collected label triples — so the lazy `documents` plan handed
  * back to the caller contains NO chunking/embedding subtree and every
  * expensive map stage runs once per pipeline, not once per action. The
  * persist is released in a `finally` before returning (all dependents are
  * eager).
  *
  * Deviations (documented): PaCMAP → seeded PCA ([[Reduce]]), HDBSCAN →
  * deterministic DBSCAN ([[Cluster]]) — the `hdbscan` stage-timing key is
  * kept for parity with the reference's key set. Stage names mirror
  * `stage_timings_ms` (`mod.rs:223-390`), and the same
  * `stage_timings_ms` list is replicated onto every output row exactly
  * like the reference (`plugin.rs:242-280`).
  */
object TopicModeling {

  final case class Config(
      modelId: String = EmbedderRegistry.DefaultModelId,
      chunking: Chunking.Config = Chunking.Config(),
      reduceDims: Int = 5,
      seed: Long = 42L,
      cluster: Cluster.Config = Cluster.Config(),
      topK: Int = 10,
      vectorizerModel: String = TokenizerModels.PlainWordsEn,
      lowercase: Boolean = true,
      stopwords: Set[String] = Set.empty)

  /** `documents`: one row per input doc —
    * `doc_id, corpus, dominant_topic, topic_distribution, representative_words, x, y, n_topics, n_chunks, stage_timings_ms`.
    * `topics`: one row per topic —
    * `id, representative_words, representative_scores, size, total_size, chunk_count, x, y`. */
  /** `chunkPoints`: one `(doc_id, chunk_idx, label, x, y)` per chunk —
    * the cluster label and 2-D reduction coordinates from the driver
    * barrier. The seeded reduce/cluster stages are deterministic, so this
    * is the pipeline's data-dependent "trained config": an external
    * checker can re-derive the coords centroids ([[Coords]] = groupBy-avg)
    * and the per-document assembly join from these points alone, the
    * `trainedCentroids` pattern applied to topic modeling. */
  final case class Output(
      documents: DataFrame,
      topics: DataFrame,
      nChunks: Long,
      nTopics: Int,
      stageTimings: Seq[(String, Double)],
      chunkPoints: Seq[(Long, Int, Int, Float, Float)])

  /** Run the pipeline. '''`docs` must be a deterministic frame''': cluster
    * labels are collected from one evaluation of the chunk subtree and
    * re-joined to the persisted chunk frame by `(doc_id, chunk_idx)`, and
    * a persist does not survive executor loss — evicted partitions
    * recompute from the input plan, so a nondeterministic source (a bare
    * `.limit(n)` over more than `n` rows, an unseeded `sample`, a
    * `first`/`any_value` aggregate) could select different rows on
    * recomputation and silently misalign or drop chunk labels. Sort before
    * limiting (`orderBy(id).limit(n)`), seed samples, or `localCheckpoint()`
    * the input if its plan is not deterministic. */
  def run(
      docs: DataFrame,
      textCol: String,
      docIdCol: String = "doc_id",
      corpusCol: Option[String] = None,
      cfg: Config = Config()): Output = {
    val spark = docs.sparkSession
    import spark.implicits._

    val timings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed[T](stage: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      timings += stage -> (System.nanoTime() - t0) / 1e6
      r
    }
    val totalStart = System.nanoTime()

    timed("embedder_load") { EmbedderRegistry.prefetch(cfg.modelId) }

    val base = docs.select(
      col(docIdCol).cast("long").as("doc_id"),
      corpusCol.map(c => col(c).cast("int")).getOrElse(lit(0)).as("corpus"),
      coalesce(col(textCol), lit("")).as("text"))

    // 1. chunking — distributed; the sizer resolves the executor-singleton
    //    model inside the codegen'd expression's helper (never serialized
    //    in a closure). Persisted and materialized here so the chunking
    //    pass runs exactly once; every later stage reads the cached rows.
    val chunkCol = org.apache.spark.sql.graft.Bridge.column(
      ChunkTextsExpr(
        org.apache.spark.sql.graft.Bridge.expression(col("text")),
        cfg.chunking.maxTokens, cfg.chunking.overlap, cfg.modelId))
    val chunks = base
      .select(col("doc_id"), col("corpus"), posexplode(chunkCol).as(Seq("chunk_idx", "chunk_text")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      timed("chunking") { chunks.count() } // materialize the one chunking pass

      // 2. embedding — mapPartitions batch engine over the cached chunks
      val embedded = graft.embed.Embedders.embed(chunks, "chunk_text", "emb", cfg.modelId)

      // 3. the global barrier: [n_chunks × dim] to the driver, ordered.
      //    The corpus id rides along (4 bytes/chunk) so the assembly stage
      //    never has to re-scan the input frame for doc→corpus pairs.
      val collected = timed("embedding") {
        embedded
          .select(col("doc_id"), col("corpus"), col("chunk_idx"), col("emb"))
          .orderBy("doc_id", "chunk_idx")
          .as[(Long, Int, Int, Seq[Float])]
          .collect()
      }
      val nChunks = collected.length
      val matrix = collected.map(_._4.toArray)

      // 4. reduce + cluster (numeric guard identical to mod.rs:262-301)
      val (labels, nTopics, topicCoords, chunk2d): (Array[Int], Int, Array[(Float, Float)], Array[Array[Float]]) =
        if (nChunks == 0) (Array.empty, 0, Array.empty, Array.empty)
        else if (nChunks < Reduce.MinPointsForReduction)
          (Array.fill(nChunks)(0), 1, Array((0.0f, 0.0f)), Array.fill(nChunks)(Array(0.0f, 0.0f)))
        else {
          val reduced = timed("reduce_clustering") { Reduce.reduce(matrix, cfg.reduceDims, cfg.seed) }
          val result = timed("hdbscan") { Cluster.cluster(reduced, cfg.cluster) }
          // PCA components are computed sequentially with deflation from a
          // per-component RNG stream, so the first two columns of the k-dim
          // reduction ARE the 2-dim reduction — slice instead of re-running
          // the power iteration (halves the driver-side PCA cost; bitwise
          // identical to Reduce.reduce(matrix, 2, seed))
          val twoD = timed("reduce_coordinates") {
            if (cfg.reduceDims >= 2) reduced.map(r => Array(r(0), r(1)))
            else Reduce.reduce(matrix, 2, cfg.seed)
          }
          val coords = timed("topic_coordinates") {
            val sums = Array.fill(result.nTopics)((0.0, 0.0, 0))
            twoD.zip(result.labels).foreach { case (pt, l) =>
              if (l >= 0) sums(l) = (sums(l)._1 + pt(0), sums(l)._2 + pt(1), sums(l)._3 + 1)
            }
            sums.map { case (sx, sy, c) => if (c == 0) (0.0f, 0.0f) else ((sx / c).toFloat, (sy / c).toFloat) }
          }
          (result.labels, result.nTopics, coords, twoD)
        }

      // the per-chunk (label, 2-D point) export (see Output.chunkPoints)
      val chunkPoints: Seq[(Long, Int, Int, Float, Float)] =
        collected.indices.map { i =>
          val (d, _, c, _) = collected(i)
          (d, c, labels(i), chunk2d(i)(0), chunk2d(i)(1))
        }.toSeq

      // 5. labels re-join the cached chunk frame by (doc_id, chunk_idx) —
      //    only for c-TF-IDF, which needs the chunk texts; the rollup and
      //    assembly stages below run off `labelDf` alone (driver triples),
      //    so no later action re-derives the chunk subtree.
      val labelRows = collected.zip(labels).map { case ((d, _, c, _), l) => (d, c, l) }.toSeq
      val labelDf = labelRows.toDF("doc_id", "chunk_idx", "label")
      val labeled = chunks.join(labelDf, Seq("doc_id", "chunk_idx"))

      // 6. c-TF-IDF over non-outlier chunks, distributed
      val termCounts = timed("ctfidf_count_terms") {
        Ctfidf.countTopicTerms(
          labeled.filter(col("label") >= 0),
          "chunk_text",
          col("label"),
          cfg.vectorizerModel,
          cfg.lowercase,
          cfg.stopwords)
      }
      val keywords: Map[Int, Seq[(String, Double)]] = timed("ctfidf_scores") {
        if (nTopics == 0) Map.empty
        else
          // topTerms localCheckpoints its counts input (no CacheManager
          // entry); the blocks are released by the ContextCleaner once this
          // collect — their only consumer — returns and they fall out of
          // scope
          Ctfidf
            .topTerms(termCounts, cfg.topK)
            .as[(Int, Long, String, Double)]
            .collect()
            .groupBy(_._1)
            .view
            .mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
            .toMap
      }

      // 7. rollup — distributed, over the label triples (chunk-free plan)
      val dist = timed("rollup") { Rollup.rollup(labelDf.select(col("doc_id"), col("label"))) }

      val output = timed("assemble_topics") {
        val chunkCounts = labels.filter(_ >= 0).groupBy(identity).view.mapValues(_.length).toMap
        // doc → corpus from the barrier rows (LocalRelation): the soft-size
        // aggregation only concerns documents WITH chunks, so no action here
        // re-derives the input frame
        val corpusOf = collected.map(t => (t._1, t._2)).distinct.toSeq.toDF("doc_id", "corpus")
        val sizes = Rollup
          .corpusTopicSizes(dist, corpusOf)
          .as[(Int, Int, Double)]
          .collect()
        val maxCorpus = corpusCol match {
          // no corpus column → corpus is lit(0) for every doc, statically
          case None => 0
          // chunkless docs can still carry the max corpus id, so this one
          // scans the input frame (the only corpus-sized action in assembly)
          // — empty input → max() null, coalesced to -1 so nCorpora is 1
          case Some(_) => base.agg(coalesce(max(col("corpus")), lit(-1))).as[Int].head()
        }
        val nCorpora = math.max(1, maxCorpus + 1)
        val sizeMap = sizes.map { case (corpus, topic, s) => (corpus, topic) -> s.toFloat }.toMap

        val topicRows = (0 until nTopics).map { t =>
          val kw = keywords.getOrElse(t, Seq.empty)
          val size = (0 until nCorpora).map(c => sizeMap.getOrElse((c, t), 0.0f))
          val (x, y) = if (t < topicCoords.length) topicCoords(t) else (0.0f, 0.0f)
          Row(t, kw.map(_._1), kw.map(_._2.toFloat), size, size.sum, chunkCounts.getOrElse(t, 0), x, y)
        }
        val topicSchema = StructType(Seq(
          StructField("id", IntegerType),
          StructField("representative_words", ArrayType(StringType)),
          StructField("representative_scores", ArrayType(FloatType)),
          StructField("size", ArrayType(FloatType)),
          StructField("total_size", FloatType),
          StructField("chunk_count", IntegerType),
          StructField("x", FloatType),
          StructField("y", FloatType)))
        val topicsDf = spark.createDataFrame(spark.sparkContext.parallelize(topicRows, 1), topicSchema)

        val distAgg = dist
          .groupBy(col("doc_id"), col("dominant_topic"))
          .agg(sort_array(collect_list(struct(col("topic_id"), col("proportion")))).as("topic_distribution"))
        val topicMeta = broadcast(
          topicsDf.select(
            col("id").as("dominant_topic"),
            col("representative_words").as("topic_words"),
            col("x").as("topic_x"),
            col("y").as("topic_y")))
        val documents = base
          .select(col("doc_id"), col("corpus"))
          .join(distAgg, Seq("doc_id"), "left")
          .join(topicMeta, Seq("dominant_topic"), "left")
          .select(
            col("doc_id"),
            col("corpus"),
            coalesce(col("dominant_topic"), lit(Rollup.OutlierLabel)).as("dominant_topic"),
            coalesce(col("topic_distribution"), array().cast("array<struct<topic_id:int,proportion:double>>"))
              .as("topic_distribution"),
            coalesce(col("topic_words"), array().cast("array<string>")).as("representative_words"),
            coalesce(col("topic_x"), lit(0.0f)).as("x"),
            coalesce(col("topic_y"), lit(0.0f)).as("y"),
            lit(nTopics).as("n_topics"),
            lit(nChunks.toLong).as("n_chunks"))
        (topicsDf, documents)
      }
      timings += "total" -> (System.nanoTime() - totalStart) / 1e6

      // Replicate the run-level timing list onto every output row, exactly
      // like the reference (`plugin.rs:242-280`): a constant literal — zero
      // per-row cost, full schema parity.
      val allTimings = timings.toSeq
      val documentsWithTimings = output._2.withColumn(
        "stage_timings_ms",
        typedLit(allTimings.map { case (s, e) => StageTiming(s, e) }))

      Output(documentsWithTimings, output._1, nChunks.toLong, nTopics, allTimings, chunkPoints)
    } finally {
      chunks.unpersist()
    }
  }
}
