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

/** The broadcastable fit of the over-cap topic path: the sample-fitted
  * reduction basis plus the sample clusters' centroids and radii in the
  * reduced space. `assign` is a pure function of one reduced point, so
  * label assignment for every non-sample chunk runs distributed
  * (elementwise) instead of on the driver. */
final case class ChunkAssignModel(
    basis: Reduce.Basis,
    clusterDims: Int,
    centroids: Array[Array[Double]],
    radii: Array[Double])
    extends Serializable {

  /** Nearest centroid among clusters whose sample radius contains the
    * point (strict `<` → ties break to the lowest cluster id); noise
    * (`-1`) when the point lies beyond every cluster's radius. Radii are
    * the max sample-member distance to their own centroid, so every
    * sample member lands in SOME cluster — sample DBSCAN noise may be
    * absorbed by a nearby cluster, a documented over-cap semantic. */
  def assign(red: Array[Float]): Int = {
    var best = Cluster.OutlierLabel
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var s = 0.0
      var j = 0
      while (j < clusterDims) { val d = red(j) - ctr(j); s += d * d; j += 1 }
      val dist = math.sqrt(s)
      if (dist <= radii(c) && dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }
}

/** Full topic-modeling pipeline as a `DataFrame => DataFrames` transform
  * (reference `/root/reference/src/topic_modeling/mod.rs:209-399` and row
  * assembly `plugin.rs:98-294`).
  *
  * Staging (SURVEY §3.2): chunking and embedding are distributed
  * (`posexplode` + `mapPartitions`); the reduce/cluster stages are the
  * genuinely global, small-data steps. Below `Config.maxDriverChunks` the
  * `[n_chunks × dim]` matrix is collected to the driver (the explicit
  * barrier that Polars' `is_elementwise=False` expresses) and the labels
  * ride back as a LocalRelation — bitwise the pre-cap behavior. '''Above
  * the cap the barrier is bounded''': a deterministic hash-ordered
  * TakeOrdered collects exactly `maxDriverChunks` sample rows, the
  * reduction basis is fitted and the sample clustered driver-side, and
  * the fitted [[ChunkAssignModel]] is broadcast so EVERY chunk (sample
  * included) is projected and cluster-assigned distributed — the driver
  * never holds more than the cap, at any corpus size. c-TF-IDF, rollup
  * and the per-document assembly are distributed algebra in both paths.
  *
  * Plan shape (the 100 TB contract): the chunk frame is persisted
  * (MEMORY_AND_DISK) and materialized exactly once, in the `chunking`
  * stage. Exact path: the embedding collect and the c-TF-IDF aggregation
  * read that one materialization, and the rollup/assembly stages are
  * rebuilt from the already-collected label triples. Sampled path: the
  * embed+project+assign pass is `localCheckpoint`ed once, so the four
  * downstream consumers (c-TF-IDF, rollup, coords, assembly) read
  * checkpoint blocks — the lazy `documents` plan handed back to the
  * caller contains NO chunking/embedding subtree in either path.
  *
  * Reduction/clustering ladder: the DEFAULT path is real PaCMAP
  * ([[Pacmap]] — exact neighbors ≤8k points, IVF-approximate
  * candidates above, mirroring the reference crate's
  * `approx_threshold` regime switch) and real HDBSCAN ([[Hdbscan]] via
  * [[Cluster]]). Seeded PCA is the documented over-cap fallback
  * (PaCMAP has no out-of-sample transform for the sampled path), and
  * eps-pinned
  * DBSCAN is the oracle-stability override used by a few fixed-label
  * query oracles — neither is the default anymore. Stage names mirror
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
      stopwords: Set[String] = Set.empty,
      /** Driver-barrier cap: the maximum number of chunk embeddings ever
        * collected to the driver. Corpora at or below it take the exact
        * collect-reduce-cluster path; above it, fit-on-sample +
        * distributed projection (see the object scaladoc). */
      maxDriverChunks: Int = 100000,
      /** Opt-in (round 19): when the collapsed-structure advisory fires
        * ([[StructureAdvisoryStage]] — the sampled fit returned ≤ 2
        * topics for a corpus ≥ 10× the sample cap), re-run the sampled
        * fit ONCE with the advisory's own recommended knobs
        * (`reduceDims ≥ 10`, a 10×-cap sample bounded by the corpus) and
        * use that fit. Bounded to one retry; both attempts' timings land
        * in `stage_timings_ms` (the retry under `*_retry` stage names).
        * Off by default: the retry re-collects a 10× sample to the
        * driver, a cost the caller must opt into. */
      autoRecoverStructure: Boolean = false)

  /** The collapsed-structure advisory stage (round 18). SCALING.md's
    * 100×-cliff study measured a TWO-knob recovery rule — when hundreds
    * of topics are plausible, recovery needs `reduceDims ≥ 10` AND a
    * sample of ≥~150 points per expected topic; neither knob alone
    * moves the count — but the rule lived only in prose. Now the signal
    * rides the existing per-row `stage_timings_ms` contract: when the
    * SAMPLED fit returns suspiciously few clusters for its corpus
    * (n_topics ≤ 2 while the corpus holds ≥ 10× more chunks than the
    * sample cap — the measured collapse signature, 2 mega-topics
    * confidently assigning 99.9% of a 100-topic corpus), this stage
    * name is appended with elapsed 0. It is a HINT, not a failure: a
    * genuinely 2-topic corpus that happens to be 10× the cap also
    * triggers it, and the recommended knobs are then a cheap
    * confirmation re-run. Never emitted on the exact (≤ cap) path,
    * where the fit saw every chunk. */
  val StructureAdvisoryStage: String =
    "structure_advisory(reduceDims>=10,maxDriverChunks>=150*expected_topics)"

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
    * `trainedCentroids` pattern applied to topic modeling. Over the cap it
    * covers the SAMPLE chunks only (bounded by `maxDriverChunks`). */
  final case class Output(
      documents: DataFrame,
      topics: DataFrame,
      nChunks: Long,
      nTopics: Int,
      stageTimings: Seq[(String, Double)],
      chunkPoints: Seq[(Long, Int, Int, Float, Float)])

  /** The over-cap barrier's sample frame: hash-ordered top-`cap` over the
    * embedded chunks. `orderBy` + `limit` compiles to a TakeOrdered — a
    * distributed top-k whose driver-side result is exactly `cap` rows at
    * any corpus size (the plan-shape pin for "chunk embeddings never
    * exceed the sample bound on the driver"). xxhash64 order is
    * content-independent (uniform over chunks); `(doc_id, chunk_idx)`
    * breaks ties totally, so the sample is deterministic. */
  private[graft] def sampleFrame(embedded: DataFrame, cap: Int): DataFrame =
    embedded
      .select(col("doc_id"), col("chunk_idx"), col("emb"))
      .orderBy(xxhash64(col("doc_id"), col("chunk_idx")), col("doc_id"), col("chunk_idx"))
      .limit(cap)

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
    require(
      cfg.maxDriverChunks >= Reduce.MinPointsForReduction,
      s"maxDriverChunks=${cfg.maxDriverChunks} below the minimum reducible sample (${Reduce.MinPointsForReduction})")
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
      val nChunksTotal = timed("chunking") { chunks.count() } // materialize the one chunking pass

      // 2. embedding — mapPartitions batch engine over the cached chunks
      val embedded = graft.embed.Embedders.embed(chunks, "chunk_text", "emb", cfg.modelId)

      val (nChunks, nTopics, keywordsInput, labelDf, chunkCounts, corpusOf, topicCoords, chunkPoints)
          : (Long, Int, DataFrame, DataFrame, Map[Int, Int], DataFrame, Array[(Float, Float)], Seq[(Long, Int, Int, Float, Float)]) =
        if (nChunksTotal <= cfg.maxDriverChunks) {
          // ---- exact path (≤ cap): full collect, driver reduce+cluster ----
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
          val n = collected.length
          val matrix = collected.map(_._4.toArray)

          // 4. reduce + cluster (numeric guard identical to mod.rs:262-301)
          val (labels, nT, coords, chunk2d): (Array[Int], Int, Array[(Float, Float)], Array[Array[Float]]) =
            if (n == 0) (Array.empty, 0, Array.empty, Array.empty)
            else if (n < Reduce.MinPointsForReduction)
              (Array.fill(n)(0), 1, Array((0.0f, 0.0f)), Array.fill(n)(Array(0.0f, 0.0f)))
            else {
              // PaCMAP (the reference's reducer) — exact kNN ≤ 8k points,
              // IVF-approximate candidates above (Pacmap's internal regime
              // switch, mirroring the crate's approx_threshold), so every
              // corpus on the exact driver path keeps PaCMAP geometry. The
              // seeded-PCA substitute now serves only the SAMPLED path
              // (PaCMAP has no out-of-sample transform).
              val reduced = timed("reduce_clustering") {
                Pacmap.reduce(matrix, cfg.reduceDims, cfg.seed)
              }
              val result = timed("hdbscan") { Cluster.cluster(reduced, cfg.cluster) }
              val twoD = timed("reduce_coordinates") {
                // the reference reduces SEPARATELY to 2-D for coordinates
                // (mod.rs:289-303); identical config+seed makes the
                // reduceDims==2 rerun redundant — reuse
                if (cfg.reduceDims == 2) reduced
                else Pacmap.reduce(matrix, 2, cfg.seed)
              }
              val cds = timed("topic_coordinates") {
                val sums = Array.fill(result.nTopics)((0.0, 0.0, 0))
                twoD.zip(result.labels).foreach { case (pt, l) =>
                  if (l >= 0) sums(l) = (sums(l)._1 + pt(0), sums(l)._2 + pt(1), sums(l)._3 + 1)
                }
                sums.map { case (sx, sy, c) => if (c == 0) (0.0f, 0.0f) else ((sx / c).toFloat, (sy / c).toFloat) }
              }
              (result.labels, result.nTopics, cds, twoD)
            }

          // the per-chunk (label, 2-D point) export (see Output.chunkPoints)
          val pts: Seq[(Long, Int, Int, Float, Float)] =
            collected.indices.map { i =>
              val (d, _, c, _) = collected(i)
              (d, c, labels(i), chunk2d(i)(0), chunk2d(i)(1))
            }.toSeq

          // 5. labels re-join the cached chunk frame by (doc_id, chunk_idx) —
          //    only for c-TF-IDF, which needs the chunk texts; the rollup and
          //    assembly stages below run off `lblDf` alone (driver triples),
          //    so no later action re-derives the chunk subtree.
          val labelRows = collected.zip(labels).map { case ((d, _, c, _), l) => (d, c, l) }.toSeq
          val lblDf = labelRows.toDF("doc_id", "chunk_idx", "label")
          val labeled = chunks.join(lblDf, Seq("doc_id", "chunk_idx"))

          val counts = labels.filter(_ >= 0).groupBy(identity).view.mapValues(_.length).toMap
          // doc → corpus from the barrier rows (LocalRelation): the soft-size
          // aggregation only concerns documents WITH chunks, so no action here
          // re-derives the input frame
          val cOf = collected.map(t => (t._1, t._2)).distinct.toSeq.toDF("doc_id", "corpus")
          (n.toLong, nT, labeled, lblDf, counts, cOf, coords, pts)
        } else {
          // ---- sampled path (> cap): bounded barrier, distributed assign ----
          // 3'. the BOUNDED barrier: a deterministic hash-ordered top-`cap`
          //     sample. orderBy+limit compiles to TakeOrdered — a distributed
          //     top-k whose driver-side result is exactly `cap` rows, never
          //     the corpus. xxhash64 order is content-independent (uniform
          //     over chunks) and (doc_id, chunk_idx) breaks ties totally.
          val cap = cfg.maxDriverChunks
          // 4'. ONE fit attempt: sample-collect, PCA basis fit (first two
          //     components double as the 2-D coordinates, same slicing
          //     argument as the exact path), cluster the reduced sample,
          //     freeze each cluster as (centroid, max-member radius) in
          //     the reduced space. Parameterized (round 19) so the opt-in
          //     structure recovery below can re-run it ONCE with the
          //     advisory's recommended knobs; `suffix` keeps the retry's
          //     stage timings separate from the first attempt's.
          def fitAttempt(capN: Int, dimsN: Int, suffix: String)
              : (Array[(Long, Int, Seq[Float])], Array[Array[Float]], ChunkAssignModel) = {
            val sampledN = timed("embedding" + suffix) {
              sampleFrame(embedded, capN)
                .as[(Long, Int, Seq[Float])]
                .collect()
                .sortBy(t => (t._1, t._2))
            }
            val sampleMatrix = sampledN.map(_._3.toArray)
            val kFit = math.max(2, dimsN)
            val (basis, reducedSampleN) = timed("reduce_clustering" + suffix) {
              val b = Reduce.fit(sampleMatrix, kFit, cfg.seed)
              (b, sampleMatrix.map(b.project))
            }
            val modelN = timed("hdbscan" + suffix) {
              val clusterDims = math.min(math.max(dimsN, 1), basis.k)
              val clusterInput =
                if (clusterDims == basis.k) reducedSampleN
                else reducedSampleN.map(_.take(clusterDims))
              val result = Cluster.cluster(clusterInput, cfg.cluster)
              val sums = Array.fill(result.nTopics)(new Array[Double](clusterDims))
              val cnts = new Array[Int](result.nTopics)
              var i = 0
              while (i < clusterInput.length) {
                val l = result.labels(i)
                if (l >= 0) {
                  val s = sums(l); val p = clusterInput(i)
                  var j = 0
                  while (j < clusterDims) { s(j) += p(j); j += 1 }
                  cnts(l) += 1
                }
                i += 1
              }
              val centroids = sums.zip(cnts).map { case (s, c) => s.map(_ / math.max(c, 1)) }
              val radii = new Array[Double](result.nTopics)
              i = 0
              while (i < clusterInput.length) {
                val l = result.labels(i)
                if (l >= 0) {
                  val ctr = centroids(l); val p = clusterInput(i)
                  var s = 0.0; var j = 0
                  while (j < clusterDims) { val d = p(j) - ctr(j); s += d * d; j += 1 }
                  val dist = math.sqrt(s)
                  if (dist > radii(l)) radii(l) = dist
                }
                i += 1
              }
              ChunkAssignModel(basis, clusterDims, centroids, radii)
            }
            (sampledN, reducedSampleN, modelN)
          }
          var fit = fitAttempt(cap, cfg.reduceDims, "")
          // collapsed-structure hint (see [[StructureAdvisoryStage]]):
          // appended at the detection point, so it sits right after the
          // hdbscan stage whose result it qualifies
          if (fit._3.centroids.length <= 2 && nChunksTotal >= 10L * cap) {
            timings += StructureAdvisoryStage -> 0.0
            // opt-in recovery (round 19): turn the advisory's own two
            // knobs — the measured SCALING.md rule: reduceDims ≥ 10 AND a
            // larger sample (10× the cap, the advisory's detection ratio,
            // capped at the corpus) — and refit ONCE. Both attempts'
            // timings ride stage_timings_ms (`*_retry` stages); a corpus
            // that is genuinely 2 topics just confirms itself at the
            // bigger sample, which is exactly the advisory's documented
            // "cheap confirmation re-run".
            // Int.MaxValue clamp: 10L * cap overflows Int past ~214M
            // driver chunks (ADVICE r19 — theoretical at that collect
            // size, but a negative sample cap must not be expressible)
            if (cfg.autoRecoverStructure)
              fit = fitAttempt(
                math.min(math.min(nChunksTotal, 10L * cap), Int.MaxValue.toLong).toInt,
                math.max(cfg.reduceDims, 10), "_retry")
          }
          val (sampled, reducedSample, model) = fit
          val nT = model.centroids.length

          // 5'. broadcast the fit; project + assign EVERY chunk distributed
          //     (elementwise matrix-vector per row — no shuffle), then cut
          //     lineage with one eager localCheckpoint so the four downstream
          //     consumers read checkpoint blocks, not the embed subtree.
          val bcModel = spark.sparkContext.broadcast(model)
          val assignUdf = udf { (emb: scala.collection.Seq[Float]) =>
            val m = bcModel.value
            val red = m.basis.project(emb.toArray)
            (m.assign(red), red(0), if (red.length > 1) red(1) else 0.0f)
          }
          val labeledAll = timed("reduce_coordinates") {
            embedded
              .withColumn("asg", assignUdf(col("emb")))
              .select(
                col("doc_id"), col("corpus"), col("chunk_idx"), col("chunk_text"),
                col("asg._1").as("label"), col("asg._2").as("x"), col("asg._3").as("y"))
              .localCheckpoint()
          }

          // 6'. per-topic chunk counts + coordinate centroids: one small
          //     aggregation (nTopics rows) over the checkpointed pass
          val (counts, coords) = timed("topic_coordinates") {
            val rows = labeledAll
              .filter(col("label") >= 0)
              .groupBy(col("label"))
              .agg(count(lit(1)).as("cnt"), avg(col("x")).as("cx"), avg(col("y")).as("cy"))
              .as[(Int, Long, Double, Double)]
              .collect()
            val cm = rows.map(r => r._1 -> r._2.toInt).toMap
            val cds = Array.fill(nT)((0.0f, 0.0f))
            rows.foreach(r => cds(r._1) = (r._3.toFloat, r._4.toFloat))
            (cm, cds)
          }

          // the bounded chunkPoints export: the sample, through the SAME
          // assignment the distributed pass applies
          val pts: Seq[(Long, Int, Int, Float, Float)] =
            sampled.indices.map { i =>
              val (d, c, _) = sampled(i)
              val red = reducedSample(i)
              (d, c, model.assign(red), red(0), if (red.length > 1) red(1) else 0.0f)
            }.toSeq

          val lblDf = labeledAll.select(col("doc_id"), col("chunk_idx"), col("label"))
          val cOf = chunks.select(col("doc_id"), col("corpus")).distinct()
          (nChunksTotal, nT, labeledAll, lblDf, counts, cOf, coords, pts)
        }

      // 6. c-TF-IDF over non-outlier chunks, distributed
      val termCounts = timed("ctfidf_count_terms") {
        Ctfidf.countTopicTerms(
          keywordsInput.filter(col("label") >= 0),
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
            lit(nChunks).as("n_chunks"))
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

      Output(documentsWithTimings, output._1, nChunks, nTopics, allTimings, chunkPoints)
    } finally {
      chunks.unpersist()
    }
  }
}
