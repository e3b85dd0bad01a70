package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers, per the training-data-pipeline mandate:
  *
  *   - '''Brute-force cosine top-k''' — the exact baseline: the query set is
  *     `broadcast()` (queries are small by assumption: a probe set, a batch
  *     of dedup candidates), the corpus streams once with no shuffle until
  *     the final per-query top-k (a window keyed on the query id). Cosine is
  *     pure `Column` algebra (`zip_with` + `aggregate` in double precision),
  *     so the whole map side stays inside whole-stage codegen — no UDF.
  *   - '''LSH-bucketed ANN''' — the 100 TB path: L independent
  *     random-hyperplane sign-buckets per vector; candidates are generated
  *     by a `(table, bucket)`-keyed join (never all-pairs), then verified
  *     with exact cosine within buckets only. Collision probability for
  *     angle θ is (1-θ/π)^bits per table; L tables drive recall up
  *     exponentially while each table's join stays hash-partitioned and
  *     skew-free (buckets are uniform for mean-zero data).
  */
object Similarity {

  /** Elementwise cosine similarity of two `Array`-typed columns, computed
    * in double precision. Empty/size-mismatched arrays → null. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, v) => acc + v * v))
    when(size(a) === size(b) && size(a) > 0 && na > 0 && nb > 0, dot / (na * nb))
  }

  /** [[cosine]] as the native fused-loop expression — bit-identical
    * doubles (same left-to-right folds, same null contract), but inside
    * whole-stage codegen where the higher-order-function formulation is
    * CodegenFallback (interpreted, boxed). Use on any many-row path;
    * `array<float>` inputs only. */
  def cosineFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(CosineSimExpr(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Exact integer dot over `array<int>` codes as the native fused-loop
    * expression ([[IntDotExpr]]) — same longs as the
    * `aggregate(zip_with(...))` formulation, inside codegen. */
  def intDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(IntDotExpr(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Exact top-k neighbors for every query vector.
    *
    * `queries` must be broadcast-small; `corpus` is scanned once. Output:
    * `query_id, neighbor_id, rank, sim` (self-matches excluded when the id
    * spaces coincide). Deterministic: ties break on ascending neighbor id.
    *
    * Shuffle bound: the map side (broadcast + codegen'd cosine) is followed
    * by an exact per-partition top-k prune — each corpus partition keeps at
    * most `k` rows per query (plus boundary ties), so the exchange feeding
    * the final ranking window carries ≤ partitions × |queries| × k rows
    * instead of |corpus| × |queries|. The prune is lossless: a dropped row
    * has ≥ k same-partition rows with strictly greater similarity, so its
    * global `row_number` (sim desc first) necessarily exceeds k. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosineFast(col("q_vec"), col("c_vec")))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val pruned = localTopKPerQuery(scored, k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Top-k over symmetric int8 codes — the quantized serving path
    * ([[graft.embed.VectorQuant]]): per-vector scales CANCEL in cosine
    * (`(d_ab·s_a·s_b) / (√(d_aa)·s_a · √(d_bb)·s_b)`), so the quantized
    * similarity is `d_ab / √(d_aa·d_bb)` over pure INTEGER dot products —
    * exact arithmetic end-to-end (codes ≤ 127 ⇒ dots ≤ 2^20·dims, far
    * inside exact-double range), which makes the whole approximate-by-
    * quantization pipeline bit-reproducible and oracle-checkable, unlike
    * float rerank paths whose fold order matters. Same shuffle bound as
    * [[bruteForceTopK]]: broadcast queries, codegen'd integer dots, exact
    * per-partition top-k prune before the ranking exchange. */
  def int8TopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10): DataFrame = {
    def idot(a: Column, b: Column): Column = intDot(a, b)
    def codes(df: DataFrame, idName: String, vecName: String, n2Name: String) =
      graft.embed.VectorQuant.quantizeInt8(df, vecCol, idCol)
        .select(col(idCol).as(idName), col("qvec").as(vecName))
        .withColumn(n2Name, idot(col(vecName), col(vecName)))
    val q = broadcast(codes(queries, "query_id", "q_vec", "qn2"))
    val c = codes(corpus, "neighbor_id", "c_vec", "cn2")
    val scored = c
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        when(col("qn2") > 0 && col("cn2") > 0,
          idot(col("q_vec"), col("c_vec")).cast("double") /
            sqrt((col("qn2") * col("cn2")).cast("double"))))
      // Zero-norm vectors (qn2/cn2 = 0) have no defined cosine: drop them
      // outright rather than let null sims rank last and survive a
      // short-of-k query — the oracle's WHERE q.n2 > 0 AND c.n2 > 0.
      .filter(col("sim").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val pruned = localTopKPerQuery(scored, k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Exact per-partition top-k prune over a `(query_id, neighbor_id, sim)`
    * frame: per query, keeps the k highest-sim rows of each partition plus
    * any rows tying the k-th similarity (so tie-breaking on the global
    * window stays exact regardless of the id type's ordering). Null sims
    * rank as −∞ and survive only when a partition has < k scored rows for
    * that query. */
  private[similarity] def localTopKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    if (k <= 0) return scored.limit(0) // preserve the pre-prune contract: k=0 → empty
    val schema = scored.schema
    val simIdx = schema.fieldIndex("sim")
    val qIdx = schema.fieldIndex("query_id")
    scored.mapPartitions { rows =>
      import scala.collection.mutable
      // min-heap by sim per query; evict only rows strictly below the
      // partition's current k-th similarity (boundary ties are kept)
      val minFirst = Ordering.by[(Double, org.apache.spark.sql.Row), Double](_._1).reverse
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[(Double, org.apache.spark.sql.Row)]]
      rows.foreach { r =>
        val sim = if (r.isNullAt(simIdx)) Double.NegativeInfinity else r.getDouble(simIdx)
        val pq = heaps.getOrElseUpdate(r.get(qIdx), mutable.PriorityQueue.empty(minFirst))
        pq.enqueue((sim, r))
        var done = false
        while (pq.size > k && !done) {
          val m = pq.dequeue()
          if (pq.size >= k && pq.head._1 > m._1) () // strictly dominated by k rows — drop
          else { pq.enqueue(m); done = true }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ---------------------------------------------------------------- LSH

  /** Deterministic pseudo-Gaussian hyperplane component for
    * (table, bit, dim) derived from the seed — executors regenerate the
    * same planes with no broadcast state. */
  private[similarity] def planeComponentPublic(seed: Long, table: Int, bit: Int, d: Int): Double =
    planeComponent(seed, table, bit, d)

  private def planeComponent(seed: Long, table: Int, bit: Int, d: Int): Double = {
    var h = seed ^ (table * 0x9e3779b97f4a7c15L) ^ (bit * 0xbf58476d1ce4e5b9L) ^ (d * 0x94d049bb133111ebL)
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^= (h >>> 31)
    // sum of two uniforms centered at 0 — symmetric, sign-balanced
    val u1 = (h >>> 11).toDouble / (1L << 53).toDouble
    val u2 = ((h * 0x2545f4914f6cdd1dL) >>> 11).toDouble / (1L << 53).toDouble
    u1 + u2 - 1.0
  }

  /** The seeded hyperplane vectors of the sign-LSH family, exposed so an
    * external checker (the DuckDB oracle) can recompute buckets from the
    * same constants — the shared-config/independent-recompute pattern of
    * `Dedup.minHashParams`. */
  def lshPlanes(tables: Int, bits: Int, dim: Int, seed: Long): Seq[(Int, Int, Seq[Double])] =
    for (t <- 0 until tables; b <- 0 until bits)
      yield (t, b, (0 until dim).map(d => planeComponent(seed, t, b, d)))

  /** `(table, bucket)` keys for one vector: per table, the sign bits of
    * `bits` random hyperplane projections. */
  private[similarity] def lshBuckets(
      vec: Seq[Float],
      tables: Int,
      bits: Int,
      seed: Long): Seq[(Int, Long)] =
    if (vec == null || vec.isEmpty) Seq.empty
    else (0 until tables).map { t =>
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var d = 0
        while (d < vec.length) {
          dot += vec(d) * planeComponent(seed, t, b, d)
          d += 1
        }
        if (dot > 0) bucket |= (1L << b)
        b += 1
      }
      (t, bucket)
    }

  /** Candidate pairs from L sign-LSH tables: `(query_id, neighbor_id,
    * q_vec, c_vec)`, deduplicated, self-pairs removed. Shared by
    * [[lshTopK]] and the embedding-cosine dedup operator. */
  /** The codegen'd [[LshBucketsExpr]] as a Column — per-executor plane
    * cache, no ScalaUDF converter stack in the bucketing scan. */
  private def bucketsCol(vec: Column, tables: Int, bits: Int, seed: Long): Column =
    org.apache.spark.sql.graft.Bridge.column(
      LshBucketsExpr(org.apache.spark.sql.graft.Bridge.expression(vec), tables, bits, seed))

  def lshCandidates(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int,
      bits: Int,
      seed: Long): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .withColumn("tb", explode(bucketsCol(col(vec), tables, bits, seed)))
        .select(col(id), col(vec), col("tb.table").as("table"), col("tb.bucket").as("bucket"))

    withBuckets(queries, "query_id", "q_vec")
      .join(withBuckets(corpus, "neighbor_id", "c_vec"), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_vec"), col("c_vec"))
      .dropDuplicates("query_id", "neighbor_id")
  }

  /** Self-candidate pairs of one corpus from L sign-LSH tables, generated
    * from within each `(table, bucket)` member list in ONE pass — no
    * self-join, so no join machinery and no reliance on AQE happening to
    * reuse the two sides' identical shuffle at runtime. Output matches
    * [[lshCandidates]] with `query_id < neighbor_id`. Per-row memory is
    * bounded by bucket size × vector dim; raise `bits` to shrink buckets
    * at scale. */
  def lshSelfCandidates(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int,
      bits: Int,
      seed: Long,
      maxBucket: Int = graft.util.PostingLists.DefaultMaxBucket): DataFrame = {
    val bucketed = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("tb", explode(bucketsCol(col("vec"), tables, bits, seed)))
      .select(col("id"), col("vec"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    graft.util.PostingLists
      .pairs(graft.util.PostingLists.members(
        bucketed, Seq(col("table"), col("bucket")), struct(col("id"), col("vec")), maxBucket))
      .select(
        col("a.id").as("query_id"),
        col("b.id").as("neighbor_id"),
        col("a.vec").as("q_vec"),
        col("b.vec").as("c_vec"))
      .dropDuplicates("query_id", "neighbor_id")
  }

  /** Self-candidate pairs scored map-side: like [[lshSelfCandidates]] but
    * the exact cosine is computed inside the pair-explode projection, so
    * downstream thresholding can run BEFORE the pair-dedup exchange and
    * the vectors never shuffle (the near-duplicate verify pattern —
    * see `Dedup.embeddingNearDuplicates`). */
  def lshSelfScored(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int,
      bits: Int,
      seed: Long,
      maxBucket: Int = graft.util.PostingLists.DefaultMaxBucket): DataFrame = {
    // Per-pair scoring is the fused codegen'd [[cosineFast]] — same
    // doubles as [[cosine]] (identical left-to-right folds, same null
    // guard), one loop per pair inside whole-stage codegen. This
    // replaces the norm-hoisting + HOF-dot formulation: hoisting saved
    // FLOPs but every pair still detoured through interpreted
    // CodegenFallback eval, which dominated; the native loop wins and
    // the posting-list payload drops the extra norm field.
    val bucketed = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("tb", explode(bucketsCol(col("vec"), tables, bits, seed)))
      .select(col("id"), col("vec"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    graft.util.PostingLists
      .pairs(graft.util.PostingLists.members(
        bucketed, Seq(col("table"), col("bucket")),
        struct(col("id"), col("vec")), maxBucket))
      .select(
        col("a.id").as("query_id"),
        col("b.id").as("neighbor_id"),
        cosineFast(col("a.vec"), col("b.vec")).as("sim"))
  }

  /** Approximate top-k: candidates from L sign-LSH tables (bucket-keyed
    * join), exact cosine re-rank within the candidate set. Same output
    * schema as [[bruteForceTopK]]; recall < 1 by design — raise `tables`
    * or lower `bits` to trade cost for recall. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10,
      tables: Int = 8,
      bits: Int = 8,
      seed: Long = 42L): DataFrame =
    rerank(lshCandidates(queries, corpus, idCol, vecCol, tables, bits, seed), k)

  private def rerank(candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .withColumn("sim", cosineFast(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  // ---------------------------------------------------------------- IVF

  /** Seeded Lloyd k-means over a driver-side sample — the IVF coarse
    * quantizer. Returns `nCells` centroids. At cluster scale the sample is
    * a bounded `df.sample` collect; centroid count stays O(√n)-ish. */
  private[graft] def trainCentroids(
      sample: Array[Array[Float]],
      nCells: Int,
      seed: Long,
      iters: Int = 10): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val k = math.min(nCells, sample.length)
    var centroids = rnd.shuffle(sample.indices.toList).take(k).map(sample(_).clone()).toArray
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCell(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < v.length) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
    }
    centroids
  }

  /** Squared L2 distance in '''double''' precision with a left-to-right
    * accumulation order: each term is `(double(v_i) − double(c_i))²`, summed
    * in index order. This is the exact IEEE sequence
    * `list_inner_product(diff, diff)` produces in DuckDB on `DOUBLE[]`
    * inputs, which is what lets the oracle re-derive cell assignment from
    * the exported centroids bit-for-bit (the q_knn_cosine folding
    * contract, applied to distances). */
  private def dist2(v: Array[Float], ct: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < v.length) {
      val x = v(i).toDouble - ct(i).toDouble
      d += x * x
      i += 1
    }
    d
  }

  private[graft] def nearestCell(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = dist2(v, centroids(c))
      if (d < bestD) { bestD = d; best = c } // strict < : ties keep the lowest cell id
      c += 1
    }
    best
  }

  private[graft] def nearestCells(v: Array[Float], centroids: Array[Array[Float]], n: Int): Seq[Int] =
    centroids.indices
      .map(c => (c, dist2(v, centroids(c))))
      .sortBy(_._2) // stable: ties keep ascending cell id
      .take(n)
      .map(_._1)

  /** IVF approximate top-k: a seeded k-means coarse quantizer partitions
    * the corpus into `nCells` inverted lists (one shuffle keyed on cell
    * id); each query probes its `nProbe` nearest cells and exact cosine
    * re-ranks only those lists. The quantizer trains on a driver-side
    * sample (`sampleSize` rows) — the classic IVF-Flat layout.
    *
    * Sampling: rows are ordered by a seeded 64-bit hash of the (unique)
    * id column and the first `sampleSize` taken. The hash order is
    * uncorrelated with storage order, so the sample is uniform over the
    * whole corpus even when the parquet files are sorted/clustered (a
    * plain `limit` would train the quantizer on one file's corner of the
    * space); hashing the id rather than the vector keeps the sample
    * row-uniform on duplicate-heavy corpora (identical vectors would
    * share one hash and enter all-or-nothing). Deterministic for a fixed
    * seed; executes as TakeOrderedAndProject — each partition keeps a
    * `sampleSize` heap, no full sort, no extra scan. */
  /** The coarse quantizer's trained centroids for a given corpus and
    * seed — deterministic (seeded hash-ordered sample, seeded Lloyd), and
    * exposed so an external checker can re-derive cell assignment,
    * probing, and re-ranking from the same constants: the
    * shared-config/independent-recompute pattern of [[lshPlanes]] /
    * `Dedup.minHashParams`, extended to a '''data-dependent''' config (the
    * oracle builder trains on the same table with the same code path,
    * then hands DuckDB only the centroid literals — assignment, probing
    * and cosine re-rank are re-derived in SQL). */
  def trainedCentroids(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = 16,
      seed: Long = 42L,
      sampleSize: Int = 10000,
      distributedFrom: Int = DistributedTrainFrom): Array[Array[Float]] = {
    if (nCells >= distributedFrom) {
      val (rdd, n) = positionedSample(corpus, idCol, vecCol, seed, sampleSize)
      try trainCentroidsDistributed(rdd, n, nCells, seed)
      finally { rdd.unpersist(blocking = false); () }
    } else {
      import corpus.sparkSession.implicits._
      val sample = corpus
        .select(col(idCol), col(vecCol))
        .orderBy(xxhash64(lit(seed), col(idCol)))
        .limit(sampleSize)
        .select(col(vecCol))
        .as[Seq[Float]]
        .collect()
        .map(_.toArray)
      require(sample.nonEmpty, "trainedCentroids: empty corpus")
      trainCentroids(sample, nCells, seed)
    }
  }

  // ------------------------------------------- distributed quantizer training

  /** Cell-count threshold above which [[trainedCentroids]] /
    * [[ProductQuant.trainedCodebooks]] (and therefore [[semDedup]] and
    * every IVF/PQ surface built on them) switch from driver-side Lloyd
    * to the distributed partial-sum Lloyd. The knob rule SCALING.md
    * measured — `nCells ∝ corpus`, keep cell size constant — pushes k
    * into the thousands at web scale, where driver Lloyd's
    * `sample × k × dim` per iteration outgrows one driver thread long
    * before the sample itself stops fitting; the distributed path keeps
    * the per-iteration work on executors and moves only
    * `partitions × k × dim` partial sums to the driver. */
  val DistributedTrainFrom = 256

  /** The SAME seeded hash-ordered sample as the driver path — the first
    * `sampleSize` rows by `xxhash64(seed, id)` — but materialized as a
    * position-tagged executor-resident RDD instead of a driver array.
    *
    * Scale shape: a hash-cutoff pre-filter (expected survivors ≈ 4×
    * sampleSize, verified, falling back to unfiltered when the margin
    * misses) bounds the sort input so the full corpus is never globally
    * sorted; the survivor sort is range-partitioned (distributed — no
    * single-task `limit` merge), and `zipWithIndex` assigns global
    * hash-order positions so initialization can replay the driver
    * path's seeded index shuffle exactly. Returns the persisted RDD and
    * its exact row count; caller unpersists. */
  private[similarity] def positionedSample(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      seed: Long,
      sampleSize: Int): (org.apache.spark.rdd.RDD[(Long, Array[Float])], Long) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val hashed = corpus
      .select(col(vecCol).as("v"), xxhash64(lit(seed), col(idCol)).as("__h"))
    val total = hashed.count()
    val cut =
      if (total > 4L * sampleSize) {
        // the approximate frac-quantile of a uniform 64-bit hash in
        // signed-Long order: Long.MinValue + frac × 2^64
        val frac = BigDecimal(4L * sampleSize) / BigDecimal(total)
        val cutB = BigDecimal(Long.MinValue) + frac * BigDecimal(2).pow(64)
        val cutL = cutB.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
        val filtered = hashed.filter(col("__h") <= lit(cutL))
        if (filtered.count() >= math.min(sampleSize.toLong, total)) filtered else hashed
      } else hashed
    val rdd = cut
      .orderBy("__h")
      .select("v")
      .as[Seq[Float]]
      .rdd
      .zipWithIndex()
      .filter(_._2 < sampleSize)
      .map { case (v, pos) => (pos, v.toArray) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rdd.count()
    require(n > 0, "positionedSample: empty corpus")
    (rdd, n)
  }

  /** Distributed partial-sum Lloyd — the same algorithm as
    * [[trainCentroids]], executed as `iters` broadcast-assign passes:
    * initialization replays the driver path's seeded index shuffle over
    * the sample positions (so both paths start from the same k rows);
    * each iteration broadcasts the current centroids, every partition
    * accumulates per-cell double sums + counts over its rows
    * (`mapPartitions`, no shuffle), and the driver folds the bounded
    * `partitions × k × dim` partials in ascending partition order —
    * deterministic for a fixed sample layout. Empty cells keep their
    * previous centroid and argmin ties keep the lowest cell id, exactly
    * as the driver path.
    *
    * Parity: the per-iteration double sums group rows by partition
    * (contiguous hash-order ranges) instead of one flat left-to-right
    * fold, so they can differ from the driver fold in the last few
    * double bits; each iteration then quantizes to Float (~1e-7
    * relative), 5–6 orders coarser than the associativity noise, which
    * is why `DistributedKmeansSpec` pins bitwise-equal Float centroids
    * against driver Lloyd on fixed fixtures. That argument is
    * statistical, not absolute: a quotient landing within the
    * associativity noise of a Float rounding boundary CAN round apart,
    * and the divergence would feed subsequent assignments — so the
    * bitwise pin holds for a fixed sample PARTITION LAYOUT (the spec's
    * and the memoized queries' 32 partitions), and across layouts the
    * contract weakens to equality-up-to-Float-rounding per iteration.
    * Cross-layout reproducibility, where needed, comes from exporting
    * the trained centroids as literals (what every oracle here does),
    * not from re-training. Driver traffic per
    * iteration is partitions × k × dim × 8 B (a treeAggregate fold in
    * fixed pid-group order is the documented extension past ~1k
    * partitions). */
  private[similarity] def trainCentroidsDistributed(
      sample: org.apache.spark.rdd.RDD[(Long, Array[Float])],
      n: Long,
      nCells: Int,
      seed: Long,
      iters: Int = 10): Array[Array[Float]] = {
    require(n > 0 && n <= Int.MaxValue, s"trainCentroidsDistributed: bad sample size $n")
    val sc = sample.sparkContext
    val rnd = new scala.util.Random(seed)
    val k = math.min(nCells, n.toInt)
    val initSlots: Map[Long, Int] = rnd.shuffle((0 until n.toInt).toList).take(k)
      .zipWithIndex.map { case (pos, slot) => (pos.toLong, slot) }.toMap
    val bcInit = sc.broadcast(initSlots)
    var centroids: Array[Array[Float]] = {
      val rows = sample.flatMap { case (pos, v) =>
        bcInit.value.get(pos).map(slot => (slot, v))
      }.collect()
      val out = new Array[Array[Float]](k)
      rows.foreach { case (slot, v) => out(slot) = v.clone() }
      out
    }
    bcInit.destroy()
    (0 until iters).foreach { _ =>
      val bc = sc.broadcast(centroids)
      val partials = sample.mapPartitionsWithIndex { case (pid, it) =>
        val cents = bc.value
        val dim = cents.head.length
        val sums = Array.fill(cents.length)(new Array[Double](dim))
        val counts = new Array[Long](cents.length)
        var any = false
        it.foreach { case (_, v) =>
          any = true
          val c = nearestCell(v, cents)
          counts(c) += 1
          var d = 0
          while (d < dim) { sums(c)(d) += v(d); d += 1 }
        }
        if (any) Iterator((pid, sums, counts)) else Iterator.empty
      }.collect().sortBy(_._1)
      val dim = centroids.head.length
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      partials.foreach { case (_, ps, pc) =>
        var c = 0
        while (c < k) {
          counts(c) += pc(c)
          var d = 0
          while (d < dim) { sums(c)(d) += ps(c)(d); d += 1 }
          c += 1
        }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
      bc.destroy()
    }
    centroids
  }

  /** IVF × int8: the composed serving stack a production ANN service
    * actually deploys at 100 TB — the seeded coarse quantizer routes by
    * FLOAT geometry (tiny centroid table, regenerated on executors via
    * the broadcast-free UDF closure, assignment exactly as [[ivfTopK]]),
    * while the inverted lists hold 4×-smaller symmetric int8 codes and
    * the re-rank runs pure INTEGER dot products with scales cancelling
    * in cosine ([[int8TopK]]'s exact arithmetic). Quantization rides the
    * same elementwise scan that assigns cells (zero extra shuffle —
    * `VectorQuant.quantizeInt8`'s keep-columns path); candidates come
    * from the one cell-keyed join; the exact per-partition top-k prune
    * bounds the ranking exchange. Approximate only by cell routing —
    * the scored similarities themselves are bit-reproducible, so the
    * whole stack sits under the exact oracle. */
  def ivfInt8TopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 3,
      seed: Long = 42L,
      sampleSize: Int = 10000,
      /** The probe side is queries × nProbe rows with full int8 vectors;
        * the broadcast hint is right for the serving contract (a bounded
        * query batch) but would OOM a corpus-sized query set — pass
        * `false` there to let the planner (and AQE) pick the strategy
        * from actual sizes, as [[ivfTopK]] does. */
      broadcastQueries: Boolean = true): DataFrame = {
    val centroids = trainedCentroids(corpus, idCol, vecCol, nCells, seed, sampleSize)
    def cells(vec: Column, n: Int): Column =
      org.apache.spark.sql.graft.Bridge.column(
        NearestCellsExpr(org.apache.spark.sql.graft.Bridge.expression(vec), centroids, n))
    def idot(a: Column, b: Column): Column = intDot(a, b)

    val lists = graft.embed.VectorQuant
      .quantizeInt8(
        corpus.select(col(idCol), col(vecCol),
          element_at(cells(col(vecCol), 1), 1).as("cell")),
        vecCol, idCol, keep = Seq(col("cell")))
      .select(col(idCol).as("neighbor_id"), col("qvec").as("c_vec"), col("cell"))
      .withColumn("cn2", idot(col("c_vec"), col("c_vec")))
    val probesBase = graft.embed.VectorQuant
      .quantizeInt8(
        queries.select(col(idCol), col(vecCol), cells(col(vecCol), nProbe).as("cells")),
        vecCol, idCol, keep = Seq(col("cells")))
      .select(col(idCol).as("query_id"), col("qvec").as("q_vec"),
        explode(col("cells")).as("cell"))
      .withColumn("qn2", idot(col("q_vec"), col("q_vec")))
    val probes = if (broadcastQueries) broadcast(probesBase) else probesBase
    // each corpus vector lives in exactly ONE cell and probed cells are
    // distinct, so (query, neighbor) pairs are unique by construction —
    // no dedup exchange needed before the prune
    val scored = lists
      .join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        when(col("qn2") > 0 && col("cn2") > 0,
          idot(col("q_vec"), col("c_vec")).cast("double") /
            sqrt((col("qn2") * col("cn2")).cast("double"))))
      .filter(col("sim").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val pruned = localTopKPerQuery(scored, k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 3,
      seed: Long = 42L,
      sampleSize: Int = 10000): DataFrame = {
    val centroids = trainedCentroids(corpus, idCol, vecCol, nCells, seed, sampleSize)
    def cells(vec: Column, n: Int): Column =
      org.apache.spark.sql.graft.Bridge.column(
        NearestCellsExpr(org.apache.spark.sql.graft.Bridge.expression(vec), centroids, n))

    val lists = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      element_at(cells(col(vecCol), 1), 1).as("cell"))
    val probes = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("q_vec"),
      explode(cells(col(vecCol), nProbe)).as("cell"))
    val candidates = probes
      .join(lists, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_vec"), col("c_vec"))
      .dropDuplicates("query_id", "neighbor_id")
    rerank(candidates, k)
  }

  /** SemDeDup (Abbas, Tirumala, Simig, Ganguli & Morcos 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540) — semantic near-duplicate pruning
    * over an embedding column:
    *
    *   1. k-means-partition the embedding space (the IVF coarse
    *      quantizer: seeded sample, seeded Lloyd, [[trainedCentroids]]);
    *   2. compare pairs ONLY within a cell (the paper's within-cluster
    *      restriction is what makes the quadratic affordable — `nCells`
    *      bounds per-cell pair counts, the paper runs ~100k clusters at
    *      web scale);
    *   3. connected components over pairs with `cosine >= threshold`
    *      (large-star/small-star contraction, [[graft.dedup.Dedup.duplicateClusters]]);
    *   4. per component keep the member LEAST similar to its cell
    *      centroid (the paper's keep-low-centroid-similarity rule —
    *      retains the least prototypical example; ties break on
    *      ascending id), drop the rest via ONE id-keyed left-anti join.
    *
    * Returns the survivor rows of `corpus` (all columns). Deterministic
    * end to end; similarities are rounded to 6 decimals BEFORE the
    * threshold and the keep ordering so an external checker reproduces
    * every decision from the exported centroid literals.
    *
    * Scale: one elementwise scan assigns cells + centroid similarity
    * (codegen'd [[NearestCellsExpr]] routing, broadcast centroid join);
    * the pair join shuffles ids+vectors once on cell; components touch
    * ids only; full rows travel only through the final left-anti probe.
    * THE SCALE KNOB IS `nCells ∝ corpus` (keep cell size constant):
    * per-cell pair volume is quadratic in cell size by design, so a
    * fixed cell count on a growing corpus is the quadratic regime —
    * measured in SCALING.md (10× data at fixed 16 cells: ~100×
    * candidate pairs; at 160 cells: per-cell volume restored). */
  def semDedup(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.85,
      nCells: Int = 16,
      seed: Long = 42L,
      sampleSize: Int = 10000,
      distributedFrom: Int = DistributedTrainFrom): DataFrame = {
    val spark = corpus.sparkSession
    val centroids =
      trainedCentroids(corpus, idCol, vecCol, nCells, seed, sampleSize, distributedFrom)
    def cellOf(vec: Column): Column = element_at(
      org.apache.spark.sql.graft.Bridge.column(
        NearestCellsExpr(org.apache.spark.sql.graft.Bridge.expression(vec), centroids, 1)),
      1)
    import spark.implicits._
    val centFrame = broadcast(
      centroids.zipWithIndex.toSeq.map { case (cv, i) => (i, cv.toSeq) }.toDF("cell", "cv"))
    // one scan: cell assignment + rounded centroid similarity per row
    val assigned = corpus
      .select(col(idCol).as("sd_id"), col(vecCol).as("sd_vec"))
      .withColumn("cell", cellOf(col("sd_vec")))
      .join(centFrame, Seq("cell"))
      .select(col("sd_id"), col("sd_vec"), col("cell"),
        round(cosineFast(col("sd_vec"), col("cv")), 6).as("csim"))

    val pairs = assigned.alias("a")
      .join(assigned.alias("b"),
        col("a.cell") === col("b.cell") && col("a.sd_id") < col("b.sd_id"))
      .filter(round(cosineFast(col("a.sd_vec"), col("b.sd_vec")), 6) >= threshold)
      .select(col("a.sd_id").as("id_a"), col("b.sd_id").as("id_b"))

    val members = graft.dedup.Dedup.duplicateClusters(pairs)
    val w = Window.partitionBy(col("cluster_id")).orderBy(col("csim").asc, col("doc_id").asc)
    val losers = members
      .join(assigned.select(col("sd_id").as("doc_id"), col("csim")), Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("doc_id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }
}
