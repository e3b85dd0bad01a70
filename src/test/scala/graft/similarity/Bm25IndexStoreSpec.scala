package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted lexical-retrieval contract: serving from the inverted
  * index reproduces [[Bm25.search]] bit-for-bit, the takedown lifecycle
  * (delete → serve ≡ rebuild-without ≡ delete → compact → serve) is
  * exact, appends equal the one-shot build, and the serving scan prunes
  * to the query terms' posting buckets statically. */
class Bm25IndexStoreSpec extends SparkSpec {

  private val docsDir = "/root/testdata/sf0.001"
  private val Terms = Seq("spark", "join", "window")

  private def docs = spark.read.parquet(s"$docsDir/documents.parquet")

  private def newIndex(of: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx-").toString
    Bm25IndexStore.writeBm25Index(of, dir, "text", "doc_id", nBuckets = 16)
    dir
  }

  private def serve(dir: String) =
    Bm25IndexStore.serveBm25TopK(spark, dir, Terms, k = 10, roundTo = 6)
      .collect().toSeq

  test("served top-k equals the in-session Bm25.search bit-for-bit") {
    val dir = newIndex(docs)
    val inSession = Bm25.search(docs, "text", "doc_id", Terms, k = 10, roundTo = 6)
      .collect().toSeq
    assert(serve(dir) == inSession)
  }

  test("takedown lifecycle: delete -> serve == rebuild-without == delete -> compact -> serve") {
    val gone = docs.filter(col("doc_id") % 4 === 1).select("doc_id")
    val dir = newIndex(docs)
    Bm25IndexStore.deleteFromBm25Index(gone, dir)
    val logical = serve(dir)
    // ground truth: an index never containing the deleted docs — df(t),
    // N, and avgdl must ALL reflect the takedown, not just the hit list
    val rebuilt = newIndex(docs.filter(col("doc_id") % 4 =!= 1))
    assert(logical == serve(rebuilt), "logical delete must equal a rebuild")
    Bm25IndexStore.compactBm25Index(spark, dir, targetFiles = 2)
    assert(serve(dir) == logical, "compaction must not change served results")
    val d = Bm25IndexStore.describeBm25Index(spark, dir).head()
    assert(d.getAs[Long]("n_tombstones") == 0L, "compaction clears tombstones")
    assert(d.getAs[Long]("n_docs") ==
      docs.filter(col("doc_id") % 4 =!= 1).count(), "doclens shrank physically")
  }

  test("append under the persisted config equals the one-shot build") {
    val dir = newIndex(docs.filter(col("doc_id") % 2 === 0))
    Bm25IndexStore.appendToBm25Index(docs.filter(col("doc_id") % 2 =!= 0), dir)
    assert(serve(dir) == serve(newIndex(docs)))
  }

  test("serving scan prunes statically to the query terms' buckets") {
    val dir = newIndex(docs)
    // round 22: the pruned scan rides a lazy localCheckpoint (one
    // postings scan per serve), so the pruning is asserted on the
    // captured pre-checkpoint scan plan, not the final block-read plan
    Bm25IndexStore.ServeProbe.capturePlans.set(true)
    val plan =
      try {
        Bm25IndexStore.serveBm25TopK(spark, dir, Terms, k = 10, roundTo = 6)
        Bm25IndexStore.ServeProbe.lastPrunedPostingsPlan
      } finally Bm25IndexStore.ServeProbe.capturePlans.set(false)
    // static partition pruning: the bucket literals land in the scan's
    // PartitionFilters, and the token IN filter pushes to parquet
    assert(plan.contains("PartitionFilters: [") && plan.contains("tok_bucket"), plan)
    val m = Bm25IndexStore.readMeta(spark, dir)
    val buckets = Terms.map(Bm25IndexStore.bucketOf(_, m.nBuckets)).distinct
    buckets.foreach(bkt => assert(plan.contains(bkt.toString), s"bucket $bkt missing:\n$plan"))
    assert(plan.contains("PushedFilters") && plan.contains("In(token"), plan)
  }

  test("batched serve reproduces every per-call serve bit-for-bit") {
    import spark.implicits._
    val dir = newIndex(docs)
    val batch = Seq(
      (1L, Seq("spark", "join", "window")),
      (2L, Seq("scan", "filter")),
      (3L, Seq("sort", "merge", "hash", "batch")),
      // a term absent from the corpus (df = 0) and a duplicate term —
      // both per-call contract edges the batch must honor
      (4L, Seq("vector", "zzz_not_a_token", "vector", "stream"))
    ).toDF("query_id", "terms")
    val served = Bm25IndexStore
      .serveBm25TopKBatch(batch, dir, k = 10, roundTo = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, -t._3, t._2)).toSeq
    val perCall = Seq(
      1L -> Seq("spark", "join", "window"),
      2L -> Seq("scan", "filter"),
      3L -> Seq("sort", "merge", "hash", "batch"),
      4L -> Seq("vector", "zzz_not_a_token", "stream")).flatMap { case (qid, terms) =>
      Bm25IndexStore.serveBm25TopK(spark, dir, terms, k = 10, roundTo = -1)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.sortBy(t => (t._1, -t._3, t._2))
    // bitwise: unrounded doubles compared exactly — the fold orders match
    assert(served == perCall)
  }

  test("MaxScore pruning (pruneDf) is bitwise the unpruned serve on every query shape") {
    import spark.implicits._
    // synthetic hot-term corpus: 'the' in all 60 docs (df = 60, idf ~
    // 0.008, ub ~ 0.018), six topic words in 10 docs each (idf ~ 1.76)
    // -> the margin proof PASSES for hot+essential queries at k=3
    val syn = (0L until 60L).map { i =>
      (i, s"the w${i % 6} filler$i the tail")
    }.toDF("doc_id", "text")
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("graft-bm25-prune-").toString
      Bm25IndexStore.writeBm25Index(syn, d, "text", "doc_id", nBuckets = 16)
      d
    }
    val batch = Seq(
      (1L, Seq("the", "w1")),       // hot + essential: pruned path, proof passes
      (2L, Seq("the")),             // all-hot: fallback to the unpruned plan
      (3L, Seq("w2", "w3")),        // no hot term: plain path
      (4L, Seq("the", "zzz_nope")), // essential matches nothing: n<k, fallback
      (5L, Seq("the", "w4", "w5"))  // two essentials: pruned path
    ).toDF("query_id", "terms")
    def rows(pruneDf: Long) = Bm25IndexStore
      .serveBm25TopKBatch(batch, dir, k = 3, roundTo = 6, pruneDf = pruneDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, -t._3, t._2)).toSeq
    val unpruned = rows(Long.MaxValue)
    val pruned = rows(30L) // df('the') = 60 > 30; topic words df = 10 stay essential
    assert(pruned == unpruned, s"pruned diverged:\n$pruned\nvs\n$unpruned")
    // sanity: every query answers (q4's hot term still matches docs even
    // though its essential term is unknown — served via the fallback)
    assert(unpruned.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
    // and the per-call serve agrees on the pruned-path query (transitive
    // anchor to the per-call contract)
    val perCall = Bm25IndexStore.serveBm25TopK(spark, dir, Seq("the", "w1"), k = 3, roundTo = 6)
      .collect().map(r => (1L, r.getLong(0), r.getDouble(1)))
      .sortBy(t => (t._1, -t._3, t._2)).toSeq
    assert(pruned.filter(_._1 == 1L) == perCall)

    // the per-call MaxScore arm: pruned == unpruned on the pass shape,
    // the all-hot shape (immediate fallback), and the doomed-candidates
    // shape (sum df(ess) < k -> fallback before any phase-1 plan)
    def one(terms: Seq[String], pruneDf: Long) =
      Bm25IndexStore.serveBm25TopK(spark, dir, terms, k = 3, roundTo = 6, pruneDf = pruneDf)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for (terms <- Seq(Seq("the", "w1"), Seq("the"), Seq("the", "zzz_nope")))
      assert(one(terms, 30L) == one(terms, Long.MaxValue), s"per-call diverged on $terms")

    // round 19: the AUTO default (pruneDf omitted) derives max(1,
    // nDocs/10) = 6 from this index's stats, so every term here (df
    // 10-60) classifies hot and each query takes the all-hot fallback —
    // bitwise the disabled serve with zero caller configuration
    assert(rows(Bm25IndexStore.PruneDfAuto) == unpruned)
  }

  test("PruneDfAuto default: stats-derived threshold, pruned-path routing, bitwise parity") {
    import spark.implicits._
    // the derivation itself, spec-pinned (the serve is bitwise-invariant
    // by contract, so parity alone cannot show which threshold engaged)
    assert(Bm25IndexStore.resolvePruneDf(Bm25IndexStore.PruneDfAuto, 120L) == 12L)
    assert(Bm25IndexStore.resolvePruneDf(Bm25IndexStore.PruneDfAuto, 5L) == 1L) // never 0 on tiny corpora
    assert(Bm25IndexStore.resolvePruneDf(7L, 120L) == 7L)
    assert(Bm25IndexStore.resolvePruneDf(Long.MaxValue, 120L) == Long.MaxValue)
    intercept[IllegalArgumentException](Bm25IndexStore.resolvePruneDf(0L, 120L))
    intercept[IllegalArgumentException](Bm25IndexStore.resolvePruneDf(-2L, 120L))

    // 120 docs: 'the' df=120 > 12 (hot under auto), topic words df=10
    // (essential) — the ZERO-CONFIG batched serve routes the MaxScore
    // candidate path (the explicit-threshold test above pins routing
    // mechanics; this pins that auto lands on the same split) and stays
    // bitwise the disabled serve
    val syn = (0L until 120L).map(i => (i, s"the w${i % 12} filler$i the tail")).toDF("doc_id", "text")
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("graft-bm25-auto-").toString
      Bm25IndexStore.writeBm25Index(syn, d, "text", "doc_id", nBuckets = 16)
      d
    }
    val batch = Seq(
      (1L, Seq("the", "w1")),
      (2L, Seq("the")),
      (3L, Seq("w2", "w3")),
      (4L, Seq("the", "w4", "w5"))
    ).toDF("query_id", "terms")
    def rows(pruneDf: Long) = Bm25IndexStore
      .serveBm25TopKBatch(batch, dir, k = 3, roundTo = 6, pruneDf = pruneDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, -t._3, t._2)).toSeq
    val auto = rows(Bm25IndexStore.PruneDfAuto)
    val off = rows(Long.MaxValue)
    val explicit = rows(12L) // what auto should resolve to here
    assert(auto == off, s"auto default diverged:\n$auto\nvs\n$off")
    assert(explicit == off)
    // per-call agrees under its auto default too
    val pc = Bm25IndexStore.serveBm25TopK(spark, dir, Seq("the", "w1"), k = 3, roundTo = 6)
      .collect().map(r => (1L, r.getLong(0), r.getDouble(1))).toSeq
    assert(auto.filter(_._1 == 1L) == pc)
  }

  test("batched serve honors tombstones exactly like the per-call path") {
    import spark.implicits._
    val dir = newIndex(docs)
    Bm25IndexStore.deleteFromBm25Index(
      docs.filter(col("doc_id") % 4 === 1).select("doc_id"), dir)
    val batch = Seq((1L, Seq("spark", "join", "window")), (2L, Seq("scan", "filter")))
      .toDF("query_id", "terms")
    val served = Bm25IndexStore.serveBm25TopKBatch(batch, dir, k = 10, roundTo = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val perCall = Seq(1L -> Seq("spark", "join", "window"), 2L -> Seq("scan", "filter"))
      .flatMap { case (qid, terms) =>
        Bm25IndexStore.serveBm25TopK(spark, dir, terms, k = 10, roundTo = -1)
          .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
      }.toSet
    assert(served == perCall)
  }

  test("batched serve degenerate edges: all-unknown terms, empty batch, mixed batch") {
    import spark.implicits._
    val dir = newIndex(docs)
    // every term unknown -> zero rows, correct schema
    val unknown = Seq((1L, Seq("zzz_nope", "zzz_also_nope"))).toDF("query_id", "terms")
    val r1 = Bm25IndexStore.serveBm25TopKBatch(unknown, dir, k = 5)
    assert(r1.columns.toSeq == Seq("query_id", "doc_id", "score"))
    assert(r1.count() == 0)
    // empty batch -> zero rows, no job failure
    val empty = Seq.empty[(Long, Seq[String])].toDF("query_id", "terms")
    assert(Bm25IndexStore.serveBm25TopKBatch(empty, dir, k = 5).count() == 0)
    // mixed batch: the unknown-terms query is simply absent; the live
    // query still serves exactly its per-call rows
    val mixed = Seq(
      (1L, Seq("zzz_nope")),
      (2L, Seq("spark", "join", "window"))).toDF("query_id", "terms")
    val served = Bm25IndexStore.serveBm25TopKBatch(mixed, dir, k = 10, roundTo = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served.forall(_._1 == 2L))
    val perCall = Bm25IndexStore.serveBm25TopK(spark, dir, Seq("spark", "join", "window"),
        k = 10, roundTo = -1)
      .collect().map(r => (2L, r.getLong(0), r.getDouble(1))).toSet
    assert(served == perCall)
  }

  test("batched serve scans postings a constant number of times and prunes statically") {
    import spark.implicits._
    val dir = newIndex(docs)
    def planOf(batch: org.apache.spark.sql.DataFrame): String =
      Bm25IndexStore.serveBm25TopKBatch(batch, dir, k = 10, roundTo = 6)
        .queryExecution.executedPlan.toString
    val small = Seq((1L, Seq("spark", "join"))).toDF("query_id", "terms")
    val large = Seq(
      (1L, Seq("spark", "join")), (2L, Seq("scan", "filter")),
      (3L, Seq("sort", "merge")), (4L, Seq("window", "batch")),
      (5L, Seq("hash", "stream")), (6L, Seq("vector", "value")),
      (7L, Seq("table", "query")), (8L, Seq("order", "group"))
    ).toDF("query_id", "terms")
    // anchored on the path segment (optionally version-suffixed), so
    // 'postings_deltas' or an attribute merely containing the word can
    // never satisfy (or inflate) the constant-scan assertion
    def postingsScans(plan: String): Int =
      """/postings(__v\d+)?(?![\w-])""".r.findAllIn(plan).length
    // round 22 (one-scan contract): the df aggregate materializes the
    // pruned postings scan into lazy-checkpoint blocks, so the FINAL
    // scoring plan contains ZERO postings file scans for any batch size
    // — the amortization claim strengthened from "constant" to "none";
    // the single real scan is the captured pre-checkpoint plan below
    Bm25IndexStore.ServeProbe.capturePlans.set(true)
    try {
      val smallScans = postingsScans(planOf(small))
      val largeScans = postingsScans(planOf(large))
      assert(smallScans == 0 && largeScans == 0,
        s"scoring plan must read checkpoint blocks, not postings: $smallScans/$largeScans")
      // the one postings scan (pre-checkpoint) is statically bucket-pruned
      val pruned = Bm25IndexStore.ServeProbe.lastPrunedPostingsPlan
      assert(postingsScans(pruned) == 1, pruned)
      assert(pruned.contains("PartitionFilters: [") && pruned.contains("tok_bucket"),
        pruned)
    } finally Bm25IndexStore.ServeProbe.capturePlans.set(false)
  }

  test("streaming ingest lands exactly once across a mid-stream crash") {
    import spark.implicits._
    val oneShot = newIndex(docs)
    val inc = newIndex(docs.filter(col("doc_id") % 2 === 0))
    // the odd half staged as three files → three micro-batches
    val drop = java.nio.file.Files.createTempDirectory("graft-bm25-drop-").toString
    for (slice <- 0 until 3)
      docs.filter(col("doc_id") % 2 =!= 0 && col("doc_id") % 6 === (1 + 2 * slice))
        .coalesce(1).write.mode("overwrite").parquet(s"$drop/slice$slice")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bm25-ckpt-").toString
    val schema = docs.schema

    def ingest(kill: Boolean) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$drop/*")
      val gated =
        if (kill)
          stream.filter(udf { (id: Long) =>
            if (id % 6 == 3) throw new RuntimeException("injected mid-ingest failure")
            true
          }.apply(col("doc_id")))
        else stream
      Bm25IndexStore.streamAppendToBm25Index(gated, inc, ckpt, "text", "doc_id")
    }
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ingest(kill = true).awaitTermination()
    }
    assert(Bm25IndexStore.readDoclens(spark, inc).count() < docs.count(),
      "crash must leave the ingest incomplete")
    val q2 = ingest(kill = false)
    try q2.awaitTermination()
    finally q2.stop()

    // no duplicated, no dropped documents; served results equal the
    // one-shot build bit-for-bit (N, avgdl, df(t), scores, ranks)
    val ids = Bm25IndexStore.readDoclens(spark, inc).select("doc_id").as[Long].collect()
    assert(ids.length == ids.distinct.length, "every doc exactly once")
    assert(serve(inc) == serve(oneShot))

    // compaction folds the delta subtree into the partitioned main tree
    Bm25IndexStore.compactBm25Index(spark, inc, targetFiles = 2)
    assert(!graft.util.ArtifactTree.exists(spark, inc, "postings_deltas"),
      "compaction must remove the postings delta subtree")
    assert(serve(inc) == serve(oneShot), "serving unchanged by compaction")
  }

  test("batch append retried with the same batchId is idempotent") {
    val dir = newIndex(docs.filter(col("doc_id") % 2 === 0))
    val delta = docs.filter(col("doc_id") % 2 =!= 0)
    Bm25IndexStore.appendToBm25Index(delta, dir, batchId = "retry-me")
    val once = serve(dir)
    val nDocs = Bm25IndexStore.describeBm25Index(spark, dir).head().getAs[Long]("n_docs")
    // the blind retry after a presumed crash: same batch id rewrites the
    // same delta directories — rows land exactly once
    Bm25IndexStore.appendToBm25Index(delta, dir, batchId = "retry-me")
    assert(serve(dir) == once, "retried append must not change served results")
    val d2 = Bm25IndexStore.describeBm25Index(spark, dir).head()
    assert(d2.getAs[Long]("n_docs") == nDocs, "retried append must not duplicate doclens")
    assert(serve(dir) == serve(newIndex(docs)), "append still equals the one-shot build")
  }

  test("serving is exact through the compaction crash window (deltas visible twice)") {
    val dir = newIndex(docs.filter(col("doc_id") % 2 === 0))
    Bm25IndexStore.appendToBm25Index(docs.filter(col("doc_id") % 2 =!= 0), dir)
    val clean = serve(dir)
    // snapshot the delta rows, compact (folds them into the main tree and
    // removes the delta subtree), then resurrect the delta directory —
    // the half-state a compaction crash between the postings swap and the
    // postings_deltas removal leaves behind: every delta posting row is
    // now visible TWICE through readPostings
    val deltas = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/postings_deltas")
    val rows = deltas.collect().toIndexedSeq
    val schema = deltas.schema
    Bm25IndexStore.compactBm25Index(spark, dir, targetFiles = 2)
    assert(!graft.util.ArtifactTree.exists(spark, dir, "postings_deltas"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.parquet(s"$dir/postings_deltas/append-resurrected")
    // distinct-doc df + max/first pivot: scores bit-identical, not doubled
    assert(serve(dir) == clean, "crash-window serving must not double-count df(t)")
    // re-running the compaction heals the window physically
    Bm25IndexStore.compactBm25Index(spark, dir, targetFiles = 2)
    assert(!graft.util.ArtifactTree.exists(spark, dir, "postings_deltas"))
    assert(serve(dir) == clean)
  }

  test("pending-takedown serving reads the stats_net cache, never doclens") {
    val gone = docs.filter(col("doc_id") % 4 === 1).select("doc_id")
    val rebuilt = serve(newIndex(docs.filter(col("doc_id") % 4 =!= 1)))
    val dir = newIndex(docs)
    Bm25IndexStore.deleteFromBm25Index(gone, dir)
    // the behavioral pin: with the corpus-sized doclens artifact GONE,
    // serving still answers exactly — proof the per-query doclens scan
    // is no longer on the pending-delete path
    graft.util.ArtifactTree.remove(spark, dir, "doclens")
    assert(serve(dir) == rebuilt, "stats_net must carry the pending-delete serve")
  }

  test("a stale stats_net cache fails its stamp and serving falls back exactly") {
    val gone = docs.filter(col("doc_id") % 4 === 1).select("doc_id")
    val rebuilt = serve(newIndex(docs.filter(col("doc_id") % 4 =!= 1)))
    val dir = newIndex(docs)
    Bm25IndexStore.deleteFromBm25Index(gone, dir)
    // simulate the crashed-delete half-state: tombstones grew but the
    // cache refresh never ran — stamp the cache with a wrong count
    val stale = spark.read.parquet(s"$dir/stats_net")
      .withColumn("n_tombstones", lit(-1L))
    val staleRows = stale.collect().toIndexedSeq
    spark.createDataFrame(spark.sparkContext.parallelize(staleRows), stale.schema)
      .repartition(1).write.mode("overwrite").parquet(s"$dir/stats_net")
    assert(serve(dir) == rebuilt, "stamp mismatch must fall back to the exact doclens path")
  }

  test("bucket routing: driver-side bucketOf matches the engine's column expression") {
    import spark.implicits._
    val toks = Seq("spark", "join", "window", "the", "zebra").toDF("token")
    val fromEngine = toks.select(col("token"),
        pmod(graft.text.TextAnalysis.fnv1a64(col("token")), lit(16L)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    fromEngine.foreach { case (t, b) =>
      assert(Bm25IndexStore.bucketOf(t, 16) == b, s"bucket mismatch for '$t'")
    }
  }
}
