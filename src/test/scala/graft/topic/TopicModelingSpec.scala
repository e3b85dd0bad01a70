package graft.topic

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Driver-side reduce/cluster stages: structural assertions only (shape,
  * determinism, blob separation) — geometric parity with PaCMAP/HDBSCAN is
  * explicitly out of contract, matching the reference's own test posture
  * (`reduce.rs:98-136`, `cluster.rs:96-141`). */
class ReduceClusterSpec extends AnyFunSuite {

  test("reduce rejects too few points and ragged rows") {
    intercept[IllegalArgumentException] { Reduce.reduce(Array.fill(3)(Array(0.0f, 1.0f)), 2) }
    intercept[IllegalArgumentException] {
      Reduce.reduce(Array(Array(0.0f), Array(0.0f, 1.0f)) ++ Array.fill(10)(Array(0.0f)), 2)
    }
  }

  test("reduce outputs requested dims, deterministic, separates blobs") {
    val pts = Array.tabulate(40) { i =>
      val base = if (i % 2 == 0) 0.0f else 5.0f
      Array.tabulate(8)(j => base + (i * j % 3) * 0.01f)
    }
    val a = Reduce.reduce(pts, 3, seed = 7L)
    val b = Reduce.reduce(pts, 3, seed = 7L)
    assert(a.length == 40 && a.forall(_.length == 3))
    assert(a.zip(b).forall { case (ra, rb) => ra.sameElements(rb) })
    // blob separation survives: distance between group means dominates spread
    val g0 = a.zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
    val g1 = a.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)
    def mean(g: Array[Array[Float]]) = g.transpose.map(c => c.sum / c.length)
    val d = mean(g0).zip(mean(g1)).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d > 1.0, s"separation $d")
  }

  test("components are nested: reduce(m,2) equals the first 2 cols of reduce(m,5)") {
    // guards the orchestrator's coordinate-slice optimization: each
    // component consumes its own RNG draw + deflation against earlier ones,
    // so truncation and re-computation must agree bitwise
    val rnd = new scala.util.Random(19)
    val pts = Array.fill(30)(Array.fill(12)(rnd.nextGaussian().toFloat))
    val five = Reduce.reduce(pts, 5, seed = 3L)
    val two = Reduce.reduce(pts, 2, seed = 3L)
    assert(five.map(r => Seq(r(0), r(1))).toSeq == two.map(_.toSeq).toSeq)
  }

  test("fit + project reproduces reduce bitwise (the sample-fit contract)") {
    val rnd = new scala.util.Random(23)
    val pts = Array.fill(25)(Array.fill(10)(rnd.nextGaussian().toFloat))
    val direct = Reduce.reduce(pts, 4, seed = 11L)
    val basis = Reduce.fit(pts, 4, seed = 11L)
    val projected = pts.map(basis.project)
    assert(direct.zip(projected).forall { case (a, b) => a.sameElements(b) })
    // out-of-sample rows project without refitting
    val fresh = Array.fill(10)(rnd.nextGaussian().toFloat)
    assert(basis.project(fresh).length == 4)
  }

  test("kd-tree range and kth-neighbor queries equal the brute-force scan") {
    val rnd = new scala.util.Random(31)
    val pts = Array.fill(300)(Array.fill(5)(rnd.nextGaussian().toFloat))
    val tree = new KdTree(pts)
    def d(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    (0 until 300 by 7).foreach { i =>
      val eps = 0.8 + (i % 5) * 0.3
      val brute = pts.indices.filter(j => d(pts(i), pts(j)) <= eps).toArray
      assert(tree.rangeQuery(pts(i), eps).toSeq == brute.toSeq, s"range i=$i eps=$eps")
      val sorted = pts.indices.map(j => d(pts(i), pts(j))).sorted
      (1 to 9 by 4).foreach { k =>
        assert(math.abs(tree.kthNeighborDistance(i, k) - sorted(k)) < 1e-6, s"kth i=$i k=$k")
      }
    }
  }

  test("cluster separates two blobs and marks the lone outlier") {
    val points =
      Array.tabulate(10)(i => Array(i * 0.01f, 0.0f)) ++
        Array.tabulate(10)(i => Array(10.0f + i * 0.01f, 10.0f)) :+
        Array(100.0f, 100.0f)
    val res = Cluster.cluster(points, Cluster.Config(minClusterSize = 5))
    assert(res.nTopics == 2, s"labels: ${res.labels.toSeq}")
    assert(res.labels.last == Cluster.OutlierLabel)
    assert(res.labels.forall(l => l == Cluster.OutlierLabel || (l >= 0 && l < 2)))
    // contiguous, first-seen order
    assert(res.labels.filter(_ >= 0).distinct.toSeq == Seq(0, 1))
  }

  test("cluster: single point is one trivial topic; empty input none") {
    val single = Cluster.cluster(Array(Array(1.0f, 2.0f)))
    assert(single.nTopics == 1 && single.labels.toSeq == Seq(0))
    val empty = Cluster.cluster(Array.empty[Array[Float]])
    assert(empty.nTopics == 0 && empty.labels.isEmpty)
  }

  test("cluster is deterministic") {
    val rnd = new scala.util.Random(3)
    val pts = Array.fill(50)(Array.fill(4)(rnd.nextGaussian().toFloat))
    val a = Cluster.cluster(pts, Cluster.Config(minClusterSize = 4))
    val b = Cluster.cluster(pts, Cluster.Config(minClusterSize = 4))
    assert(a.labels.sameElements(b.labels) && a.nTopics == b.nTopics)
  }

  /** The case a single density level cannot split (the r9 DBSCAN
    * stand-in's documented limitation): a tight blob (σ=0.05) and a loose
    * blob (σ=2.0) 40× apart in scale. Any one eps either fragments the
    * loose blob to noise or cannot tell tight-blob structure from it;
    * HDBSCAN's condensed tree recovers both. */
  private def varyingDensityBlobs(): Array[Array[Float]] = {
    val rnd = new scala.util.Random(41)
    val tight = Array.fill(30)(Array(
      (rnd.nextGaussian() * 0.05).toFloat,
      (rnd.nextGaussian() * 0.05).toFloat))
    val loose = Array.fill(30)(Array(
      (30.0 + rnd.nextGaussian() * 2.0).toFloat,
      (rnd.nextGaussian() * 2.0).toFloat))
    tight ++ loose
  }

  test("hdbscan separates varying-density blobs a single eps cannot") {
    val pts = varyingDensityBlobs()
    val res = Cluster.cluster(pts, Cluster.Config(minClusterSize = 8))
    assert(res.nTopics == 2, s"nTopics=${res.nTopics} labels=${res.labels.toSeq}")
    // each blob maps (mostly) to one label; the two labels differ
    def dominant(r: Range): Int =
      r.map(res.labels).filter(_ >= 0).groupBy(identity).maxBy(_._2.size)._1
    val lt = dominant(0 until 30)
    val ll = dominant(30 until 60)
    assert(lt != ll)
    // ≥80% of each blob lands in its dominant cluster
    assert((0 until 30).count(i => res.labels(i) == lt) >= 24)
    assert((30 until 60).count(i => res.labels(i) == ll) >= 24)

    // contrast: an eps tuned to the tight blob (DBSCAN pinned path)
    // drops the entire loose blob to noise
    val pinned = Cluster.cluster(pts, Cluster.Config(minClusterSize = 8, eps = Some(0.2)))
    assert((30 until 60).forall(i => pinned.labels(i) == Cluster.OutlierLabel))
  }

  test("hdbscan: duplicate points (zero distances) stay finite and cluster") {
    val pts = Array.fill(12)(Array(1.0f, 1.0f)) ++
      Array.fill(12)(Array(9.0f, 9.0f)) ++ Array.fill(2)(Array(5.0f, 5.0f))
    val res = Cluster.cluster(pts, Cluster.Config(minClusterSize = 6))
    assert(res.nTopics == 2, s"labels=${res.labels.toSeq}")
    assert(res.labels.take(12).distinct.length == 1)
    assert(res.labels.slice(12, 24).distinct.length == 1)
  }

  test("hdbscan invariants on random inputs: contiguous labels, min sizes, permutation-stable") {
    for (seed <- Seq(1, 7, 13)) {
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(40)
      val pts = Array.fill(n)(Array.fill(3)(rnd.nextGaussian().toFloat * (1 + seed)))
      val m = 4 + rnd.nextInt(4)
      val res = Cluster.cluster(pts, Cluster.Config(minClusterSize = m))
      val pos = res.labels.filter(_ >= 0)
      assert(pos.isEmpty && res.nTopics == 0 || pos.toSet == (0 until res.nTopics).toSet,
        s"labels not contiguous (seed $seed): ${res.labels.toSeq}")
      // a selected cluster's membership can never undercut minClusterSize
      pos.groupBy(identity).foreach { case (l, g) =>
        assert(g.length >= m, s"cluster $l size ${g.length} < $m (seed $seed)")
      }
      // determinism: bit-identical on re-run. (Permutation EQUIVARIANCE is
      // deliberately NOT asserted: mutual-reachability ties — every edge
      // dominated by one point's core distance shares its weight — make
      // MST selection index-order-dependent, in this and every standard
      // HDBSCAN implementation; the pinned contract is determinism for a
      // given input order.)
      val res2 = Cluster.cluster(pts, Cluster.Config(minClusterSize = m))
      assert(res2.nTopics == res.nTopics && res2.labels.sameElements(res.labels),
        s"not deterministic (seed $seed)")
    }
  }

  test("hdbscan: one homogeneous blob yields zero topics (no single-cluster)") {
    // allow_single_cluster=false posture: the condensed root is never
    // selected, so an unstructured corpus reports no topics rather than
    // one all-encompassing pseudo-topic
    val rnd = new scala.util.Random(17)
    val pts = Array.fill(40)(Array(rnd.nextGaussian().toFloat, rnd.nextGaussian().toFloat))
    val res = Cluster.cluster(pts, Cluster.Config(minClusterSize = 10))
    assert(res.nTopics == 0, s"nTopics=${res.nTopics}")
    assert(res.labels.forall(_ == Cluster.OutlierLabel))
  }
}

class TopicModelingSpec extends SparkSpec {

  import spark.implicits._

  /** Two disjoint-vocabulary document groups → the pseudo-embedder maps them
    * to two separated regions → two topics. */
  private def corpus(): Seq[(Long, Int, String)] = {
    val vocabA = Vector("astronomy", "telescope", "galaxy", "nebula", "orbit", "comet", "stellar", "cosmic")
    val vocabB = Vector("pastry", "croissant", "baguette", "oven", "flour", "yeast", "dough", "crust")
    val rnd = new scala.util.Random(5)
    (0 until 24).map { i =>
      val v = if (i < 12) vocabA else vocabB
      val words = Seq.fill(12)(v(rnd.nextInt(v.length)))
      (i.toLong, i % 2, words.mkString(" "))
    }
  }

  test("end-to-end: two vocab groups → two topics, coherent assembly") {
    val docs = corpus().toDF("doc_id", "corpus", "text")
    val out = TopicModeling.run(docs, "text", "doc_id", Some("corpus"),
      TopicModeling.Config(cluster = Cluster.Config(minClusterSize = 4)))

    assert(out.nChunks == 24)
    assert(out.nTopics == 2, s"expected 2 topics, got ${out.nTopics}")

    val documents = out.documents.orderBy("doc_id").collect()
    assert(documents.length == 24)
    // distributions sum to 1 (docs are single-chunk → one-hot)
    documents.foreach { r =>
      val distSum = r.getAs[scala.collection.Seq[Row]]("topic_distribution").map(_.getDouble(1)).sum
      assert(math.abs(distSum - 1.0) < 1e-9)
    }
    // group purity: docs 0-11 share a dominant topic; 12-23 the other
    val doms = documents.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("dominant_topic")).toMap
    val gA = (0L until 12L).map(doms).toSet
    val gB = (12L until 24L).map(doms).toSet
    assert(gA.size == 1 && gB.size == 1 && gA != gB, s"doms: $doms")

    // representative words come from the right vocabulary
    val topics = out.topics.orderBy("id").collect()
    assert(topics.length == 2)
    val words0 = topics(doms(0L)).getAs[scala.collection.Seq[String]]("representative_words")
    assert(words0.exists(Set("astronomy", "telescope", "galaxy", "nebula", "orbit", "comet", "stellar", "cosmic")))
    // soft sizes: 2 corpora, each topic split across both (docs alternate corpus)
    assert(topics.forall(_.getAs[scala.collection.Seq[Float]]("size").length == 2))

    // the 12 reference stage-timing keys (mod.rs:223-390), in order
    val referenceKeys = Seq("embedder_load", "chunking", "embedding", "reduce_clustering",
      "hdbscan", "reduce_coordinates", "topic_coordinates", "ctfidf_count_terms",
      "ctfidf_scores", "rollup", "assemble_topics", "total")
    assert(out.stageTimings.map(_._1) == referenceKeys)

    // ...and the same list is replicated onto every output row, like the
    // reference's stage_timings_ms column (plugin.rs:242-280)
    documents.foreach { r =>
      val perRow = r.getAs[scala.collection.Seq[Row]]("stage_timings_ms").map(_.getString(0))
      assert(perRow == referenceKeys, s"per-row stage keys: $perRow")
    }

    // plan-shape contract: the returned lazy `documents` plan must not
    // contain the chunking subtree (posexplode over the chunk UDF) — all
    // chunk-derived stages were materialized once during run()
    val planStr = out.documents.queryExecution.optimizedPlan.toString
    assert(!planStr.toLowerCase.contains("posexplode"), s"chunking subtree leaked into final plan:\n$planStr")
  }

  test("raising reduceDims is behavior-preserving at base scale") {
    // the SCALING.md 100×-cliff recommendation says "raise reduceDims
    // preemptively when many topics are plausible" — this pins that the
    // raise is SAFE where structure already resolves: same topic count
    // and the same document partition (up to label renaming) as the
    // default reduceDims=5, on the two-vocab fixture
    val docs = corpus().toDF("doc_id", "corpus", "text")
    def partitionOf(rd: Int): (Int, Map[Int, Set[Long]]) = {
      val out = TopicModeling.run(docs, "text", "doc_id", Some("corpus"),
        TopicModeling.Config(reduceDims = rd,
          cluster = Cluster.Config(minClusterSize = 4)))
      val groups = out.documents.select("doc_id", "dominant_topic").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("dominant_topic"))
        .groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
      (out.nTopics, groups)
    }
    val (n5, g5) = partitionOf(5)
    for (rd <- Seq(10, 15)) {
      val (n, g) = partitionOf(rd)
      assert(n == n5, s"reduceDims=$rd changed the topic count: $n5 -> $n")
      // same partition of documents into groups, labels free to differ
      assert(g.values.toSet == g5.values.toSet,
        s"reduceDims=$rd changed the document partition")
    }
  }

  test("empty input yields empty output instead of crashing (max-corpus guard)") {
    val docs = Seq.empty[(Long, Int, String)].toDF("doc_id", "corpus", "text")
    val out = TopicModeling.run(docs, "text", "doc_id", Some("corpus"))
    assert(out.nChunks == 0L && out.nTopics == 0)
    assert(out.documents.count() == 0)
    assert(out.topics.count() == 0)
  }

  test("empty and whitespace docs get dominant -1 and empty payload") {
    val docs = (corpus() :+ ((99L, 0, "   "))).toDF("doc_id", "corpus", "text")
    val out = TopicModeling.run(docs, "text", "doc_id", Some("corpus"),
      TopicModeling.Config(cluster = Cluster.Config(minClusterSize = 4)))
    val r = out.documents.filter($"doc_id" === 99L).collect().head
    assert(r.getAs[Int]("dominant_topic") == -1)
    assert(r.getAs[scala.collection.Seq[Row]]("topic_distribution").isEmpty)
    assert(r.getAs[scala.collection.Seq[String]]("representative_words").isEmpty)
  }

  test("tiny corpus collapses to one trivial topic (numeric guard)") {
    val docs = Seq((0L, 0, "alpha beta"), (1L, 0, "gamma delta")).toDF("doc_id", "corpus", "text")
    val out = TopicModeling.run(docs, "text", "doc_id", Some("corpus"))
    assert(out.nTopics == 1 && out.nChunks == 2)
    assert(out.documents.select("dominant_topic").as[Int].collect().forall(_ == 0))
  }

  test("deterministic across runs") {
    val docs = corpus().toDF("doc_id", "corpus", "text")
    val cfg = TopicModeling.Config(cluster = Cluster.Config(minClusterSize = 4))
    val a = TopicModeling.run(docs, "text", "doc_id", Some("corpus"), cfg)
    val b = TopicModeling.run(docs, "text", "doc_id", Some("corpus"), cfg)
    // stage_timings_ms carries wall-clock values — excluded from equality
    assert(a.documents.drop("stage_timings_ms").orderBy("doc_id").collect().toSeq ==
      b.documents.drop("stage_timings_ms").orderBy("doc_id").collect().toSeq)
    assert(a.topics.orderBy("id").collect().toSeq == b.topics.orderBy("id").collect().toSeq)
    // chunkPoints is the data-dependent oracle config — must be bitwise
    // stable across runs or the q_topic_coords/assembly oracles would race
    // their own engine queries
    assert(a.chunkPoints == b.chunkPoints)
  }

  test("over-cap path: bounded barrier, coherent distributed assignment") {
    // 24 docs / 24 chunks with the cap at 16 → the sampled path runs: the
    // driver holds at most 16 embeddings, the other 8 chunks are labeled
    // by the broadcast ChunkAssignModel on the executors
    val docs = corpus().toDF("doc_id", "corpus", "text")
    val cfg = TopicModeling.Config(
      cluster = Cluster.Config(minClusterSize = 4),
      maxDriverChunks = 16)
    val out = TopicModeling.run(docs, "text", "doc_id", Some("corpus"), cfg)

    // the barrier is bounded: chunkPoints covers the sample only
    assert(out.nChunks == 24)
    assert(out.chunkPoints.length == 16, s"sample size ${out.chunkPoints.length}")
    assert(out.nTopics >= 1)

    val documents = out.documents.orderBy("doc_id").collect()
    assert(documents.length == 24)
    // every document got a valid dominant topic (no chunkless docs here)
    documents.foreach { r =>
      val dom = r.getAs[Int]("dominant_topic")
      assert(dom >= -1 && dom < out.nTopics, s"dominant $dom")
      val distSum = r.getAs[scala.collection.Seq[Row]]("topic_distribution").map(_.getDouble(1)).sum
      assert(math.abs(distSum - 1.0) < 1e-9)
    }
    // the disjoint vocabularies still separate when both groups have
    // enough sample mass to form clusters: group purity on the dominant
    // topics of docs whose topic is non-noise
    if (out.nTopics >= 2) {
      val doms = documents.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("dominant_topic")).toMap
      val gA = (0L until 12L).map(doms).filter(_ >= 0).toSet
      val gB = (12L until 24L).map(doms).filter(_ >= 0).toSet
      assert((gA intersect gB).isEmpty, s"groups overlap: $doms")
    }

    // stage-timing keys keep full reference parity in the sampled path
    val referenceKeys = Seq("embedder_load", "chunking", "embedding", "reduce_clustering",
      "hdbscan", "reduce_coordinates", "topic_coordinates", "ctfidf_count_terms",
      "ctfidf_scores", "rollup", "assemble_topics", "total")
    assert(out.stageTimings.map(_._1) == referenceKeys)

    // chunking/embedding subtree must not leak into the returned lazy plan
    // (the sampled path localCheckpoints the assign pass)
    val planStr = out.documents.queryExecution.optimizedPlan.toString
    assert(!planStr.toLowerCase.contains("posexplode"), s"chunking subtree leaked:\n$planStr")
  }

  test("structure advisory: fires on the collapsed over-cap regime only") {
    // COLLAPSED fixture: 200 near-identical one-chunk docs over a cap of
    // 16 -> the sampled fit sees 16 points of one blob (n_topics = 1)
    // while the corpus holds 12.5x the cap -> the SCALING.md collapse
    // signature, so the advisory stage must ride stage_timings_ms
    val mono = (0 until 200).map { i =>
      (i.toLong, 0, s"astronomy telescope galaxy nebula orbit comet stellar cosmic word$i")
    }.toDF("doc_id", "corpus", "text")
    val out = TopicModeling.run(mono, "text", "doc_id", Some("corpus"),
      TopicModeling.Config(cluster = Cluster.Config(minClusterSize = 4), maxDriverChunks = 16))
    assert(out.nTopics <= 2, s"fixture no longer collapses: ${out.nTopics} topics")
    val stages = out.stageTimings.map(_._1)
    assert(stages.contains(TopicModeling.StructureAdvisoryStage),
      s"advisory missing from $stages")
    // it sits right after the hdbscan stage it qualifies, elapsed 0
    assert(stages(stages.indexOf("hdbscan") + 1) == TopicModeling.StructureAdvisoryStage)
    assert(out.stageTimings.collectFirst {
      case (TopicModeling.StructureAdvisoryStage, e) => e }.contains(0.0))
    // and the per-row contract carries it (same list replicated)
    val rowStages = out.documents.select("stage_timings_ms").head()
      .getAs[scala.collection.Seq[Row]](0).map(_.getString(0))
    assert(rowStages.contains(TopicModeling.StructureAdvisoryStage))

    // BASE-SCALE over-cap fixture (24 chunks, cap 16 -> ratio 1.5): the
    // sampled path runs but the corpus is NOT >= 10x the cap -> silent
    val docs = corpus().toDF("doc_id", "corpus", "text")
    val base = TopicModeling.run(docs, "text", "doc_id", Some("corpus"),
      TopicModeling.Config(cluster = Cluster.Config(minClusterSize = 4), maxDriverChunks = 16))
    assert(!base.stageTimings.map(_._1).contains(TopicModeling.StructureAdvisoryStage))

    // EXACT path (cap >= corpus): never emitted, whatever the fit says
    val exact = TopicModeling.run(mono, "text", "doc_id", Some("corpus"),
      TopicModeling.Config(cluster = Cluster.Config(minClusterSize = 4)))
    assert(!exact.stageTimings.map(_._1).contains(TopicModeling.StructureAdvisoryStage))
  }

  test("autoRecoverStructure: one bounded retry recovers structure on the collapsed regime only") {
    // 10 disjoint-vocabulary groups × 60 one-chunk docs over a cap of 16:
    // the first fit sees ~1.6 sample points per group and collapses (the
    // advisory's exact trigger), while the corpus genuinely holds 10
    // topics — the recoverable half of the advisory's ambiguity
    val vocab = Seq(
      "astronomy telescope galaxy nebula orbit stellar",
      "recipe flour oven butter sugar pastry",
      "football stadium referee goalkeeper tournament league",
      "violin orchestra concerto symphony maestro sonata",
      "glacier tundra permafrost fjord arctic moraine",
      "senate ballot legislature parliament statute veto",
      "enzyme protein ribosome mitochondria chromosome peptide",
      "turbine piston crankshaft carburetor axle gearbox",
      "sonnet metaphor stanza allegory prosody couplet",
      "ledger audit dividend liability equity invoice")
    val docs = (0 until 600).map { i =>
      val g = i % 10
      (i.toLong, 0, s"${vocab(g)} anchor${g}x anchor${g}y word$i")
    }.toDF("doc_id", "corpus", "text")
    val cfgBase = TopicModeling.Config(
      cluster = Cluster.Config(minClusterSize = 4), maxDriverChunks = 16)

    // without recovery: collapsed fit + advisory, no *_retry stages
    val collapsed = TopicModeling.run(docs, "text", "doc_id", Some("corpus"), cfgBase)
    assert(collapsed.nTopics <= 2, s"fixture no longer collapses: ${collapsed.nTopics}")
    assert(collapsed.stageTimings.map(_._1).contains(TopicModeling.StructureAdvisoryStage))
    assert(!collapsed.stageTimings.map(_._1).exists(_.endsWith("_retry")))

    // with recovery: the retry refits at a 10×-cap sample with
    // reduceDims >= 10 and must recover the group structure
    val recovered = TopicModeling.run(docs, "text", "doc_id", Some("corpus"),
      cfgBase.copy(autoRecoverStructure = true))
    assert(recovered.nTopics >= 5,
      s"recovery found only ${recovered.nTopics} topics for a 10-group corpus")
    val stages = recovered.stageTimings.map(_._1)
    assert(stages.contains(TopicModeling.StructureAdvisoryStage))
    for (st <- Seq("embedding_retry", "reduce_clustering_retry", "hdbscan_retry"))
      assert(stages.contains(st), s"$st missing from $stages")
    // the retry sits AFTER the advisory it answers, exactly once
    assert(stages.indexOf("embedding_retry") >
      stages.indexOf(TopicModeling.StructureAdvisoryStage))
    assert(stages.count(_ == "hdbscan_retry") == 1)

    // over-cap but NOT collapsed-regime (600 chunks / cap 100 = 6x < 10x):
    // opt-in recovery must stay silent — no advisory, no retry
    val calm = TopicModeling.run(docs, "text", "doc_id", Some("corpus"),
      cfgBase.copy(maxDriverChunks = 100, autoRecoverStructure = true))
    assert(!calm.stageTimings.map(_._1).contains(TopicModeling.StructureAdvisoryStage))
    assert(!calm.stageTimings.map(_._1).exists(_.endsWith("_retry")))
  }

  test("over-cap path is deterministic across runs") {
    val docs = corpus().toDF("doc_id", "corpus", "text")
    val cfg = TopicModeling.Config(
      cluster = Cluster.Config(minClusterSize = 4),
      maxDriverChunks = 16)
    val a = TopicModeling.run(docs, "text", "doc_id", Some("corpus"), cfg)
    val b = TopicModeling.run(docs, "text", "doc_id", Some("corpus"), cfg)
    assert(a.documents.drop("stage_timings_ms").orderBy("doc_id").collect().toSeq ==
      b.documents.drop("stage_timings_ms").orderBy("doc_id").collect().toSeq)
    assert(a.topics.orderBy("id").collect().toSeq == b.topics.orderBy("id").collect().toSeq)
    assert(a.chunkPoints == b.chunkPoints)
  }

  test("cap at or above the corpus leaves the exact path bit-identical") {
    val docs = corpus().toDF("doc_id", "corpus", "text")
    val small = TopicModeling.Config(cluster = Cluster.Config(minClusterSize = 4), maxDriverChunks = 24)
    val huge = TopicModeling.Config(cluster = Cluster.Config(minClusterSize = 4), maxDriverChunks = 1000000)
    val a = TopicModeling.run(docs, "text", "doc_id", Some("corpus"), small)
    val b = TopicModeling.run(docs, "text", "doc_id", Some("corpus"), huge)
    assert(a.chunkPoints == b.chunkPoints)
    assert(a.documents.drop("stage_timings_ms").orderBy("doc_id").collect().toSeq ==
      b.documents.drop("stage_timings_ms").orderBy("doc_id").collect().toSeq)
  }

  test("cap below the minimum reducible sample is rejected") {
    val docs = corpus().toDF("doc_id", "corpus", "text")
    intercept[IllegalArgumentException] {
      TopicModeling.run(docs, "text", "doc_id", Some("corpus"),
        TopicModeling.Config(maxDriverChunks = Reduce.MinPointsForReduction - 1))
    }
  }

  test("assign model: nearest-in-radius labels, noise beyond every radius") {
    val basis = Reduce.Basis(Array(0.0, 0.0), Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val m = ChunkAssignModel(
      basis, clusterDims = 2,
      centroids = Array(Array(0.0, 0.0), Array(10.0, 0.0)),
      radii = Array(1.0, 2.0))
    assert(m.assign(Array(0.5f, 0.0f)) == 0)
    assert(m.assign(Array(9.0f, 0.0f)) == 1)
    // within cluster 1's radius only, though equidistant logic favors it
    assert(m.assign(Array(8.5f, 0.0f)) == 1)
    // beyond both radii → noise
    assert(m.assign(Array(5.0f, 0.0f)) == Cluster.OutlierLabel)
    // empty model → everything is noise
    val empty = ChunkAssignModel(basis, 2, Array.empty, Array.empty)
    assert(empty.assign(Array(0.0f, 0.0f)) == Cluster.OutlierLabel)
  }

  test("chunkPoints aligns with the assembled documents") {
    val docs = corpus().toDF("doc_id", "corpus", "text")
    val out = TopicModeling.run(docs, "text", "doc_id", Some("corpus"))
    assert(out.chunkPoints.length == out.nChunks)
    // every label in the export is a valid topic id or the outlier label
    assert(out.chunkPoints.forall { case (_, _, l, _, _) => l >= -1 && l < out.nTopics })
    // per-doc chunk counts in the export match the chunking stage
    val perDoc = out.chunkPoints.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perDoc.values.sum == out.nChunks)
  }
}
