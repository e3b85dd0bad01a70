package graft

import org.apache.spark.sql.DataFrame

/** Regression guards for the plan shapes the 100 TB design depends on —
  * these pin the *physical* properties (scan counts, join-free shapes,
  * codegen'd expressions) that bench numbers alone would only catch as
  * slow drift. Runs against the read-only sf0.001 fixture tables. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The static physical plan (pre-AQE). Structural shape — subtree
    * counts, join-freedom, codegen'd expressions — is what these guards
    * pin; runtime exchange reuse may dedupe further but is AQE's business,
    * not a property our code should have to lean on. */
  private def finalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(plan: String, needle: String): Int =
    needle.r.findAllIn(plan).length

  test("keyness is one scan, no joins — totals ride a window over the counts table") {
    val plan = finalPlan(SparkEntry.queries("q_keyness_en_rest")(spark, dir))
    assert(count(plan, "FileScan parquet") == 1, plan)
    assert(!plan.contains("Join"), "keyness must not join — totals are window aggregates")
  }

  test("jaccard pairs tokenize the corpus exactly once (posting-list shape)") {
    val plan = finalPlan(SparkEntry.queries("q_jaccard_pairs")(spark, dir))
    assert(count(plan, "FileScan parquet") == 1, plan)
    assert(count(plan, "tokenize_plain_words") == 1, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "pair generation must stay join-free")
  }

  test("tokenize runs as the native codegen expression, not a ScalaUDF") {
    val plan = finalPlan(SparkEntry.queries("q_tokenize_tokens")(spark, dir))
    assert(plan.contains("tokenize_plain_words"), plan)
    assert(!plan.contains("ScalaUDF"), "plain tokenize must not fall back to a UDF")
  }

  test("c-TF-IDF and rollup tokenize the corpus exactly once (lazy one-pass shapes)") {
    val ctfidf = finalPlan(SparkEntry.queries("q_ctfidf_topk")(spark, dir))
    assert(count(ctfidf, "tokenize_plain_words") == 1, ctfidf)
    assert(count(ctfidf, "FileScan parquet") == 1, ctfidf)
    val rollup = finalPlan(SparkEntry.queries("q_topic_rollup")(spark, dir))
    assert(count(rollup, "tokenize_plain_words") == 1, rollup)
    assert(count(rollup, "FileScan parquet") == 1, rollup)
  }

  test("simhash near-dups scan and fingerprint the corpus once") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.dedup.Dedup.simHashNearDuplicates(docs, "text", "doc_id")
    val plan = finalPlan(pairs)
    assert(count(plan, "FileScan parquet") == 1, plan)
  }

  test("minhash LSH pairs scan and sign the corpus once, join-free") {
    val plan = finalPlan(SparkEntry.queries("q_minhash_pairs")(spark, dir))
    assert(count(plan, "FileScan parquet") == 1, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "LSH pair generation must stay join-free")
    // map-side verify: the dedup aggregate carries the score, not arrays
    assert(!plan.contains("SortAggregate"),
      "pair dedup must be a hash aggregate (no array buffers)")
  }

  test("bigram PMI tokenizes the corpus once; margins are windows, not joins") {
    val plan = finalPlan(SparkEntry.queries("q_bigram_pmi")(spark, dir))
    assert(count(plan, "FileScan parquet") == 1, plan)
    assert(count(plan, "tokenize_plain_words") == 1, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "margins and totals must ride windows over the one aggregation")
  }

  test("region revenue joins the dim chain by broadcast only") {
    val plan = finalPlan(SparkEntry.queries("q_region_revenue")(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      "dimension chain must broadcast; only the fact join may shuffle")
    assert(count(plan, "BroadcastHashJoin") >= 3, plan)
  }

  test("cleaning pipeline is one scan and one content-digest shuffle") {
    val plan = finalPlan(SparkEntry.queries("q_clean_pipeline")(spark, dir))
    assert(count(plan, "FileScan parquet") == 1, plan)
    // one hash exchange (the dedup window on the digest) + the
    // deterministic-output range exchange for the final sort
    assert(count(plan, "Exchange hashpartitioning") == 1, plan)
    assert(!plan.contains("Join"), "quality gate and lang-id must stay map-side")
  }

  test("filters push down to the parquet scan under derived text columns") {
    import org.apache.spark.sql.functions._
    val q = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), graft.text.TextFunctions.cleanText(col("text")).as("cleaned"))
    val plan = finalPlan(q)
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"), plan)
  }
}
