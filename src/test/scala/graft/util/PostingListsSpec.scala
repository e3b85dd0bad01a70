package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PostingListsSpec extends SparkSpec {

  import spark.implicits._

  test("pairs come from within buckets only; oversized buckets are dropped") {
    // bucket "big" has 5 members (over the cap of 4), "ok" has 3
    val rows = ((1L to 5L).map(i => (i, "big")) ++ (10L to 12L).map(i => (i, "ok")))
      .toDF("id", "bucket")
    val pairs = PostingLists
      .pairs(PostingLists.members(rows, Seq(col("bucket")), struct(col("id")), maxBucket = 4))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L), (10L, 12L), (11L, 12L)), s"got $pairs")
  }

  test("minhash near-dup survives a mega-duplicate cluster via the bucket cap") {
    // 60 identical docs would form one bucket of 60 in every band; with the
    // cap below that, the operator completes and reports no pairs instead
    // of materializing the cluster (exactDedup's job) into one row
    val dupes = (0L until 60L).map(i => (i, "the same text repeated verbatim"))
    val out = graft.dedup.Dedup.nearDuplicates(
      dupes.toDF("doc_id", "text"), "text", "doc_id", numHashes = 16, bands = 4, maxBucket = 50)
    assert(out.count() == 0)
    // ...and with the cap above the cluster size the pairs all surface
    val full = graft.dedup.Dedup.nearDuplicates(
      dupes.toDF("doc_id", "text"), "text", "doc_id", numHashes = 16, bands = 4, maxBucket = 100)
    assert(full.count() == 60L * 59L / 2L)
  }

  test("bruteForceTopK with k = 0 returns an empty frame, not a crash") {
    val vecs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = graft.similarity.Similarity.bruteForceTopK(vecs, vecs, k = 0)
    assert(out.count() == 0)
  }
}
