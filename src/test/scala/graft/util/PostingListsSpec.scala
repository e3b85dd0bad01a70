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

  test("capped collect equals plain collect_list below the cap, marker above") {
    // many partitions so partial buffers merge across tasks: the
    // no-partial-truncation-below-the-bound property is what's pinned
    val rows = spark.range(0, 1000, 1, 16)
      .select((col("id") % 7).as("k"), col("id"))
    val capped = rows.groupBy("k")
      .agg(CollectListCapped.collectListCapped(col("id"), 200).as("m"))
      .select(col("k"), size(col("m")).as("n"), col("m"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2).toSet)).toMap
    val plain = rows.groupBy("k").agg(collect_list(col("id")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // 1000/7 ≈ 143 ≤ 200: every bucket is under the cap and must match
    // collect_list exactly (as a set — list order is nondeterministic)
    plain.foreach { case (k, want) =>
      val (n, got) = capped(k)
      assert(n == want.size && got == want, s"bucket $k diverges")
    }
    // over the cap: exactly cap+1 elements surface (the truncation marker)
    val over = rows.groupBy(lit(1).as("k"))
      .agg(CollectListCapped.collectListCapped(col("id"), 50).as("m"))
      .select(size(col("m"))).head().getInt(0)
    assert(over == 51, s"marker must be cap+1, got $over")
  }

  test("bruteForceTopK with k = 0 returns an empty frame, not a crash") {
    val vecs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = graft.similarity.Similarity.bruteForceTopK(vecs, vecs, k = 0)
    assert(out.count() == 0)
  }
}
