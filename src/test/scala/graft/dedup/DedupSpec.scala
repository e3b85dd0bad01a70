package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup operators: planted-duplicate behavior that the all-unique synthetic
  * corpus (and hence the SQL oracles) cannot exercise. */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill " +
      "and the birds sing in the tall green trees beside the quiet river bank every single morning"

  test("exact dedup ranks copies and dropExactDuplicates keeps the first") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "something else"),
      (4L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "text", "doc_id").orderBy("doc_id")
    assert(out.select("dup_rank").as[Long].collect().toSeq == Seq(1L, 2L, 1L, 3L))
    assert(out.select("n_copies").as[Long].collect().toSeq == Seq(3L, 3L, 1L, 3L))
    val kept = Dedup.dropExactDuplicates(df, "text", "doc_id")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("normalized exact dedup collapses case/punctuation variants") {
    val df = Seq(
      (1L, "Alpha, Beta: GAMMA!"),
      (2L, "alpha beta gamma"),
      (3L, "entirely different")).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(df, "text", "doc_id", normalized = true)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("minhash signature is deterministic and sized") {
    val s1 = Dedup.minHashSignature(base, 128, 3, 42L)
    val s2 = Dedup.minHashSignature(base, 128, 3, 42L)
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == 128)
    assert(Dedup.minHashSignature("", 16, 3, 42L).forall(_ == Long.MaxValue))
  }

  test("minhash LSH finds planted near-duplicate, not unrelated text") {
    val nearDup = base.replace("lazy dog", "sleepy dog") // 2 tokens changed
    val unrelated =
      "completely distinct subject matter about databases indexes partitions " +
        "shuffles joins aggregations filters projections scans and columnar storage formats"
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup
      .nearDuplicates(df, "text", "doc_id", numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("join-shape minhash near-dups equal the fused shape exactly") {
    // same signatures, same candidates, same estimator — the two shapes
    // differ only in shuffle algebra (SCALING.md: the fused shape ships
    // signatures on every band row; the join shape checkpoints them once)
    val nearDup = base.replace("lazy dog", "sleepy dog")
    val unrelated =
      "completely distinct subject matter about databases indexes partitions " +
        "shuffles joins aggregations filters projections scans and columnar storage formats"
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, base + " extra"))
      .toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val fused = rows(Dedup.nearDuplicates(df, "text", "doc_id",
      numHashes = 64, bands = 16, threshold = 0.25))
    val joined = rows(Dedup.nearDuplicatesViaJoin(df, "text", "doc_id",
      numHashes = 64, bands = 16, threshold = 0.25))
    assert(fused.nonEmpty && fused == joined)
  }

  test("simhash: identical → distance 0; near-dup small; unrelated large") {
    val nearDup = base.replace("lazy", "sleepy")
    assert(Dedup.simHash64(base) == Dedup.simHash64(base))
    val dNear = java.lang.Long.bitCount(Dedup.simHash64(base) ^ Dedup.simHash64(nearDup))
    assert(dNear <= 8, s"near-dup hamming $dNear")
    val df = Seq((1L, base), (2L, base), (3L, "xyzzy plugh quux")).toDF("doc_id", "text")
    val out = Dedup
      .simHashNearDuplicates(df, "text", "doc_id", maxDistance = 3)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(out == Set((1L, 2L)))
  }

  test("embedding-cosine near-dup finds the planted near-identical vector") {
    def unit(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rnd = new scala.util.Random(21)
    val base = Array.fill(32)(rnd.nextGaussian().toFloat)
    val rows = (0L until 50L).map(i => (i, unit(Array.fill(32)(rnd.nextGaussian().toFloat)))) ++
      Seq((100L, unit(base)), (101L, unit(base.map(_ + 0.005f))))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Dedup
      .embeddingNearDuplicates(df, "embedding", "vec_id", threshold = 0.99, tables = 12, bits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)), s"got $pairs")
  }

  test("jaccard pairs compute exact token-set similarity within buckets") {
    val df = Seq(
      (1L, "a b c d", "g1"),
      (2L, "a b c e", "g1"), // |∩|=3, |∪|=5 → 0.6
      (3L, "a b c d", "g2")  // exact copy of 1 but different bucket → no pair
    ).toDF("doc_id", "text", "grp")
    val out = Dedup
      .jaccardPairs(df, "text", "doc_id", col("grp"), threshold = 0.0)
      .as[(Long, Long, Double)]
      .collect()
      .toSeq
    assert(out == Seq((1L, 2L, 0.6)))
  }

  test("edit-distance pairs: typo variants pair up, reorderings score > 0, buckets isolate") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "g1"),
      (2L, "the quikc brown fox jumps over the lazy dog", "g1"), // transposition: dist 2
      (3L, "the quick brown fox jumps over the dog lazy", "g1"), // same tokens, reordered (dist 8)
      (4L, "the quick brown fox jumps over the lazy dog", "g2"), // exact copy, other bucket
      (5L, "completely unrelated text about spark plans!", "g1")
    ).toDF("doc_id", "text", "grp")
    val out = Dedup
      .editDistancePairs(df, "text", "doc_id", col("grp"), maxDistance = 30)
      .as[(Long, Long, Long)]
      .collect()
      .sorted
      .toSeq
    // (1,2) typo pair; (1,3)/(2,3) reordering distances ≤ 30; never cross-bucket
    assert(out.map(p => (p._1, p._2)).contains((1L, 2L)))
    assert(out.find(p => p._1 == 1L && p._2 == 2L).get._3 == 2L)
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!out.exists(p => p._1 == 5L || p._2 == 5L))
    // Jaccard scores the reordering as identical (1.0); edit distance
    // tells them apart — the tier's reason to exist
    val j = Dedup.jaccardPairs(df.filter(col("doc_id").isin(1L, 3L)), "text", "doc_id",
      col("grp"), threshold = 0.0).as[(Long, Long, Double)].collect()
    assert(j.toSeq == Seq((1L, 3L, 1.0)))
    assert(out.find(p => p._1 == 1L && p._2 == 3L).get._3 > 0L)
  }

  test("edit-distance pairs: banded join produces every qualifying pair exactly once") {
    // lengths straddle the band boundaries (band width = maxDistance+1 = 4):
    // same-band, adjacent-band and cross-band (>k apart, must NOT pair)
    // combinations all present; brute force is the ground truth
    val k = 3
    val texts = Seq(
      1L -> "aa",          // len 2, band 0
      2L -> "aab",         // len 3, band 0
      3L -> "aabb",        // len 4, band 1 — adjacent to band 0, dist(2,3)=1
      4L -> "aabbccd",     // len 7, band 1
      5L -> "aabbccdd",    // len 8, band 2 — adjacent to band 1, dist(4,5)=1
      6L -> "zzzzzzzzzzzz", // len 12, band 3 — pairs with nothing (len gap > k)
      7L -> "aabbccde"     // len 8, band 2 — dist(5,7)=1, same band
    )
    val df = texts.map { case (id, t) => (id, t, "g") }.toDF("doc_id", "text", "grp")
    val got = Dedup.editDistancePairs(df, "text", "doc_id", col("grp"), maxDistance = k)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, ta) <- texts; (ib, tb) <- texts
      if ia < ib && math.abs(ta.length - tb.length) <= k
      dist = lev(ta, tb) if dist <= k
    } yield (ia, ib, dist.toLong)).sorted
    assert(got == want, s"got=$got want=$want")
    assert(got.size == got.distinct.size, "pair emitted more than once")
  }

  test("snapshotDiff: all four statuses; null and empty text hash alike") {
    import spark.implicits._
    val yesterday = Seq(
      (1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]), (4L, "d")
    ).toDF("doc_id", "text")
    val today = Seq(
      (1L, "a"),   // identical → unchanged
      (2L, "B"),   // content moved → changed
      (3L, ""),    // null yesterday, empty today: same coalesced hash → unchanged
      (5L, "e")    // new id → added; 4 is gone → removed
    ).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(yesterday, today)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
  }
}
