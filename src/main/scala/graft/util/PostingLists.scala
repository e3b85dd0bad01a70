package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared posting-list machinery for the self-similarity operators
  * (Jaccard, MinHash-LSH, SimHash, embedding-LSH): group rows by a bucket
  * key, collect each bucket's member structs, and expand candidate pairs
  * *within* the list — one pass over the input, no self-join.
  *
  * Bucket bound: `collect_list` materializes a bucket into ONE row, which
  * is unspillable — a mega-bucket (e.g. millions of exact duplicates whose
  * identical signatures land every copy in the same LSH bucket) would
  * build a multi-GB row and OOM where a streaming join would have
  * spilled. `members` therefore drops buckets larger than `maxBucket`
  * BEFORE collecting (the size check is a window count sharing the
  * groupBy's hash partitioning — no extra shuffle). This is an explicit,
  * documented cap, not a silent one: oversized buckets are
  * near-universal-similarity clusters that belong to `exactDedup` (run it
  * first), and `maxBucket` is a parameter on every public operator for
  * corpora that legitimately need bigger buckets. */
object PostingLists {

  /** Default bucket cap: 4096 members ≈ 4 MB/row at a 1 KB payload
    * (a 128-hash MinHash signature) — safely under row-buffer limits
    * while far above any honest near-dup bucket. */
  val DefaultMaxBucket: Int = 4096

  /** `keys* → members: Array[Struct]` with buckets over `maxBucket`
    * dropped. The payload struct MUST carry the pair id as a field named
    * `id` for [[pairs]] to order on. */
  def members(
      df: DataFrame,
      keys: Seq[Column],
      payload: Column,
      maxBucket: Int): DataFrame = {
    val sized = df.withColumn("bucket_n", count(lit(1)).over(Window.partitionBy(keys: _*)))
    sized
      .filter(col("bucket_n") <= maxBucket)
      .groupBy(keys: _*)
      .agg(collect_list(payload).as("members"))
  }

  /** Distinct unordered pairs within each members list: rows `(a, b)` with
    * `a.id < b.id`. Row blowup is bounded by `maxBucket`²/2: the second
    * explode walks only the list suffix after the first element's position
    * (`slice`), generating each unordered pair exactly once instead of
    * producing both orderings and filtering half away; the id comparison
    * then only canonicalizes direction (list order is nondeterministic). */
  def pairs(members: DataFrame): DataFrame = {
    val x = col("__x")
    val y = col("__y")
    members
      .select(posexplode(col("members")).as(Seq("__i", "__x")), col("members"))
      .select(x, explode(slice(col("members"), col("__i") + lit(2), size(col("members")))).as("__y"))
      .select(
        when(x.getField("id") < y.getField("id"), x).otherwise(y).as("a"),
        when(x.getField("id") < y.getField("id"), y).otherwise(x).as("b"))
  }
}
