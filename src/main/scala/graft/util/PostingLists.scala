package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared posting-list machinery for the self-similarity operators
  * (Jaccard, MinHash-LSH, SimHash, embedding-LSH): group rows by a bucket
  * key, collect each bucket's member structs, and expand candidate pairs
  * *within* the list — one pass over the input, no self-join.
  *
  * Bucket bound: a plain `collect_list` materializes a bucket into ONE
  * row, which is unspillable — a mega-bucket (e.g. millions of exact
  * duplicates whose identical signatures land every copy in the same LSH
  * bucket) would build a multi-GB row and OOM where a streaming join
  * would have spilled. `members` therefore collects through
  * [[CollectListCapped]], whose buffers stop growing at `maxBucket + 1`
  * elements, and drops the truncation-marker lists — oversized buckets
  * never exist in memory at all. This is an explicit, documented cap,
  * not a silent one: oversized buckets are near-universal-similarity
  * clusters that belong to `exactDedup` (run it first), and `maxBucket`
  * is a parameter on every public operator for corpora that legitimately
  * need bigger buckets. */
object PostingLists {

  /** Default bucket cap: 4096 members ≈ 4 MB/row at a 1 KB payload
    * (a 128-hash MinHash signature) — safely under row-buffer limits
    * while far above any honest near-dup bucket. */
  val DefaultMaxBucket: Int = 4096

  /** `keys* → members: Array[Struct]` with buckets over `maxBucket`
    * dropped. The payload struct MUST carry the pair id as a field named
    * `id` for [[pairs]] to order on. Keys must be named columns
    * resolvable on `df` (every self-similarity caller passes plain
    * `col(...)` refs).
    *
    * Cap mechanics (the r14→r15 superlinearity fix): the bound lives
    * INSIDE the aggregate — [[CollectListCapped]] stops a bucket's
    * buffer at `maxBucket + 1` elements, and oversized buckets surface
    * as `maxBucket + 1`-length truncation markers this filter drops.
    * The prior window count shared the groupBy's partitioning but
    * forced a full SORT of every band row inside the exchange —
    * per-partition sort state that measured slope 1.20 in the 10×→100×
    * decade once it outgrew memory (SCALING.md, single-box spill). Now
    * the plan is the groupBy exchange alone: no sort, no second scan,
    * map-side partials that ship at most `maxBucket + 1` elements per
    * bucket, and mega-buckets bounded in MEMORY as well as rows. */
  def members(
      df: DataFrame,
      keys: Seq[Column],
      payload: Column,
      maxBucket: Int): DataFrame =
    // repartition-first: rows cross the wire raw and the partial+final
    // aggregate pair fuses into the post-shuffle stage. Letting the
    // planner map-side-partial a collect aggregate is strictly worse —
    // collection partials compact nothing (every element still crosses
    // the wire) and pay buffer serialization plus a SECOND sort-fallback
    // pass on the reduce side.
    df.repartition(keys: _*)
      .groupBy(keys: _*)
      .agg(CollectListCapped.collectListCapped(payload, maxBucket).as("members"))
      .filter(size(col("members")) <= maxBucket)

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
