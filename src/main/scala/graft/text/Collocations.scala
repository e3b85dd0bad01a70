package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collocation statistics over the token stream (beyond-reference text
  * analytics; the adjacency/PMI definitions follow Church & Hanks 1990,
  * "Word Association Norms, Mutual Information, and Lexicography").
  *
  * Scale design (100 TB): ONE tokenize pass feeds one `(w1, w2)` hash
  * aggregation; the per-word margins ride '''partitioned''' windows over
  * that vocabulary-scale counts table. The grand total is the one value a
  * window cannot provide safely — bigram type counts are NOT bounded the
  * way unigram vocabularies are (tens of billions on a web corpus), so an
  * unpartitioned window would funnel the whole counts table through a
  * single partition. Instead the counts frame is locally checkpointed and
  * the total is a 1-row aggregate (map-side partial sums, 16 bytes to the
  * driver) inlined as a literal — the checkpoint makes the second
  * traversal a block read, never a second corpus scan.
  *
  * Why `localCheckpoint` and not `Dataset.persist`: a Dataset-level
  * persist registers the plan in the session's `CacheManager`, which holds
  * a strong reference until an explicit `unpersist()` — a library function
  * that persists and returns would leak one vocabulary-scale cache per
  * invocation for the session lifetime (and the CacheManager would
  * silently substitute the cached plan into unrelated queries). A local
  * checkpoint materializes plain RDD blocks with no CacheManager entry;
  * those blocks ARE released by the `ContextCleaner` once the returned
  * frame becomes unreachable. The trade-off is truncated lineage: on
  * executor loss the job fails fast instead of recomputing — acceptable
  * for a frame that is consumed promptly, and it removes the
  * nondeterministic-recompute hazard outright.
  */
object Collocations {

  /** Adjacent-bigram counts `(w1, w2, n_ab)` from one tokenize pass:
    * adjacency built ELEMENTWISE from the token array (the array zipped
    * against its 1-shifted self — document boundaries are implicit per
    * row), then ONE hash aggregate on the pair. The earlier `lead`-window
    * formulation shuffled the entire token stream through a doc-keyed
    * exchange before counting; this shape's only exchange is the
    * pair-keyed aggregation — at 100 TB that is the whole corpus not
    * crossing the wire once. */
  def bigramCounts(
      df: DataFrame,
      textCol: String,
      model: String = TokenizerModels.PlainWordsEn): DataFrame =
    df.select(explode(
        adjacentPairs(Tokenize.tokenStrings(col(textCol), model), 1, Int.MaxValue)).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))

  /** The pair list as the fused native expression ([[AdjacentPairsExpr]])
    * — the `flatten(transform(sequence, d => zip_with(slice, slice)))`
    * Column program it replaces ran CodegenFallback-interpreted per
    * document row; pair values and order are identical. */
  private def adjacentPairs(toks: Column, window: Int, maxTokens: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(AdjacentPairsExpr(
      org.apache.spark.sql.graft.Bridge.expression(toks), window, maxTokens))

  /** Pointwise mutual information per adjacent bigram:
    * `pmi = ln(n_ab * N / (n_a * n_b))` with margins `n_a = Σ_b n_ab`,
    * `n_b = Σ_a n_ab` and `N = Σ n_ab`.
    *
    * The returned frame reads a locally-checkpointed copy of the bigram
    * counts (the grand total is collected from it as a 1-row aggregate and
    * inlined as a literal — see the object scaladoc for why a global
    * window is not an option at bigram cardinalities, and why the
    * checkpoint is not a `persist`). The blocks are vocabulary-scale,
    * shared by the margins and the total, and released by the
    * ContextCleaner once the returned frame is unreferenced. */
  def bigramPmi(
      df: DataFrame,
      textCol: String,
      model: String = TokenizerModels.PlainWordsEn): DataFrame =
    pmiOverCounts(bigramCounts(df, textCol, model))

  /** Ordered co-occurrence counts within a ±`window` token context:
    * `(w1, w2, n_ab)` where `w2` follows `w1` at distance 1..`window`
    * in the same document — the classic collocation-window statistic
    * (Church & Hanks use ±5), of which [[bigramCounts]] is `window = 1`.
    * Document boundaries are implicit per input row, so no id column is
    * needed (unlike [[bigramCounts]], whose `lead` window keys on it).
    *
    * Scale design: the pair list is built ELEMENTWISE from the token
    * array (`zip_with` of the array against its d-shifted self for each
    * offset) — no per-doc window function, no positions self-join (which
    * at 100 TB would shuffle the token stream twice and explode on long
    * documents); the only exchange is the `(w1, w2)` hash aggregation.
    * The per-row pair structs are `window × len` before the explode, so
    * `maxTokensPerDoc` caps the tokens considered per document (the
    * explicit-cap `maxBucket` pattern): one pathological mega-document
    * cannot materialize a multi-GB struct array in a single task. Tokens
    * past the cap are ignored — documented truncation, like LSH's
    * bucket cap. */
  def cooccurrenceCounts(
      df: DataFrame,
      textCol: String,
      window: Int,
      model: String = TokenizerModels.PlainWordsEn,
      maxTokensPerDoc: Int = 1 << 17): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxTokensPerDoc >= 2, s"maxTokensPerDoc must be >= 2, got $maxTokensPerDoc")
    df.select(explode(
        adjacentPairs(Tokenize.tokenStrings(col(textCol), model), window, maxTokensPerDoc)).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
  }

  /** PMI over a ±`window` co-occurrence context (see
    * [[cooccurrenceCounts]]); same margins/total plan as [[bigramPmi]]. */
  def windowedPmi(
      df: DataFrame,
      textCol: String,
      window: Int,
      model: String = TokenizerModels.PlainWordsEn,
      maxTokensPerDoc: Int = 1 << 17): DataFrame =
    pmiOverCounts(cooccurrenceCounts(df, textCol, window, model, maxTokensPerDoc))

  /** Margins as partitioned windows over the checkpointed counts, total
    * as a 1-row-aggregate literal (see object scaladoc). */
  private def pmiOverCounts(counts: DataFrame): DataFrame = {
    val pc = counts.localCheckpoint(true)
    val nTotal = pc.agg(coalesce(sum("n_ab"), lit(0L))).head().getLong(0)
    val byW1 = Window.partitionBy("w1")
    val byW2 = Window.partitionBy("w2")
    pc
      .withColumn("n_a", sum(col("n_ab")).over(byW1))
      .withColumn("n_b", sum(col("n_ab")).over(byW2))
      .select(
        col("w1"), col("w2"), col("n_ab"),
        log((col("n_ab").cast("double") * lit(nTotal)) /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("pmi"))
  }
}
