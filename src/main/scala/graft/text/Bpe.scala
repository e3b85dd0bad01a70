package graft.text


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-learning stage a large-scale training-data pipeline runs
  * before tokenizing a corpus. The reference ships pre-trained tokenizer
  * backends only (`/root/reference/src/tokenizer.rs:40-208`); learning the
  * subword vocabulary FROM the corpus is the upstream operation this
  * engine adds for the 100 TB pipeline tier.
  *
  * Semantics (pinned by `BpeSpec` and the DuckDB oracle):
  *   - pre-tokenize with `native:plain_words_en` (lowercase, punct
  *     removed) — the same token stream every other corpus operator uses;
  *   - a word's initial symbols are its Unicode code points;
  *   - each round counts adjacent symbol pairs weighted by word frequency,
  *     merges the argmax pair (ties: count DESC, then left symbol ASC,
  *     then right symbol ASC — binary string order), and rewrites every
  *     word's symbol sequence by the greedy LEFT-TO-RIGHT non-overlapping
  *     merge walk (position i matches ⇒ skip to i+2; merged output is not
  *     re-scanned within the round — Sennrich's `re.sub` semantics).
  *
  * Scale design (100 TB): the corpus is scanned ONCE — a single
  * tokenize → explode → hash-aggregate shuffle builds the compact
  * `(word, cnt)` table, which is `localCheckpoint`ed so no training round
  * ever re-touches the corpus. Every round then runs entirely on that
  * vocabulary table (natural-language vocabularies are ≤ tens of millions
  * of rows at any corpus size — corpus-INDEPENDENT, not
  * corpus-proportional): one distributed pair-count aggregate plus a
  * 1-row argmax collect (a bounded driver action, like the rate-table and
  * quantile collects elsewhere in this repo). Lineage is truncated with a
  * `localCheckpoint` every [[CheckpointEvery]] rounds so plan depth stays
  * bounded at any merge count.
  */
object Bpe {

  /** Rounds between lineage-truncating checkpoints of the vocab table. */
  val CheckpointEvery = 8

  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** One corpus scan: `(word, cnt)` with `cnt` the corpus-wide occurrence
    * count of the pre-tokenized word. */
  def wordCounts(
      docs: DataFrame,
      textCol: String,
      model: String = TokenizerModels.PlainWordsEn): DataFrame =
    docs
      .select(explode(Tokenize.tokenStrings(col(textCol), model)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** The canonical padded symbol string: `' ' + symbols.mkString("  ") +
    * ' '` — symbols double-space-separated, single space at both ends.
    * With this invariant, `replace(s, " a  b ", " ab ")` (left-to-right,
    * non-overlapping, no rescan of replaced text — both Spark's
    * `StringReplace` and DuckDB's `replace`) IS the greedy BPE merge walk:
    * adjacent matches cannot share a character because interior
    * separators are two spaces and the pattern consumes one from each
    * side. `BpeSpec` pins this equivalence against a reference array
    * walk. */
  private def canon(symsArr: Column): Column =
    concat(lit(" "), array_join(symsArr, "  "), lit(" "))

  private def syms(s: Column): Column = split(trim(s), " +")

  /** Candidates fetched per pair-count job. Each job collects the top
    * [[BatchK]] pairs and applies the longest PROVABLY-exact prefix (see
    * [[safePrefix]]), cutting driver round-trips ~3-6× on natural-language
    * vocabularies while reproducing the strict one-merge-at-a-time
    * semantics bit-for-bit (`BpeSpec` pins batched == unbatched). */
  val BatchK = 16

  /** Longest prefix of the ranked candidate list `L` (sorted by the merge
    * total order: count DESC, lhs ASC, rhs ASC) that can be applied as a
    * block while remaining EXACTLY equal to sequential argmax training.
    * `tailBounded` = the list was truncated at BatchK, so unlisted pairs
    * have count ≤ the list's last count.
    *
    * A candidate Pi = (a,b,c) after already-accepted merges with symbol
    * set S (lhs, rhs, and merged strings) is safe iff:
    *   1. {a,b} ∩ S = ∅ — its count is unchanged by the accepted merges
    *      (a merge of (x,y) only touches pairs overlapping an "x y" site);
    *   2. if tailBounded: c > cLast — every unlisted pair, and every NEW
    *      pair an accepted merge creates from an unlisted contributor
    *      (count(u, xy) ≤ old count(u, x)), stays strictly below c;
    *   3. no LATER list entry sharing a symbol with S has count ≥ c —
    *      later contributors bound the new/decreased pairs; earlier ones
    *      sharing a symbol already stopped the walk at rule 1 (their
    *      post-merge counts are unknowable, so the walk cannot skip them).
    * Together these make Pi the strict unique argmax at its step, so the
    * block application (merges are pairwise symbol-disjoint and therefore
    * commute) equals the sequential walk. */
  private[text] def safePrefix(
      L: IndexedSeq[(String, String, Long)], tailBounded: Boolean, maxTake: Int): Int = {
    if (L.isEmpty) return 0
    val cLast = L.last._3
    var s = Set.empty[String]
    var n = 0
    var stop = false
    while (n < L.length && n < maxTake && !stop) {
      val (a, b, c) = L(n)
      if (n == 0) { s = Set(a, b, a + b); n = 1 }
      else if (s(a) || s(b)) stop = true
      else if (tailBounded && c <= cLast) stop = true
      else if (L.drop(n + 1).exists { case (x, y, c2) => (s(x) || s(y)) && c2 >= c })
        stop = true
      else { s = s ++ Set(a, b, a + b); n += 1 }
    }
    n
  }

  /** Learn `numMerges` merges from a `(word, cnt)` table. Returns the
    * ranked merges and the final vocabulary `(word, cnt, s)` with `s` the
    * padded symbol string (see [[canon]]). Stops early if no adjacent
    * pair remains. One distributed pair-count job per BATCH (not per
    * merge): the top-[[BatchK]] collect is a bounded driver action and
    * [[safePrefix]] proves which prefix preserves exact sequential
    * semantics, so job count ≈ numMerges / meanBatch. */
  def train(words: DataFrame, numMerges: Int, batchK: Int = BatchK): (Seq[Merge], DataFrame) = {
    var w = words
      .select(col("word"), col("cnt"),
        canon(split(col("word"), "")).as("s"))
      .localCheckpoint() // corpus scan happens exactly once, here
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    var sinceCheckpoint = 0
    while (rank <= numMerges && !exhausted) {
      val top = w
        .select(col("cnt"),
          explode(adjacentSymbolPairs(syms(col("s")))).as("p"))
        .groupBy(col("p.w1").as("a"), col("p.w2").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .limit(batchK)
        .collect() // ≤ batchK rows: the candidate block — bounded driver action
      if (top.isEmpty) exhausted = true
      else {
        val L = top.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toIndexedSeq
        val take = safePrefix(L, tailBounded = L.length == batchK, numMerges - rank + 1)
        val block = L.take(take)
        block.zipWithIndex.foreach { case ((a, b, c), i) => merges += Merge(rank + i, a, b, c) }
        // symbol-disjoint replaces commute and each preserves the padded
        // canonical form, so one chained pass applies the whole block
        val replaced = block.foldLeft(col("s")) { case (acc, (a, b, _)) =>
          replace(acc, lit(s" $a  $b "), lit(s" ${a + b} "))
        }
        w = w.select(col("word"), col("cnt"), canon(syms(replaced)).as("s"))
        rank += take
        sinceCheckpoint += 1
        if (sinceCheckpoint >= CheckpointEvery) { w = w.localCheckpoint(); sinceCheckpoint = 0 }
      }
    }
    (merges.result(), w)
  }

  /** Adjacent `(w1, w2)` symbol pairs — the native codegen'd
    * [[AdjacentPairsExpr]] at window 1, uncapped (symbol sequences are
    * word-length-bounded). */
  private def adjacentSymbolPairs(symsArr: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      AdjacentPairsExpr(
        org.apache.spark.sql.graft.Bridge.expression(symsArr), 1, Int.MaxValue))

  /** Ranked merge table: `(rank, lhs, rhs, merged, pair_count)`. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges
      .map(m => (m.rank.toLong, m.lhs, m.rhs, m.lhs + m.rhs, m.count))
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Final subword inventory over the trained vocabulary:
    * `(token, total_count, n_occurrences)` — `total_count` weighted by
    * word frequency, `n_occurrences` the number of (word, position) slots
    * the symbol fills. */
  def vocabulary(trained: DataFrame): DataFrame =
    trained
      .select(col("cnt"), explode(syms(col("s"))).as("token"))
      .groupBy("token")
      .agg(sum("cnt").as("total_count"), count(lit(1)).as("n_occurrences"))

  /** Encode a document column with the trained vocabulary: each
    * pre-tokenized word is replaced by its learned symbol sequence, in
    * word order. Returns `(docIdCol, n_tokens, token_str)` per document
    * that has ≥1 token. The join is on the compact vocab table (broadcast
    * below the auto threshold; a plain shuffle join above — either way
    * the corpus is scanned once). */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      trained: DataFrame,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    val wn = trained.select(
      col("word"),
      array_join(syms(col("s")), " ").as("sym_str"),
      size(syms(col("s"))).cast("long").as("n_sym"))
    docs
      .select(col(idCol),
        posexplode(Tokenize.tokenStrings(col(textCol), model)).as(Seq("pos", "word")))
      .join(wn, "word")
      .groupBy(idCol)
      .agg(
        sum("n_sym").as("n_tokens"),
        // array_sort on struct<pos, token> orders by pos; the native
        // TokenStringsExpr then projects the per-word symbol strings
        // (field is aliased "token" to reuse the codegen'd extractor)
        array_join(
          org.apache.spark.sql.graft.Bridge.column(
            TokenStringsExpr(
              org.apache.spark.sql.graft.Bridge.expression(
                array_sort(collect_list(struct(col("pos"), col("sym_str").as("token"))))))),
          " ").as("token_str"))
  }

  /** Memo of trained models per (session, data dir, model, k): training is
    * deterministic, so the three BPE query surfaces share one trained
    * model the way a real pipeline would (train once, then inspect /
    * export / encode). The vocab table is checkpointed, so the memo holds
    * materialized blocks, not live lineage.
    *
    * BOUNDED (LRU, max [[MemoMaxEntries]]): each entry pins
    * localCheckpoint'd executor blocks, so an unbounded map would
    * accumulate unreclaimable storage across sessions/dirs in long-lived
    * processes (the test suite, a notebook). Evicted entries merely drop
    * the reference — the ContextCleaner frees the checkpoint blocks once
    * the DataFrame is unreachable, and a re-request simply retrains. */
  private val MemoMaxEntries = 8
  private val memo =
    new java.util.LinkedHashMap[(SparkSession, String, String, Int), (Seq[Merge], DataFrame)](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String, Int), (Seq[Merge], DataFrame)]): Boolean =
        size() > MemoMaxEntries
    }

  def trainedFor(
      spark: SparkSession,
      dir: String,
      docs: => DataFrame,
      textCol: String,
      numMerges: Int,
      model: String = TokenizerModels.PlainWordsEn): (Seq[Merge], DataFrame) =
    memo.synchronized {
      val key = (spark, dir, model, numMerges)
      val hit = memo.get(key)
      if (hit != null) hit
      else {
        val (m, w) = train(wordCounts(docs, textCol, model), numMerges)
        val v = (m, w.localCheckpoint())
        memo.put(key, v)
        v
      }
    }
}
