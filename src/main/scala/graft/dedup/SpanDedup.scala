package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{PlainBackend, ShingleKeysExpr, TextAnalysis, Tokenize, TokenizerModels}

/** Cross-document exact SPAN deduplication with document reassembly —
  * the "repeated substring" scrub of modern pretraining pipelines (C4
  * removed repeated three-sentence spans; Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", removes
  * repeated token substrings corpus-wide): every non-overlapping
  * `spanWords`-token span that occurred anywhere earlier in the corpus
  * (first occurrence by `(id, span_no)` order) is dropped, and each
  * document is rebuilt from its surviving spans.
  *
  * Scale design (100 TB): spans are built ELEMENTWISE from the token
  * array (`transform` over an index `sequence` + `slice` — no explode →
  * group round-trip), so the operator is exactly TWO exchanges: the
  * span-keyed window that picks global first occurrences, and the
  * doc-keyed reassembly. Exact-duplicate mega-spans concentrate on one
  * key only in proportion to their duplication count — the same bound
  * as exact dedup's digest key — and a span is ~10 tokens, so the
  * shuffled payload is the corpus itself, once. Suffix-array substring
  * dedup finds arbitrary-offset repeats that this fixed-stride variant
  * misses; the trade is a distributed two-shuffle plan against an
  * inherently sequential index build. */
object SpanDedup {

  /** `(id, n_spans, n_kept, text_deduped)` — documents rebuilt from the
    * spans surviving the corpus-wide first-occurrence filter; a document
    * whose every span was seen before comes back empty (and a document
    * with no tokens stays empty, with zero spans). */
  def dropRepeatedSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      spanWords: Int = 10,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(spanWords > 0, s"spanWords must be positive, got $spanWords")
    val toks = Tokenize.tokenStrings(col(textCol), model)
    // last span index = floor((n-1)/k); guard n = 0 — Spark's sequence()
    // RUNS BACKWARDS for start > stop, so sequence(0, -1) is [0, -1],
    // not empty
    val spanArr = when(size(toks) > 0,
      transform(
        sequence(lit(0), floor((size(toks) - lit(1)) / lit(spanWords)).cast("int")),
        i => array_join(slice(toks, i * spanWords + 1, lit(spanWords)), " ")))
      .otherwise(array().cast("array<string>"))
    val spans = df.select(
      col(idCol),
      // _outer: token-less docs keep their output row (null span)
      posexplode_outer(spanArr).as(Seq("span_no", "span")))
    val firstSeen = Window.partitionBy("span").orderBy(idCol, "span_no")
    spans
      .withColumn("rk", when(col("span").isNull, lit(1))
        .otherwise(row_number().over(firstSeen)))
      .groupBy(col(idCol))
      .agg(
        count(col("span")).as("n_spans"),
        count(when(col("rk") === 1, col("span"))).as("n_kept"),
        array_join(
          transform(
            // the when's null branch is dropped by collect_list, so only
            // surviving spans enter the rebuild
            array_sort(collect_list(when(col("rk") === 1 && col("span").isNotNull,
              struct(col("span_no"), col("span"))))),
            s => s.getField("span")),
          " ").as("text_deduped"))
  }

  /** Arbitrary-offset repeated-substring dedup — the stride-1 upgrade of
    * [[dropRepeatedSpans]] (which only sees spans on a fixed k-token
    * grid): EVERY k-token shingle (offsets 0..n−k) is keyed, the global
    * first occurrence (by `(id, start)` order) of each distinct shingle
    * is kept, and every token position covered by a NON-first occurrence
    * is dropped — Lee et al. 2022's repeated-substring semantics with a
    * greedy first-occurrence keep rule. A position inside the kept first
    * occurrence can still be eroded by a different duplicated shingle
    * overlapping it; the rule is positional, which is what makes it
    * deterministic and exactly re-derivable relationally.
    *
    * Scale design (100 TB): shingle keys are 64-bit FNV-1a hashes of the
    * joined tokens, built ELEMENTWISE from the token array — the span-key
    * window shuffles `(id, start, key)` triples (8-byte keys, never
    * shingle text). Reassembly needs each document's token array once, so
    * a second scan contributes sentinel `(id, toks)` rows by UNION below
    * the window — the union rides INTO the doc-keyed aggregation, keeping
    * the operator at exactly TWO exchanges (span-key window + doc-key
    * rebuild), join-free; a re-scan is a parallel read, a third shuffle
    * is not. Covered positions expand dup starts to intervals
    * (≤ k·n_dups temp cells per row) and drop them by hash
    * `array_except` — no per-position linear scans. Hash collisions can
    * only FALSELY drop a span (never resurrect one); at 64 bits the
    * corpus-pair collision rate is the MinHash tier's accepted bound. */
  def dropRepeatedShingles(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleWords: Int = 8,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(shingleWords > 0, s"shingleWords must be positive, got $shingleWords")
    val k = shingleWords
    val toks = Tokenize.tokenStrings(col(textCol), model)

    // (id, start, key) for offsets 0..n-k; docs shorter than k contribute
    // no shingle rows.
    val keys = shingleKeyCol(textCol, k, model)
    val shingles = df.select(col(idCol), posexplode(keys).as(Seq("start", "key")))

    val firstSeen = Window.partitionBy("key").orderBy(idCol, "start")
    val ranked = shingles
      .withColumn("rk", row_number().over(firstSeen))
      .select(col(idCol), col("start"),
        col("rk"), lit(null).cast("array<string>").as("toks"))

    // sentinel rows carry the token arrays into the SAME doc-keyed
    // aggregation (start = -1 keeps them out of the shingle counts)
    val sentinels = df.select(
      col(idCol), lit(-1).as("start"), lit(0).as("rk"), toks.as("toks"))

    val agg = ranked.unionByName(sentinels)
      .groupBy(col(idCol))
      .agg(
        // exactly one non-null toks row per id → deterministic first()
        first(col("toks"), ignoreNulls = true).as("toks"),
        count(when(col("start") >= 0, 1)).as("n_shingles"),
        count(when(col("rk") > 1, 1)).as("n_dup"),
        sort_array(collect_list(when(col("rk") > 1, col("start")))).as("dstarts"))

    val covered = array_distinct(flatten(transform(
      col("dstarts"), s => sequence(s, s + lit(k - 1)))))
    val keptPos = when(size(col("toks")) > 0,
      array_except(sequence(lit(0), size(col("toks")) - 1), covered))
      .otherwise(array().cast("array<int>"))
    agg.select(
      col(idCol),
      size(col("toks")).cast("long").as("n_tokens"),
      col("n_shingles"),
      col("n_dup"),
      size(keptPos).cast("long").as("n_kept"),
      array_join(
        transform(keptPos, p => element_at(col("toks"), p + lit(1))),
        " ").as("text_deduped"))
  }

  /** The stride-1 k-token shingle FNV keys of `textCol`. The native path
    * fuses tokenize+window-hash into one codegen'd expression
    * ([[ShingleKeysExpr]] — hashing every token k times is the shingle
    * tier's hot loop and HOF lambdas run interpreted); other backends
    * take the value-identical compositional formulation. */
  private def shingleKeyCol(textCol: String, k: Int, model: String) =
    if (TokenizerModels.resolve(model) eq PlainBackend)
      org.apache.spark.sql.graft.Bridge.column(
        ShingleKeysExpr(org.apache.spark.sql.graft.Bridge.expression(col(textCol)), k))
    else {
      val toks = Tokenize.tokenStrings(col(textCol), model)
      when(size(toks) >= k,
        transform(
          sequence(lit(0), size(toks) - lit(k)),
          i => TextAnalysis.fnv1a64(array_join(slice(toks, i + lit(1), lit(k)), " "))))
        .otherwise(array().cast("array<bigint>"))
    }

  /** Per-document duplication audit — the statistic dedup papers report
    * (Lee et al. 2022 measure the fraction of corpus substrings that are
    * duplicated) and the cheapest way to DECIDE whether a corpus needs
    * the full dedup pass: for each document, how many of its stride-1
    * k-token shingles also occur in at least one OTHER document.
    * `dup_frac = n_shared / n_shingles` (0.0 for shingle-less docs).
    *
    * Scale design (100 TB): distinct `(id, key)` pairs reduce map-side,
    * per-key doc counts ride a key-partitioned window over that reduced
    * frame, and the verdict aggregates back on the doc key — two
    * exchanges, join-free, nothing but 8-byte keys and counts shuffled;
    * the final left join puts only `(id, counts)` against the id column
    * of the corpus (text never moves). */
  def shingleNoveltyAudit(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleWords: Int = 8,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(shingleWords > 0, s"shingleWords must be positive, got $shingleWords")
    val keys = shingleKeyCol(textCol, shingleWords, model)

    // distinct (id, key): a shingle repeated WITHIN one doc counts once —
    // the audit asks about cross-document sharing
    val pairs = df
      .select(col(idCol), explode(keys).as("key"))
      .distinct()
    val byKey = Window.partitionBy("key")
    val audited = pairs
      .withColumn("n_docs", count(lit(1)).over(byKey))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("n_docs") > 1, 1)).as("n_shared"))
    df.select(col(idCol))
      .join(audited, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(
          when(coalesce(col("n_shingles"), lit(0L)) > 0,
            col("n_shared").cast("double") / col("n_shingles").cast("double"))
            .otherwise(lit(0.0)),
          6).as("dup_frac"))
  }
}
