package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{Tokenize, TokenizerModels}

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
    val toks = transform(Tokenize.tokenize(col(textCol), model), t => t.getField("token"))
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
}
