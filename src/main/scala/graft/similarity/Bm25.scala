package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{Tokenize, TokenizerModels}

/** BM25 keyword retrieval (Robertson & Spärck Jones probabilistic
  * relevance framework; the Okapi BM25 scoring function with the standard
  * `k1`/`b` parameterization). The lexical complement to the embedding
  * tier's ANN search: given a bag of query terms, rank documents by
  *
  * {{{
  *   score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·dl/avgdl))
  *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  * }}}
  *
  * Scale design (100 TB): the query term set is known up front, so no
  * inverted index is ever materialized — `tf(t, d)` for each term is a
  * pure Column over the document's token array. The plan is two
  * elementwise scans and ZERO shuffles: scan 1 folds every corpus
  * constant (`N`, `avgdl`, each `df(t)`) into ONE 1-row aggregate
  * (map-side partial, a handful of longs to the driver) inlined as
  * literals; scan 2 scores matching documents elementwise and feeds a
  * bounded `TakeOrdered` top-k — no sort, no exchange, nothing
  * corpus-sized ever leaves the executors. (A groupBy-explode inverted
  * index would shuffle and materialize a doc×term table comparable to
  * the corpus itself — strictly worse for ad-hoc query sets; a reusable
  * index is what the LSH posting-list operators are for.)
  *
  * Determinism: per-document scores sum the per-term partials in sorted
  * term order via a fixed left-assoc fold (absent terms contribute +0.0,
  * which is an IEEE no-op), so scores are bit-reproducible across runs
  * and engines, and exact ties rank by `doc_id` identically everywhere.
  */
object Bm25 {

  /** Score `df`'s documents against `terms` and return the top `k` as
    * `(doc_id, score)`, score descending with id tie-break.
    *
    * `roundTo >= 0` rounds the score to that many decimals BEFORE the
    * top-k cut, so the cut and the tie-break bind to the rounded value —
    * two documents whose scores differ only in sub-rounding ulps straddling
    * rank `k` then rank by `doc_id` on both this engine and any checker
    * that compares rounded scores, instead of by unobservable float noise. */
  def search(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      roundTo: Int = -1,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct == terms, "query terms must be distinct")
    // native token-strings + per-term count expressions: ArrayTransform /
    // ArrayFilter are CodegenFallback, so the corpus scan paid one
    // interpreted lambda pass per query term — these keep both scans
    // fully inside whole-stage codegen (values identical, oracle-pinned)
    val toks = Tokenize.tokenStrings(col(textCol), model)
    val tfCols = terms.indices.map(i =>
      org.apache.spark.sql.graft.Bridge.column(
        graft.text.ArrayCountEqExpr(
          org.apache.spark.sql.graft.Bridge.expression(toks), terms(i))).as(s"__tf_$i"))
    val perDoc = df.select(
      (col(idCol).as("doc_id") +: size(toks).as("dl") +: tfCols): _*)

    // Scan 1: every corpus constant in one map-side-combined aggregate.
    val constAggs =
      count(lit(1)).as("n_docs") +:
        coalesce(sum("dl"), lit(0L)).as("n_tokens") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).as(s"__df_$i"))
    val c = perDoc.agg(constAggs.head, constAggs.tail: _*).head()
    val nDocs = c.getLong(0)
    val avgdl = if (nDocs == 0L) 0.0 else c.getLong(1).toDouble / nDocs

    // Per-term partial scores with driver-side idf literals; summed in
    // sorted-term order (see determinism note above).
    def partial(i: Int): Column = {
      val dfT = c.getLong(2 + i)
      val idf = math.log(1.0 + (nDocs.toDouble - dfT + 0.5) / (dfT + 0.5))
      val tf = col(s"__tf_$i")
      when(tf > 0,
        lit(idf) * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
        .otherwise(lit(0.0))
    }
    val sortedIdx = terms.indices.sortBy(terms)
    val summed = sortedIdx.map(partial).foldLeft(lit(0.0))(_ + _)
    val score = if (roundTo >= 0) round(summed, roundTo) else summed

    // Scan 2: elementwise scoring + bounded TakeOrdered.
    perDoc
      .filter(terms.indices.map(i => col(s"__tf_$i") > 0).reduce(_ || _))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
