package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{Tokenize, TokenizerModels}

/** Train/test contamination detection — the n-gram-overlap
  * decontamination check from the GPT-3 paper (Brown et al. 2020,
  * arXiv:2005.14165, Appendix C) and successors: flag every evaluation
  * document sharing at least `minOverlap` exact token n-grams with the
  * training corpus.
  *
  * Scale design (100 TB train side): each side reduces to DISTINCT
  * n-grams first — map-side-combined aggregations that shrink the train
  * side to its unique-gram set before anything crosses the wire — then
  * ONE gram-keyed join (uniform key distribution; n-grams of natural
  * text have no mega-keys after `distinct`) and a per-document count.
  * Nothing is ever compared all-pairs and no document text leaves the
  * scan. In production the gram string would be fingerprinted
  * (`xxhash64`) before the exchange to cut shuffle width ~10×, at the
  * cost of an astronomically small collision false-positive rate; the
  * string form is kept here so the result is exactly reproducible by an
  * independent engine.
  */
object Decontaminate {

  /** Adjacent token `n`-grams of a token array, joined with single
    * spaces; fewer than `n` tokens → empty. */
  private[dedup] def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Test documents contaminated by `train`: `(doc_id, n_hits)` where
    * `n_hits` counts the DISTINCT test-doc n-grams that also occur
    * anywhere in the training corpus; only docs with
    * `n_hits >= minOverlap` are returned. */
  def overlap(
      train: DataFrame,
      test: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 13,
      minOverlap: Int = 1,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    def toks(df: DataFrame) =
      transform(Tokenize.tokenize(df(textCol), model), t => t.getField("token"))
    val trainGrams = train
      .select(explode(ngrams(toks(train), n)).as("gram"))
      .distinct()
    val testGrams = test
      .select(col(idCol).as("doc_id"), explode(ngrams(toks(test), n)).as("gram"))
      .distinct()
    testGrams
      .join(trainGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minOverlap)
  }
}
