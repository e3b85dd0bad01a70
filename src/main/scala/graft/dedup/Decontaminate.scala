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
  * scan. Grams are fingerprinted to 64-bit FNV shingle keys BEFORE the
  * exchange (the fused codegen'd [[graft.text.ShingleKeysExpr]] on the
  * native path — the string-gram HOF formulation ran interpreted and
  * ~5× slower, and 8-byte keys cut the shuffle width ~3×): a collision
  * can only add a spurious hit, at an astronomically small rate, and
  * the keys stay exactly reproducible by an independent engine
  * (`fnvSql` re-derives them in DuckDB).
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

  /** The n-gram key column: fused codegen'd expression on the native
    * path, value-identical compositional fallback (fnv1a64 of each joined
    * gram string) for registered backends. */
  private def gramKeys(textCol: String, n: Int, model: String): Column =
    if (TokenizerModels.resolve(model) eq graft.text.PlainBackend)
      graft.text.TextAnalysis.shingleKeys(col(textCol), n)
    else {
      val toks = Tokenize.tokenStrings(col(textCol), model)
      transform(ngrams(toks, n), g => graft.text.TextAnalysis.fnv1a64(g))
    }

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
    val trainGrams = train
      .select(explode(gramKeys(textCol, n, model)).as("gram"))
      .distinct()
    val testGrams = test
      .select(col(idCol).as("doc_id"), explode(gramKeys(textCol, n, model)).as("gram"))
      .distinct()
    testGrams
      .join(trainGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minOverlap)
  }

  /** Cross-domain contamination MATRIX — the corpus-pair audit report
    * (which sources/languages leak into which): for every unordered
    * domain pair, how many DISTINCT token `n`-grams occur in both.
    *
    * Scale design: grams are 64-bit shingle KEYS from the fused codegen'd
    * expression ([[graft.text.ShingleKeysExpr]] — the string-gram HOF
    * formulation measured 4.2 s vs 0.4 s at sf0.1, and 8-byte keys also
    * cut the shuffle width; the audit counts distinct shared grams, so
    * hash identity is the right granularity and a 64-bit collision only
    * perturbs a count by one). Distinct `(domain, key)` pairs reduce
    * map-side; each key's domain set aggregates into ONE row (bounded by
    * |domains| — a curated handful, so no posting-list cap needed) and
    * its pairs expand ELEMENTWISE from the sorted set; the final matrix
    * aggregation touches |domains|² keys. One gram-keyed exchange — never
    * a gram-level self-join. Uses the native tokenizer. */
  def crossDomainOverlap(
      df: DataFrame,
      textCol: String,
      domainCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    val domGrams = df
      .select(col(domainCol).as("domain"),
        explode(graft.text.TextAnalysis.shingleKeys(col(textCol), n)).as("gram"))
      .groupBy("gram")
      .agg(sort_array(collect_set(col("domain"))).as("ds"))
    val pairType = "array<struct<domain_a:string,domain_b:string>>"
    domGrams
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("ds"))),
        i => when(size(col("ds")) > i,
          zip_with(
            array_repeat(element_at(col("ds"), i), size(col("ds")) - i),
            slice(col("ds"), i + lit(1), size(col("ds")) - i),
            (a, b) => struct(a.as("domain_a"), b.as("domain_b"))))
          .otherwise(array().cast(pairType))))).as("p"))
      .groupBy(col("p.domain_a").as("domain_a"), col("p.domain_b").as("domain_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
