package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (beyond-reference data-selection
  * operator): score every raw document by how much more likely its
  * hashed n-grams are under a TARGET-domain model than under the raw
  * corpus model — the data-selection signal of Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling", which fits
  * two hashed-bigram bag-of-ngrams models and keeps documents by the
  * log importance ratio.
  *
  * {{{
  *   w(d) = Σ_{g ∈ bigrams(d)} [ ln p_target(g) − ln p_raw(g) ]
  *   p_c(g) = (n_c(g) + 1) / (N_c + dim)        (Laplace over dim buckets)
  * }}}
  *
  * Scale design (100 TB): bigrams are derived ELEMENTWISE from the token
  * array (`zip_with` of the array against its 1-shifted self — the
  * [[Collocations]] posture: no per-doc window, no positions self-join)
  * and feature-hashed ([[Encoding]]'s FNV-1a), so BOTH model fits are
  * single `dim`-bounded hash aggregates over one tokenize pass each,
  * locally checkpointed; totals are 1-row-aggregate literals. The scoring
  * scan broadcast-joins the two counts frames (raw inner — every scored
  * gram is in the raw model by construction; target LEFT — unseen grams
  * take the pure-smoothing mass) and aggregates per document: one
  * doc-keyed exchange, text never shuffles, no vocabulary artifact.
  */
object Importance {

  /** `(id, n_grams, log_weight)` for every `raw` document with ≥1 bigram:
    * the summed log importance ratio (rounded to 6 decimals) of the
    * document's hashed bigrams under the `target`-fitted vs `raw`-fitted
    * models. Resampling then keeps documents ∝ exp(log_weight) — the
    * weight is the operator's output so callers choose top-k or Gumbel
    * sampling downstream. */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      dim: Int = 1 << 20,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")

    // bigram hash = FNV of "t1 t2" = exactly ShingleKeysExpr at k=2: the
    // fused codegen'd pass replaces the interpreted zip_with/concat HOF
    // (native path; the compositional fallback is value-identical)
    def gramIds(frame: DataFrame): DataFrame = {
      val keys =
        if (TokenizerModels.resolve(model) eq PlainBackend)
          TextAnalysis.shingleKeys(col(textCol), 2)
        else {
          val toks = Tokenize.tokenStrings(col(textCol), model)
          when(size(toks) > 1,
            zip_with(
              slice(toks, lit(1), size(toks) - 1),
              slice(toks, lit(2), size(toks) - 1),
              (a, b) => TextAnalysis.fnv1a64(concat(a, lit(" "), b))))
            .otherwise(array().cast("array<bigint>"))
        }
      frame
        .select(col(idCol), explode(keys).as("key"))
        .select(col(idCol), pmod(col("key"), lit(dim.toLong)).as("gram_id"))
    }

    def fit(frame: DataFrame, cntCol: String): (DataFrame, Long) = {
      val counts = gramIds(frame)
        .groupBy("gram_id")
        .agg(count(lit(1)).as(cntCol))
        .localCheckpoint(true)
      val n = counts.agg(coalesce(sum(cntCol), lit(0L))).head().getLong(0)
      (counts, n)
    }

    val (tCounts, nT) = fit(target, "n_t")
    val (rCounts, nR) = fit(raw, "n_r")

    val term =
      log(coalesce(col("n_t"), lit(0L)).cast("double") + lit(1.0)) -
        lit(math.log(nT.toDouble + dim)) -
        (log(col("n_r").cast("double") + lit(1.0)) - lit(math.log(nR.toDouble + dim)))
    gramIds(raw)
      .join(broadcast(rCounts), "gram_id")
      .join(broadcast(tCounts), Seq("gram_id"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        round(sum(term), 6).as("log_weight"))
  }
}
