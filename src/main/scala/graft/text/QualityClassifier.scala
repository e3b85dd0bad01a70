package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality gate over feature-hashed token ids (beyond-reference
  * curation operator): the classifier-based filter real pretraining
  * pipelines run — GPT-3 filtered CommonCrawl with a linear classifier
  * trained against a high-quality reference corpus (Brown et al. 2020,
  * appendix A), CCNet keeps an LM-based variant (Wenzek et al. 2020).
  * This is the multinomial Naive Bayes formulation: the fit is
  * CLOSED-FORM (per-class token counts — no iterative optimizer, no
  * model artifact beyond a counts table), which keeps the whole
  * train+score pass exactly recomputable by a SQL oracle.
  *
  * Per document, with Laplace smoothing over the `dim` hashed buckets:
  *
  * {{{
  *   llr(d) = ln(P(pos)/P(neg))
  *          + Σ_{t ∈ d} [ ln((n_pos(t)+1)/(N_pos+dim)) − ln((n_neg(t)+1)/(N_neg+dim)) ]
  * }}}
  *
  * Scale design (100 TB): the [[LanguageModel]] two-scan posture. Scan 1
  * fits: ONE conditional hash aggregate keyed on the hashed token id
  * (`dim`-bounded — the feature-hash trick caps the model frame no matter
  * the vocabulary, Weinberger et al. 2009), locally checkpointed; class
  * totals and the doc-count prior are 1-row aggregates inlined as
  * literals. Scan 2 scores: the token stream broadcast-joins the counts
  * frame map-side and aggregates per document — the one exchange is the
  * doc-keyed groupBy. Document text never shuffles; no vocabulary
  * artifact is built or versioned.
  */
object QualityClassifier {

  /** `(id, n_tokens, llr, pred)` for every document with ≥1 token:
    * the Naive Bayes log-likelihood ratio (rounded to 6 decimals) and
    * the gate `pred = round(llr, 6) > 0` — the comparison binds to the
    * ROUNDED value so the decision is reproducible across engines.
    * `labelCol` is the positive-class boolean (the training signal —
    * derive it from any trusted column or upstream operator). */
  def naiveBayesScore(
      df: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: Column,
      dim: Int = 1 << 20,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")

    def stream(frame: DataFrame): DataFrame = frame
      .select(col(idCol), labelCol.as("__pos"),
        explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .select(col(idCol), col("__pos"),
        pmod(TextAnalysis.fnv1a64(col("t.token")), lit(dim.toLong)).as("token_id"))

    // Scan 1 — closed-form fit: per-class counts in one conditional
    // aggregate (never two filtered passes), dim-bounded, checkpointed
    // (blocks, no CacheManager entry — see Collocations for why not
    // persist); totals as literals from a 1-row aggregate.
    val counts = stream(df)
      .groupBy("token_id")
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("n_neg"))
      .localCheckpoint(true)
    val tot = counts
      .agg(
        coalesce(sum("n_pos"), lit(0L)),
        coalesce(sum("n_neg"), lit(0L)))
      .head()
    val (nPos, nNeg) = (tot.getLong(0), tot.getLong(1))

    // Class prior from document counts (one more 1-row aggregate).
    val docs = df
      .agg(
        sum(when(labelCol, 1L).otherwise(0L)),
        sum(when(!labelCol, 1L).otherwise(0L)))
      .head()
    val (dPos, dNeg) = (docs.getLong(0), docs.getLong(1))
    require(dPos > 0 && dNeg > 0,
      s"naiveBayesScore needs both classes present, got pos=$dPos neg=$dNeg")
    val prior = math.log(dPos.toDouble / dNeg.toDouble)

    // Scan 2 — score: broadcast the dim-bounded counts, one doc-keyed
    // aggregation exchange.
    val term =
      log(col("n_pos").cast("double") + lit(1.0)) - lit(math.log(nPos.toDouble + dim)) -
        (log(col("n_neg").cast("double") + lit(1.0)) - lit(math.log(nNeg.toDouble + dim)))
    stream(df)
      .join(broadcast(counts), "token_id")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(lit(prior) + sum(term), 6).as("llr"))
      .withColumn("pred", col("llr") > 0.0)
  }
}
