package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring (beyond-reference
  * curation operator): per-document cross-entropy in bits/token against
  * a unigram model fitted on the corpus itself — the CCNet-style
  * "LM perplexity" quality signal (Wenzek et al. 2020) reduced to its
  * order-0 core, which needs no external model artifact (zero-egress)
  * and is exactly recomputable by the SQL oracle.
  *
  * Scale design (100 TB): two scans, one shuffle — the BM25 posture.
  * Scan 1 fits the model: a token-keyed hash aggregate producing the
  * VOCABULARY-sized `(token, n_w)` frame, locally checkpointed (blocks,
  * no CacheManager entry — see [[Collocations]] for why not `persist`);
  * the grand total is a 1-row aggregate inlined as a literal, never an
  * unpartitioned window. Scan 2 scores: the token stream broadcast-joins
  * the vocabulary frame map-side and aggregates per document — the ONE
  * exchange is the doc-keyed partial-aggregated groupBy; document text
  * never shuffles.
  */
object LanguageModel {

  /** `(id, n_tokens, bits_per_token)` where `bits_per_token` is
    * `-(1/n) Σ_i log2 p(w_i)` under the corpus-fitted unigram model
    * `p(w) = n_w / N`. Every token seen in scoring is in the model by
    * construction (same corpus), so no smoothing term is needed; rounded
    * to 6 decimals — the sub-ulp float-fold contract the cosine queries
    * already rely on. */
  def unigramCrossEntropy(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    def toks(frame: DataFrame): DataFrame = frame
      .select(col(idCol), explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .select(col(idCol), col("t.token").as("token"))

    val vocab = toks(df)
      .groupBy("token")
      .agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)
    val total = vocab.agg(coalesce(sum("n_w"), lit(0L))).head().getLong(0)

    toks(df)
      .join(broadcast(vocab), "token")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(
          -sum(log(2.0, col("n_w").cast("double") / lit(total.toDouble))) /
            count(lit(1)),
          6).as("bits_per_token"))
  }
}
