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
    val vocab = fitUnigram(df, textCol, model)
    scoreUnigram(df, textCol, idCol, vocab, model)
  }

  /** Fit the unigram model: the vocabulary-sized `(token, n_w)` counts
    * frame from ONE tokenize pass, locally checkpointed. This frame IS
    * the model artifact — write it to parquet to train once and score
    * many corpora ([[scoreUnigram]] takes it back, loaded or fresh). */
  def fitUnigram(
      df: DataFrame,
      textCol: String,
      model: String = TokenizerModels.PlainWordsEn): DataFrame =
    df.select(explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .select(col("t.token").as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)

  /** Score `df` against a fitted `(token, n_w)` model frame (fresh from
    * [[fitUnigram]] or loaded from a saved artifact). The grand total is
    * one 1-row aggregate over the model (vocabulary-sized — cheap even
    * loaded), inlined as a literal. Out-of-vocabulary tokens are DROPPED
    * by the broadcast inner join — when scoring the training corpus
    * (CCNet's posture, and every oracle here) no such token exists;
    * scoring a foreign corpus against a saved model should gate on
    * vocabulary coverage first or extend the model with a floor row. */
  def scoreUnigram(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocab: DataFrame,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    val total = vocab.agg(coalesce(sum("n_w"), lit(0L))).head().getLong(0)
    df.select(col(idCol), explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .select(col(idCol), col("t.token").as("token"))
      .join(broadcast(vocab), "token")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(
          -sum(log(2.0, col("n_w").cast("double") / lit(total.toDouble))) /
            count(lit(1)),
          6).as("bits_per_token"))
  }

  /** Order-1 upgrade of [[unigramCrossEntropy]]: interpolated bigram
    * cross-entropy `p(w|v) = λ·c(v,w)/c(v·) + (1−λ)·c(w)/N` (Jelinek &
    * Mercer interpolation — the first rung of the ladder toward the
    * 5-gram KenLM CCNet scores with), each document's first token scored
    * by the unigram term alone.
    *
    * Scale design: token ADJACENCY is derived elementwise from the token
    * array (`element_at(toks, pos)` — no per-doc window, no doc-keyed
    * pre-shuffle). The unigram vocabulary broadcasts; the bigram counts
    * frame is vocab²-bounded — NOT broadcast-safe on an open corpus — so
    * it joins on the `(prev, token)` pair key: one pair-keyed exchange,
    * one doc-keyed aggregation exchange, and the margins `c(v·)` ride
    * the checkpointed counts with a partitioned window (the
    * [[Collocations]] posture throughout). */
  def bigramCrossEntropy(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lambda: Double = 0.75,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    import org.apache.spark.sql.expressions.Window

    val vocab = df
      .select(explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .groupBy(col("t.token").as("token"))
      .agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)
    val total = vocab.agg(coalesce(sum("n_w"), lit(0L))).head().getLong(0)

    // (w1, w2, n_ab) with the left margin n_a = c(w1 ·) as a partitioned
    // window over the checkpointed counts
    val bigrams = Collocations.bigramCounts(df, textCol, model)
      .localCheckpoint(true)
      .withColumn("n_a", sum(col("n_ab")).over(Window.partitionBy("w1")))

    // tokenize ONCE in the child projection; the Generate node above
    // consumes the attribute and passes it through for the prev lookup
    val stream = df
      .select(
        col(idCol),
        transform(Tokenize.tokenize(col(textCol), model), t => t.getField("token"))
          .as("__toks"))
      .select(col(idCol), col("__toks"), posexplode(col("__toks")).as(Seq("pos", "token")))
      // element_at is 1-based; pos is 0-based, so `pos` indexes w_{i-1}
      .withColumn("prev", when(col("pos") > 0, element_at(col("__toks"), col("pos"))))
      .drop("__toks")

    val pUni = col("n_w").cast("double") / lit(total.toDouble)
    val pBi = col("n_ab").cast("double") / col("n_a").cast("double")
    val p = when(col("prev").isNull, pUni)
      .otherwise(lit(lambda) * pBi + lit(1.0 - lambda) * pUni)

    stream
      .join(broadcast(vocab), "token")
      .join(bigrams,
        stream("prev") === bigrams("w1") && stream("token") === bigrams("w2"),
        "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-sum(log(2.0, p)) / count(lit(1)), 6).as("bits_per_token"))
  }

  /** Order-2 rung of the ladder: interpolated TRIGRAM cross-entropy
    * `p(w|u,v) = λ₃·c(u,v,w)/c(u,v,·) + λ₂·c(v,w)/c(v,·) + (1−λ₃−λ₂)·c(w)/N`
    * — each document's first token scores by the unigram term alone and
    * its second by the bigram interpolation, the standard
    * Jelinek-Mercer boundary treatment (one rung below the 5-gram KenLM
    * CCNet ships).
    *
    * Scale design: the [[bigramCrossEntropy]] posture extended one order —
    * BOTH context lookups are derived elementwise from the token array
    * (`element_at`, no per-doc window), the unigram vocabulary broadcasts,
    * and the bigram AND trigram count frames join on their (pair /
    * triple) keys: vocab³-bounded frames are even less broadcast-safe
    * than vocab², so each rides its own key-partitioned exchange, with
    * margins `c(·)` as partitioned windows over the checkpointed counts
    * (never a global window). */
  def trigramCrossEntropy(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lambda3: Double = 0.5,
      lambda2: Double = 0.3,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(lambda3 >= 0.0 && lambda2 >= 0.0 && lambda3 + lambda2 <= 1.0,
      s"need λ₃, λ₂ >= 0 with λ₃+λ₂ <= 1, got $lambda3, $lambda2")
    import org.apache.spark.sql.expressions.Window

    val vocab = df
      .select(explode(Tokenize.tokenize(col(textCol), model)).as("t"))
      .groupBy(col("t.token").as("token"))
      .agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)
    val total = vocab.agg(coalesce(sum("n_w"), lit(0L))).head().getLong(0)

    val bigrams = Collocations.bigramCounts(df, textCol, model)
      .localCheckpoint(true)
      .withColumn("n_a", sum(col("n_ab")).over(Window.partitionBy("w1")))

    // one tokenize pass feeds the trigram fit AND the scoring stream
    def stream(frame: DataFrame): DataFrame = frame
      .select(
        col(idCol),
        transform(Tokenize.tokenize(col(textCol), model), t => t.getField("token"))
          .as("__toks"))
      .select(col(idCol), col("__toks"), posexplode(col("__toks")).as(Seq("pos", "token")))
      .withColumn("prev", when(col("pos") > 0, element_at(col("__toks"), col("pos"))))
      .withColumn("prev2", when(col("pos") > 1, element_at(col("__toks"), col("pos") - 1)))
      .drop("__toks")

    val trigrams = stream(df)
      .filter(col("prev2").isNotNull)
      .groupBy(col("prev2").as("u"), col("prev").as("v"), col("token").as("w"))
      .agg(count(lit(1)).as("n_abc"))
      .localCheckpoint(true)
      .withColumn("n_uv", sum(col("n_abc")).over(Window.partitionBy("u", "v")))

    val lambda1 = 1.0 - lambda3 - lambda2
    val pUni = col("n_w").cast("double") / lit(total.toDouble)
    val pBi = col("n_ab").cast("double") / col("n_a").cast("double")
    val pTri = col("n_abc").cast("double") / col("n_uv").cast("double")
    val p = when(col("prev").isNull, pUni)
      .when(col("prev2").isNull,
        lit(lambda2) * pBi + lit(1.0 - lambda2) * pUni)
      .otherwise(lit(lambda3) * pTri + lit(lambda2) * pBi + lit(lambda1) * pUni)

    val s = stream(df)
    s.join(broadcast(vocab), "token")
      .join(bigrams,
        s("prev") === bigrams("w1") && s("token") === bigrams("w2"), "left")
      .join(trigrams,
        s("prev2") === trigrams("u") && s("prev") === trigrams("v") &&
          s("token") === trigrams("w"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-sum(log(2.0, p)) / count(lit(1)), 6).as("bits_per_token"))
  }
}
