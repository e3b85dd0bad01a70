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

  /** The exploded `(id, pos, token, prev[, prev2])` adjacency stream from
    * ONE tokenize pass: the Generate node consumes the token-array
    * attribute from its child projection and passes it through, so the
    * context lookups are `element_at` on the same array — elementwise, no
    * per-doc window, no positions self-join. `element_at` is 1-based and
    * `pos` 0-based, so `pos` indexes w_{i-1} and `pos - 1` indexes
    * w_{i-2}. Package-private so plan specs can pin its one-scan shape. */
  private[text] def adjacencyStream(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: String,
      orders: Int): DataFrame = {
    val base = df
      .select(
        col(idCol),
        Tokenize.tokenStrings(col(textCol), model)
          .as("__toks"))
      .select(col(idCol), col("__toks"), posexplode(col("__toks")).as(Seq("pos", "token")))
      .withColumn("prev", when(col("pos") > 0, element_at(col("__toks"), col("pos"))))
    val ordered =
      if (orders >= 3)
        base.withColumn("prev2", when(col("pos") > 1, element_at(col("__toks"), col("pos") - 1)))
      else base
    ordered.drop("__toks")
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

    // ONE tokenize pass feeds BOTH fits: the adjacency stream is locally
    // checkpointed and the vocab/bigram counts are two aggregations over
    // those blocks (was two independent tokenize scans). Only the columns
    // the fits aggregate are checkpointed — id/pos stay out of the
    // blocks. See [[trigramCrossEntropy]] for the storage trade-off note.
    val fit = adjacencyStream(df, textCol, idCol, model, orders = 2)
      .select(col("token"), col("prev"))
      .localCheckpoint(true)
    val vocab = fit
      .groupBy(col("token").as("token"))
      .agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)
    val total = vocab.agg(coalesce(sum("n_w"), lit(0L))).head().getLong(0)

    // (w1, w2, n_ab) with the left margin n_a = c(w1 ·) as a partitioned
    // window over the checkpointed counts
    // LAZY checkpoint (round 21): the counts frame is consumed only by
    // the scoring plan, so materialization rides the scoring action
    // instead of paying its own sequential driver barrier — same blocks,
    // one fewer job. (vocab stays eager: `total` collects it next line.)
    val bigrams = fit
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("w1"), col("token").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(false)
      .withColumn("n_a", sum(col("n_ab")).over(Window.partitionBy("w1")))

    // the second (and last) corpus scan: the scoring stream
    val stream = adjacencyStream(df, textCol, idCol, model, orders = 2)

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
    * (never a global window).
    *
    * Scan budget: TWO corpus tokenize passes per invocation. The vocab,
    * bigram and trigram counts are three aggregations over ONE locally
    * checkpointed adjacency stream (pass 1); the scoring stream is its
    * own pass (pass 2). The checkpoint stores the token-stream-sized
    * blocks between the three fit aggregations — a deliberate
    * scans-for-storage trade (the Collocations counts-literal posture
    * applied to a corpus-scale frame): at 100 TB re-tokenizing three
    * times costs three full CPU passes, while the stream blocks spill to
    * local disk and are released by the ContextCleaner when the fits
    * finish. */
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

    // the fit aggregations key on (token, prev, prev2) only — id/pos
    // stay out of the checkpointed blocks
    val fit = adjacencyStream(df, textCol, idCol, model, orders = 3)
      .select(col("token"), col("prev"), col("prev2"))
      .localCheckpoint(true)
    val vocab = fit
      .groupBy(col("token").as("token"))
      .agg(count(lit(1)).as("n_w"))
      .localCheckpoint(true)
    val total = vocab.agg(coalesce(sum("n_w"), lit(0L))).head().getLong(0)

    // LAZY checkpoints (round 21): both count frames are consumed only
    // by the scoring plan — materialization rides the scoring action
    // (two fewer sequential driver barriers; vocab stays eager for the
    // `total` collect above)
    val bigrams = fit
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("w1"), col("token").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(false)
      .withColumn("n_a", sum(col("n_ab")).over(Window.partitionBy("w1")))

    val trigrams = fit
      .filter(col("prev2").isNotNull)
      .groupBy(col("prev2").as("u"), col("prev").as("v"), col("token").as("w"))
      .agg(count(lit(1)).as("n_abc"))
      .localCheckpoint(false)
      .withColumn("n_uv", sum(col("n_abc")).over(Window.partitionBy("u", "v")))

    val lambda1 = 1.0 - lambda3 - lambda2
    val pUni = col("n_w").cast("double") / lit(total.toDouble)
    val pBi = col("n_ab").cast("double") / col("n_a").cast("double")
    val pTri = col("n_abc").cast("double") / col("n_uv").cast("double")
    val p = when(col("prev").isNull, pUni)
      .when(col("prev2").isNull,
        lit(lambda2) * pBi + lit(1.0 - lambda2) * pUni)
      .otherwise(lit(lambda3) * pTri + lit(lambda2) * pBi + lit(lambda1) * pUni)

    val s = adjacencyStream(df, textCol, idCol, model, orders = 3)
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
