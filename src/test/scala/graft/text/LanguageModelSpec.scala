package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("uniform corpus scores exactly log2(vocab) bits per token") {
    // 4 equally frequent tokens -> p(w) = 1/4, cross-entropy = 2 bits
    val docs = Seq((0L, "a b c d"), (1L, "d c b a")).toDF("doc_id", "text")
    val out = LanguageModel.unigramCrossEntropy(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(4L, 4L))
    assert(out.map(_.getDouble(2)).toSeq === Seq(2.0, 2.0))
  }

  test("rarer tokens raise a document's cross-entropy") {
    val docs = Seq(
      (0L, "the the the the the the the rare"),
      (1L, "the the the the the the the the")).toDF("doc_id", "text")
    val Array(withRare, allCommon) = LanguageModel
      .unigramCrossEntropy(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(withRare > allCommon)
    // hand check: p(the)=15/16, p(rare)=1/16
    val expected0 = -(7 * math.log(15.0 / 16) / math.log(2) + math.log(1.0 / 16) / math.log(2)) / 8
    assert(math.abs(withRare - expected0) < 1e-6)
  }

  test("bigram interpolation: deterministic text scores near zero bits; first token pays unigram cost") {
    // one doc, fully deterministic bigrams: every p(w|v) has c(v,w)=c(v·),
    // so the bigram term is 1 and each non-initial token costs
    // -log2(λ + (1-λ)p_uni) bits
    val docs = Seq((0L, "a b a b a b a b")).toDF("doc_id", "text")
    val Array(r) = LanguageModel
      .bigramCrossEntropy(docs, "text", "doc_id", lambda = 0.75).collect()
    assert(r.getLong(1) === 8L)
    val pUni = 0.5
    val first = -math.log(pUni) / math.log(2)
    val rest = -math.log(0.75 * 1.0 + 0.25 * pUni) / math.log(2)
    assert(math.abs(r.getDouble(2) - (first + 7 * rest) / 8) < 1e-6)
  }

  test("trigram interpolation: hand-derivable on a deterministic sequence") {
    // one doc, fully deterministic trigrams AND bigrams: every context
    // term is 1, so pos0 = p_uni, pos1 = λ2 + (1-λ2)p_uni,
    // pos>=2 = λ3 + λ2 + (1-λ3-λ2)p_uni
    val docs = Seq((0L, "a b a b a b a b")).toDF("doc_id", "text")
    val Array(r) = LanguageModel
      .trigramCrossEntropy(docs, "text", "doc_id", lambda3 = 0.5, lambda2 = 0.3).collect()
    assert(r.getLong(1) === 8L)
    val pU = 0.5
    def b(p: Double) = -math.log(p) / math.log(2)
    val expected = (b(pU) + b(0.3 + 0.7 * pU) + 6 * b(0.5 + 0.3 + 0.2 * pU)) / 8
    assert(math.abs(r.getDouble(2) - expected) < 1e-6)
  }

  test("trigram model beats bigram on order-2-predictive text") {
    // "a a b" repeating: after context (a a) the next is ALWAYS b, and
    // after (a b) always a — trigrams deterministic; bigram context "a"
    // is ambiguous (a->a and a->b both occur)
    val docs = Seq((0L, "a a b a a b a a b a a b")).toDF("doc_id", "text")
    val bi = LanguageModel.bigramCrossEntropy(docs, "text", "doc_id")
      .collect().head.getDouble(2)
    val tri = LanguageModel.trigramCrossEntropy(docs, "text", "doc_id")
      .collect().head.getDouble(2)
    assert(tri < bi)
  }

  test("bigram model beats unigram on text with predictive adjacency") {
    val docs = Seq(
      (0L, "x y x y x y x y x y"),
      (1L, "x x y y x y y x x y")).toDF("doc_id", "text")
    val uni = LanguageModel.unigramCrossEntropy(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getDouble(2))
    val bi = LanguageModel.bigramCrossEntropy(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getDouble(2))
    // doc 0 alternates perfectly: bigram context is highly predictive
    assert(bi(0) < uni(0))
  }

  test("trigram scan budget is two: one shared fit stream, one scoring pass") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // pass 1: the shared adjacency stream the three fits aggregate over —
    // exactly one corpus scan, one tokenize
    val fitStream = LanguageModel.adjacencyStream(
      docs, "text", "doc_id", TokenizerModels.PlainWordsEn, orders = 3)
    // (the tokenize EXPRESSION prints more than once per scan — the
    // InferFiltersFromGenerate rule copies it into a pushed size>0
    // filter — so the scan count, not the expression count, is the pin)
    val fitPlan = fitStream.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(fitPlan).length === 1, fitPlan)
    assert(fitPlan.contains("tokenize_plain_words"), fitPlan)
    // pass 2: the returned scoring plan re-tokenizes once; every count
    // frame reads checkpoint blocks (no second/third/fourth corpus scan —
    // the r8 finding: four independent tokenize subtrees per invocation)
    val scored = LanguageModel.trigramCrossEntropy(docs, "text", "doc_id")
    val plan = scored.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).length === 1, plan)
    assert(plan.contains("tokenize_plain_words"), plan)
    assert(plan.contains("Scan ExistingRDD"), "count frames must read checkpoint blocks")
    assert(plan.contains("BroadcastHashJoin"), "vocab must broadcast")
    assert(spark.sharedState.cacheManager.isEmpty,
      "library functions must not leave CacheManager entries behind")
  }

  test("scoring joins the vocab broadcast; model blocks come from the checkpoint") {
    val docs = Seq((0L, "x y"), (1L, "y z")).toDF("doc_id", "text")
    val out = LanguageModel.unigramCrossEntropy(docs, "text", "doc_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Scan ExistingRDD"), "vocab side must read checkpoint blocks")
    assert(spark.sharedState.cacheManager.isEmpty,
      "library functions must not leave CacheManager entries behind")
  }
}
