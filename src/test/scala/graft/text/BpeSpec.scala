package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import Bpe.Merge

  /** Reference greedy left-to-right non-overlapping merge walk — the
    * semantics the string-replace apply must reproduce. */
  private def walkMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference single-machine BPE trainer over (word, cnt) pairs. */
  private def refTrain(
      words: Map[String, Long], k: Int): (Seq[Merge], Map[String, Vector[String]]) = {
    var vocab = words.map { case (w, _) => w -> w.split("").toVector }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(rank, a, b, c)
        vocab = vocab.map { case (w, syms) => w -> walkMerge(syms, a, b) }
        rank += 1
      }
    }
    (merges.result(), vocab)
  }

  private def trainOn(texts: Seq[String], k: Int) = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text")
    (docs, Bpe.train(wc, k), wc)
  }

  test("hand-checked merges on a tiny corpus") {
    // words: low ×5, lower ×2, newest ×6, widest ×3  (classic BPE example)
    val texts = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest widest")
    val (_, (merges, _), _) = trainOn(texts, 4)
    // pair counts round 1: (e,s) 9, (s,t) 9, (w,e) 9(newest)+... compute via reference
    val refWords = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val (refMerges, _) = refTrain(refWords, 4)
    assert(merges == refMerges)
  }

  test("distributed trainer matches the reference trainer on a random corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    val words = Vector.fill(40)((1 to (2 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val texts = (1 to 120).map(_ => (1 to 8).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val (_, (merges, trained), wc) = trainOn(texts, 10)

    val refWords = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (refMerges, refVocab) = refTrain(refWords, 10)
    assert(merges == refMerges)

    // final symbol sequences agree word-for-word
    val got = trained.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    for ((w, syms) <- refVocab)
      assert(got(w) == " " + syms.mkString("  ") + " ", s"word $w")
  }

  test("string-replace apply equals the greedy walk on adversarial runs") {
    // l l l → (ll, l); overlapping candidates must not double-merge
    import spark.implicits._
    val words = Seq(("lll", 1L), ("xllllx", 1L), ("llxll", 1L)).toDF("word", "cnt")
    val (merges, trained) = Bpe.train(words, 1)
    assert(merges.head.lhs == "l" && merges.head.rhs == "l")
    val got = trained.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got("lll") == " ll  l ")
    assert(got("xllllx") == " x  ll  ll  x ")
    assert(got("llxll") == " ll  x  ll ")
  }

  test("early stop when no pairs remain") {
    import spark.implicits._
    val words = Seq(("ab", 3L)).toDF("word", "cnt")
    val (merges, trained) = Bpe.train(words, 10)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")))
    assert(trained.collect().head.getString(2) == " ab ")
  }

  test("encode rebuilds per-doc token sequences in word order") {
    val texts = Seq("low lower", "newest low")
    val (docs, (_, trained), _) = trainOn(texts ++ Seq("low low newest newest newest widest"), 3)
    val enc = Bpe.encode(docs.filter(col("doc_id") < 2), "doc_id", "text", trained)
      .orderBy("doc_id").collect()
    assert(enc.length == 2)
    // token_str concatenates each word's learned symbols, words in order
    val vocab = trained.collect().map(r => r.getString(0) -> r.getString(2).trim.split(" +").toVector).toMap
    assert(enc(0).getString(2) == (vocab("low") ++ vocab("lower")).mkString(" "))
    assert(enc(0).getLong(1) == (vocab("low").length + vocab("lower").length).toLong)
    assert(enc(1).getString(2) == (vocab("newest") ++ vocab("low")).mkString(" "))
  }

  test("determinism: two trainings produce identical merges") {
    val texts = (1 to 50).map(i => s"alpha beta gamma delta epsilon word$i")
    val (_, (m1, _), _) = trainOn(texts, 6)
    val (_, (m2, _), _) = trainOn(texts, 6)
    assert(m1 == m2)
  }

  test("batched training is bit-identical to strict one-merge-at-a-time") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh"
    val ws = Vector.fill(80)(
      (1 to (2 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val wc = ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong * (1 + rnd.nextInt(9))) }
      .toSeq.toDF("word", "cnt").localCheckpoint()
    val (batched, wb) = Bpe.train(wc, 25) // default BatchK
    val (strict, ws2) = Bpe.train(wc, 25, batchK = 1)
    assert(batched == strict)
    val gb = wb.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val gs = ws2.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(gb == gs)
  }

  test("safePrefix stops at symbol overlap, tail ties, and tied contributors") {
    // overlap with an accepted symbol (incl. the merged token) stops the walk
    assert(Bpe.safePrefix(IndexedSeq(("a", "b", 10L), ("b", "c", 9L)), false, 10) == 1)
    assert(Bpe.safePrefix(IndexedSeq(("a", "b", 10L), ("ab", "c", 9L)), false, 10) == 1)
    // disjoint + strictly above the truncation bound: both apply
    assert(Bpe.safePrefix(IndexedSeq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 2L)), true, 10) == 2)
    // tail-tie: c == cLast under truncation is unsafe
    assert(Bpe.safePrefix(IndexedSeq(("a", "b", 10L), ("c", "d", 2L), ("e", "f", 2L)), true, 10) == 1)
    // but with the full pair list (no truncation) the tie with the tail is fine
    assert(Bpe.safePrefix(IndexedSeq(("a", "b", 10L), ("c", "d", 2L), ("e", "f", 2L)), false, 10) == 3)
    // a LATER entry sharing a symbol with S and tied with the candidate:
    // a new pair built from it could outrank the candidate — stop
    assert(Bpe.safePrefix(IndexedSeq(("a", "b", 10L), ("c", "d", 9L), ("x", "a", 9L)), false, 10) == 1)
    // same later contributor strictly below the candidate: safe
    assert(Bpe.safePrefix(IndexedSeq(("a", "b", 10L), ("c", "d", 9L), ("x", "a", 8L)), false, 10) == 2)
    // maxTake caps the block
    assert(Bpe.safePrefix(IndexedSeq(("a", "b", 10L), ("c", "d", 9L)), false, 1) == 1)
  }
}
