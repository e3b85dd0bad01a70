package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Guards the q_tokenize_cjk* oracle contract: every fixture phrase's
  * spec-pinned decomposition must equal what the REAL gated backend
  * produces (tokens AND code-point offsets). A bundled-dictionary edit
  * that shifts any DP route fails here, before it can surface as a
  * confusing DuckDB hash mismatch. */
class CjkQueryFixtureSpec extends AnyFunSuite {

  private def withGate[A](body: => A): A = {
    val prop = TokenizerModels.LinderaFallbackProp
    val prev = sys.props.get(prop)
    sys.props(prop) = "1"
    try body
    finally prev match {
      case Some(v) => sys.props(prop) = v
      case None    => sys.props -= prop
    }
  }

  private def check(
      model: String,
      phrase: Map[String, String],
      pieces: Map[String, Seq[(String, Int, Int)]]): Unit = withGate {
    val backend = TokenizerModels.resolve(model)
    for ((word, p) <- phrase.toSeq.sortBy(_._1)) {
      val got = backend.tokenize(p, lowercase = true, removePunct = true)
        .map(t => (t.token, t.start.toInt, t.end.toInt))
      assert(got == pieces(word), s"word=$word phrase=$p")
    }
  }

  test("ja fixture decompositions match lindera:ja-ipadic (bundled dict)") {
    check("lindera:ja-ipadic", CjkQueryFixture.jaPhrase, CjkQueryFixture.jaPieces)
  }

  test("zh fixture decompositions match lindera:jieba (bundled dict)") {
    check("lindera:jieba", CjkQueryFixture.zhPhrase, CjkQueryFixture.zhPieces)
  }

  test("ko fixture decompositions match lindera:ko-dic (bundled dict)") {
    check("lindera:ko-dic", CjkQueryFixture.koPhrase, CjkQueryFixture.koPieces)
  }

  test("fixture covers the whole closed corpus vocabulary") {
    val vocab = Set(
      "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
      "filter", "group", "hash", "join", "key", "line", "merge", "order",
      "part", "query", "row", "scan", "slow", "small", "sort", "spark",
      "stream", "table", "the", "value", "vector", "window")
    assert(CjkQueryFixture.jaPhrase.keySet == vocab)
    assert(CjkQueryFixture.zhPhrase.keySet == vocab)
    assert(CjkQueryFixture.koPhrase.keySet == vocab)
  }

  test("multi-token phrases tile their phrase exactly (offsets reslice)") {
    for ((phrase, pieces) <- Seq(
        (CjkQueryFixture.jaPhrase, CjkQueryFixture.jaPieces),
        (CjkQueryFixture.zhPhrase, CjkQueryFixture.zhPieces),
        (CjkQueryFixture.koPhrase, CjkQueryFixture.koPieces));
        (word, p) <- phrase) {
      val ps = pieces(word)
      // contiguous tiling from 0 to the phrase's code-point length
      assert(ps.head._2 == 0 && ps.last._3 == p.codePointCount(0, p.length), s"$word")
      assert(ps.sliding(2).forall(w => w.size < 2 || w(0)._3 == w(1)._2), s"$word")
      // each token reslices its span (lowercased, matching the pipeline)
      val cps = p.toLowerCase.codePoints().toArray
      for ((t, s0, e0) <- ps)
        assert(new String(cps, s0, e0 - s0) == t, s"$word/$t")
    }
  }
}
