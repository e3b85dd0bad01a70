package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The opt-in `lindera:*` → bundled-segmenter gate
  * ([[TokenizerModels.LinderaFallbackEnv]]). Mirrors the reference's own
  * posture of keeping Lindera behind an explicit env opt-in
  * (`/root/reference/tests/test_lindera_integration.py:23-31`), and runs
  * the reference's gated ja/ko morpheme + offset invariants
  * (`:34-111`) through the `lindera:*` ids themselves. */
class LinderaFallbackSpec extends AnyFunSuite {

  private def withGate[A](on: Boolean)(body: => A): A = {
    val prop = TokenizerModels.LinderaFallbackProp
    val prev = sys.props.get(prop)
    if (on) sys.props(prop) = "1" else sys.props(prop) = "0"
    try body
    finally prev match {
      case Some(v) => sys.props(prop) = v
      case None    => sys.props -= prop
    }
  }

  test("gate off: lindera ids still fail fast, naming the opt-in") {
    withGate(on = false) {
      val e = intercept[UnsupportedOperationException] {
        TokenizerModels.resolve("lindera:ja-ipadic-neologd")
      }
      assert(e.getMessage.contains(TokenizerModels.LinderaFallbackEnv), e.getMessage)
    }
  }

  test("gate on: ja ids serve the bundled segmenter — reference morpheme invariant") {
    withGate(on = true) {
      // reference test_lindera_ja_tokenize_produces_morphemes, same sentence
      val toks = TokenizerModels.resolve("lindera:ja-unidic")
        .tokenize("関西国際空港でトートバッグを買った", lowercase = true, removePunct = true)
        .map(_.token)
      assert(toks.contains("関西"), toks)
      assert(toks.contains("国際"), toks)
    }
  }

  test("gate on: ko id serves the bundled segmenter — reference 한국 invariant") {
    withGate(on = true) {
      val toks = TokenizerModels.resolve("lindera:ko-dic")
        .tokenize("한국어 형태소 분석은 흥미롭다", lowercase = true, removePunct = true)
        .map(_.token)
      assert(toks.exists(_.contains("한국")), toks)
    }
  }

  test("gate on: offsets re-slice the source in code points (reference invariant)") {
    withGate(on = true) {
      val text = "今日は良い天気"
      val cps = text.codePoints().toArray
      val out = TokenizerModels.resolve("lindera:ja-ipadic")
        .tokenize(text, lowercase = true, removePunct = true)
      assert(out.nonEmpty)
      for (t <- out) {
        val slice = new String(cps, t.start.toInt, (t.end - t.start).toInt)
        assert(slice == t.token, s"tok=$t")
      }
    }
  }

  test("gate on: zh ids resolve to the bundled segmenter without sticking in the registry") {
    withGate(on = true) {
      val toks = TokenizerModels.resolve("lindera:jieba")
        .tokenize("我们在北京大学学习", lowercase = true, removePunct = true)
        .map(_.token)
      assert(toks.nonEmpty && toks.exists(_.length > 1), toks)
      assert(TokenizerModels.loadedModels.contains(TokenizerModels.ZhDict))
    }
    // dynamic resolution: with the gate back off, fail-fast is restored
    withGate(on = false) {
      assertThrows[UnsupportedOperationException](TokenizerModels.resolve("lindera:jieba"))
    }
  }

  test("an explicit registration under a lindera id wins over the fallback") {
    withGate(on = true) {
      val custom = new TokenizerBackend {
        override def tokenize(text: String, lowercase: Boolean, removePunct: Boolean): Vector[Token] =
          Vector(Token("custom", 0L, 1L))
      }
      TokenizerModels.register("lindera:cc-cedict", custom)
      assert(TokenizerModels.resolve("lindera:cc-cedict") eq custom)
    }
  }
}
