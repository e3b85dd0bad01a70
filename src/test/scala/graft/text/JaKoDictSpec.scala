package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Invariants mirroring the reference's network-gated Lindera ja/ko tests
  * (`/root/reference/tests/test_lindera_integration.py:34-120`) against
  * the bundled offline `local:ja-dict` / `local:ko-dict` backends —
  * morpheme presence, offsets re-slice the source, word-level output —
  * plus the register-before-resolve and mixed-script-run contracts. */
class JaKoDictSpec extends AnyFunSuite {

  private def ja(text: String): Vector[Token] =
    TokenizerModels.resolve(TokenizerModels.JaDict)
      .tokenize(text, lowercase = true, removePunct = true)

  private def ko(text: String): Vector[Token] =
    TokenizerModels.resolve(TokenizerModels.KoDict)
      .tokenize(text, lowercase = true, removePunct = true)

  // MUST run before any resolve of KoDict in this JVM — guarded by assume
  // so suite-order drift cancels rather than fails.
  test("a user backend registered before first resolve wins over the bundled load") {
    assume(!TokenizerModels.loadedModels.contains(TokenizerModels.KoDict))
    val custom = new TokenizerBackend {
      override def tokenize(text: String, lowercase: Boolean, removePunct: Boolean): Vector[Token] =
        Vector(Token("custom", 0L, 1L))
    }
    TokenizerModels.register(TokenizerModels.KoDict, custom)
    assert(TokenizerModels.resolve(TokenizerModels.KoDict) eq custom)
    // restore the bundled backend for the rest of the suite
    // (register-or-replace: an explicit register always wins)
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/ko_dict.txt"), "UTF-8")
    try TokenizerModels.register(
      TokenizerModels.KoDict,
      new DictSegBackend(ZhDictSegmenter.fromFreqText(src.getLines()), ZhDictSegmenter.isHangul))
    finally src.close()
  }

  test("ja: compound airport sentence segments into morphemes, not chars") {
    // reference test_lindera_ja_tokenize_produces_morphemes: 関西国際空港…
    // must yield the 関西 morpheme (and friends), not a char spray
    val out = ja("関西国際空港でトートバッグを買った").map(_.token)
    assert(out.contains("関西"), out)
    assert(out.contains("国際"), out)
    assert(out.contains("空港"), out)
    assert(out.contains("トートバッグ"), out)
    assert(out.contains("買った"), out)
    assert(out.exists(_.length > 1), out)
  }

  test("ja: offsets are code-point indices that re-slice the source") {
    // reference test_lindera_offsets_reconstruct_source, same sentence
    val text = "今日は良い天気"
    val cps = text.codePoints().toArray
    val out = ja(text)
    assert(out.nonEmpty)
    for (t <- out) {
      val slice = new String(cps, t.start.toInt, (t.end - t.start).toInt)
      assert(slice === t.token, s"tok=$t")
    }
    assert(out.map(_.token) === Vector("今日", "は", "良い", "天気"))
  }

  test("ja: katakana loanword with prolonged-sound mark stays one word") {
    // U+30FC is script=Common; without the explicit run-class carve-out
    // トートバッグ would split at the ー
    val out = ja("トートバッグ").map(_.token)
    assert(out === Vector("トートバッグ"), out)
  }

  test("ja: mixed ja/en keeps the English word intact") {
    val out = ja("私は Python が好き").map(_.token)
    assert(out.contains("python"), out)
    assert(out.contains("好き"), out)
  }

  test("ko: morpheme-level segmentation surfaces 한국") {
    // reference test_lindera_ko_tokenize_produces_morphemes
    val out = ko("한국어 형태소 분석은 흥미롭다").map(_.token)
    assert(out.exists(_.contains("한국")), out)
    assert(out.contains("형태소"), out)
    // josa splits off the noun stem: 분석은 → 분석 + 은
    assert(out.contains("분석") && out.contains("은"), out)
  }

  test("ko: offsets are code-point indices that re-slice the source") {
    val text = "한국어 형태소 분석은 흥미롭다"
    val cps = text.codePoints().toArray
    for (t <- ko(text)) {
      val slice = new String(cps, t.start.toInt, (t.end - t.start).toInt)
      assert(slice === t.token, s"tok=$t")
    }
  }

  test("ja/ko backends are exposed in the inventory with their langs") {
    assert(TokenizerModels.inventory(TokenizerModels.JaDict) === Seq("ja"))
    assert(TokenizerModels.inventory(TokenizerModels.KoDict) === Seq("ko"))
    // lindera ids still fail fast but now point at the bundled stand-ins
    val e = intercept[UnsupportedOperationException](
      TokenizerModels.resolve("lindera:ja-ipadic"))
    assert(e.getMessage.contains(TokenizerModels.JaDict), e.getMessage)
    val k = intercept[UnsupportedOperationException](
      TokenizerModels.resolve("lindera:ko-dic"))
    assert(k.getMessage.contains(TokenizerModels.KoDict), k.getMessage)
  }

  test("mixed script-run token: embedded Latin passes through intact (zh)") {
    // ADVICE regression: "API中文" has no separator — the Latin run must
    // NOT be exploded into single characters by the DAG segmenter
    val out = TokenizerModels.resolve(TokenizerModels.ZhDict)
      .tokenize("API中文", lowercase = true, removePunct = true)
    assert(out.map(_.token) === Vector("api", "中文"), out)
    assert(out.map(t => (t.start, t.end)) === Vector((0L, 3L), (3L, 5L)), out)
  }

  test("loading ja/ko backends does not pollute the English default") {
    ja("今日は")
    ko("한국어")
    val en = PlainTokenizer.tokenize("Hello, world!")
    assert(en.map(_.token) === Vector("hello", "world"))
  }
}
