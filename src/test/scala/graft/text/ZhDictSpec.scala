package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Invariants mirroring the reference's jieba behavior tests
  * (`/root/reference/tests/test_jieba_chinese.py:41-111`) against the
  * bundled offline `local:zh-dict` backend. */
class ZhDictSpec extends AnyFunSuite {

  private def toks(text: String): Vector[Token] =
    TokenizerModels.resolve(TokenizerModels.ZhDict)
      .tokenize(text, lowercase = true, removePunct = true)

  test("produces word-level (multi-char) Chinese tokens, not char-level") {
    // 今天天气很好 — word segmentation yields 3 words, not 6 chars
    val out = toks("今天天气很好").map(_.token)
    assert(out.nonEmpty)
    assert(out.exists(_.length > 1), out)
    assert(out.length <= 5, out)
    assert(out === Vector("今天", "天气", "很好"))
  }

  test("segments a long compound into fewer tokens than char-level") {
    val out = toks("中国人民解放军").map(_.token)
    assert(out.length < 7, out) // char-level baseline is 7
    assert(out === Vector("中国", "人民", "解放军"))
  }

  test("mixed zh/en text keeps the English word intact") {
    val out = toks("我喜欢 Python 编程").map(_.token)
    assert(out.exists(_.contains("python")), out)
    assert(out.contains("喜欢") && out.contains("编程"), out)
  }

  test("offsets are code-point indices that re-slice the source") {
    val text = "今天天气很好 Python 编程!"
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val cps = lowered.codePoints().toArray
    for (t <- toks(text)) {
      val slice = new String(cps, t.start.toInt, (t.end - t.start).toInt)
      assert(slice === t.token, s"tok=$t")
    }
  }

  test("zh backend is exposed for zh in the inventory") {
    assert(TokenizerModels.inventory(TokenizerModels.ZhDict) === Seq("zh"))
  }

  test("loading the zh backend does not pollute the English default") {
    toks("我喜欢 Python")
    val en = PlainTokenizer.tokenize("Hello, world!")
    assert(en.map(_.token) === Vector("hello", "world"))
  }

  test("OOV Han runs fall back to deterministic single characters") {
    // 鑫 / 垚 are not in the bundled dictionary
    val out = toks("鑫垚").map(_.token)
    assert(out === Vector("鑫", "垚"))
  }

  test("max-probability route beats greedy prefix matching") {
    // greedy longest-prefix from 中 would try 中国 then strand 人民解放军
    // suboptimally if frequencies disagreed; the DP picks the best total
    // route and ties prefer the longer word — determinism probe
    val seg = ZhDictSegmenter.fromFreqText(Iterator("ab 10", "bc 10", "abc 5", "c 1"))
    // route ab|c: log(10)+log(1); route abc: log(5); route a|bc needs 'a'
    // floor freq 1: log(1)+log(10) == ab|c score -> DP must tie-break
    // deterministically; abc (one word, log 5/26) wins over both
    // two-word routes (log 10/26 + log 1/26)
    val out = seg.cut("abc").map(_._1)
    assert(out === Vector("abc"))
  }

  test("dictionary validation fails fast") {
    intercept[IllegalArgumentException](new ZhDictSegmenter(Map.empty))
    intercept[IllegalArgumentException](new ZhDictSegmenter(Map("a" -> 0L)))
    intercept[IllegalArgumentException](
      ZhDictSegmenter.fromFreqText(Iterator("word freq extra junk")))
  }
}
