package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Pure-Scala tokenizer semantics — fixtures from FIXTURES.md §A and the
  * reference's inline tests (`src/tokenizer.rs:323-446`). */
class TokenizerSpec extends AnyFunSuite {

  private def toks(s: String, lc: Boolean = true, rp: Boolean = true): Seq[String] =
    PlainTokenizer.tokenize(s, lc, rp).map(_.token)

  test("special tokens dropped, bracketed and bare") {
    assert(toks("[CLS] hello [SEP] [PAD] [UNK]") == Seq("hello"))
    assert(toks("Hello, [UNK] ##sta Queensland") == Seq("hello", "sta", "queensland"))
  }

  test("punctuation isolated; dropped only when remove_punct") {
    assert(toks("Hello, world!") == Seq("hello", "world"))
    assert(
      toks("Hello, world!", rp = false) == Seq("hello", ",", "world", "!"))
    assert(toks("don't stop") == Seq("don", "t", "stop"))
  }

  test("empty / null / whitespace-only → []") {
    assert(toks("") == Seq.empty)
    assert(toks(null) == Seq.empty)
    assert(toks("   \t\n ") == Seq.empty)
  }

  test("no lowercase keeps case and offsets index original text") {
    val t = PlainTokenizer.tokenize("Hello World", lowercase = false)
    assert(t.map(_.token) == Seq("Hello", "World"))
    assert(t.map(x => (x.start, x.end)) == Seq((0L, 5L), (6L, 11L)))
  }

  test("offsets are code points: CJK and emoji count 1") {
    val t = PlainTokenizer.tokenize("hi 🙂 there", lowercase = true, removePunct = false)
    // 🙂 is So (symbol), not punctuation: forms its own run split by spaces
    assert(t.map(_.token) == Seq("hi", "🙂", "there"))
    assert(t.map(x => (x.start, x.end)) == Seq((0L, 2L), (3L, 4L), (5L, 10L)))
  }

  test("token == lowercased text slice by code points (invariant)") {
    val texts = Seq(
      "Hello, World! 123",
      "今日は良い天気です。",
      "mixed 🙂 emoji and CJK 你好 text",
      "don't   stop\t\nnow")
    for (text <- texts) {
      val lowered = text.toLowerCase(java.util.Locale.ROOT)
      val cps = lowered.codePoints().toArray
      for (tok <- PlainTokenizer.tokenize(text)) {
        val slice = new String(cps, tok.start.toInt, (tok.end - tok.start).toInt)
        assert(slice == tok.token, s"text=$text tok=$tok")
      }
    }
  }

  test("property: offsets re-slice source for random mixed input (seeded)") {
    val rng = new scala.util.Random(42)
    val alphabet: IndexedSeq[String] =
      ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString) ++
        Seq(" ", "\t", "\n", ".", ",", "!", "-", "'", "你", "好", "🙂", "É")
    for (_ <- 1 to 500) {
      val text = Seq.fill(rng.nextInt(60))(alphabet(rng.nextInt(alphabet.size))).mkString
      val lowered = text.toLowerCase(java.util.Locale.ROOT)
      val cps = lowered.codePoints().toArray
      PlainTokenizer.tokenize(text, lowercase = true, removePunct = false).foreach { tok =>
        val slice = new String(cps, tok.start.toInt, (tok.end - tok.start).toInt)
        assert(slice == tok.token, s"text=${text.replace("\n", "\\n")} tok=$tok")
      }
    }
  }

  test("model registry inventory") {
    // the reference's 8 predefined ids plus the bundled local:{zh,ja,ko}-dict
    assert(TokenizerModels.inventory.size == 11)
    assertThrows[IllegalArgumentException](TokenizerModels.require("nope:model"))
    assertThrows[UnsupportedOperationException](TokenizerModels.require("lindera:jieba"))
    TokenizerModels.require(TokenizerModels.PlainWordsEn)
    TokenizerModels.require(TokenizerModels.ZhDict) // bundled, loads offline
    TokenizerModels.require(TokenizerModels.JaDict)
    TokenizerModels.require(TokenizerModels.KoDict)
  }
}
