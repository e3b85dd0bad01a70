package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** WordPiece contract, pinned by the reference's HF tests
  * (`tests/test_tokenize_with_offsets.py:64-78`: `##` prefix convention,
  * offsets re-slice the lowercased text with the prefix stripped). */
class WordPieceSpec extends AnyFunSuite {

  private val vocab = Set(
    "token", "##ization", "##izer", "happens", "fast", "un", "##want", "##ed",
    ",", ".", "the", "##s")
  private val wp = new WordPieceTokenizer(vocab)

  test("greedy longest-match-first decomposition with ## continuation") {
    val toks = wp.tokenize("Tokenization happens fast", lowercase = true, removePunct = true)
    assert(toks.map(_.token) == Vector("token", "##ization", "happens", "fast"))
  }

  test("offsets re-slice the lowercased text (## stripped) — reference invariant") {
    val text = "Tokenization happens fast"
    val lc = text.toLowerCase
    val toks = wp.tokenize(text, lowercase = true, removePunct = true)
    toks.foreach { t =>
      val stripped = if (t.token.startsWith("##")) t.token.substring(2) else t.token
      assert(lc.substring(t.start.toInt, t.end.toInt) == stripped, t)
    }
  }

  test("unknown words become [UNK] and are dropped by the special filter") {
    val toks = wp.tokenize("token zzzqqq fast", lowercase = true, removePunct = true)
    assert(toks.map(_.token) == Vector("token", "fast"))
    // but the raw decomposition reports UNK
    assert(wp.wordPieces("zzzqqq") == Vector(("[UNK]", 0L, 6L)))
  }

  test("punctuation pieces kept without removePunct, dropped with") {
    val kept = wp.tokenize("token, fast.", lowercase = true, removePunct = false)
    assert(kept.map(_.token) == Vector("token", ",", "fast", "."))
    val dropped = wp.tokenize("token, fast.", lowercase = true, removePunct = true)
    assert(dropped.map(_.token) == Vector("token", "fast"))
  }

  test("in-repo vocab fixture: every corpus word decomposes as the oracle's mapping") {
    // The same hand-derived mapping that q_tokenize_wordpiece's DuckDB
    // oracle encodes as a CASE — greedy longest-match on the fixture vocab
    // must reproduce it exactly (token, relStart, relEnd in code points).
    val in = getClass.getResourceAsStream("/graft/wordpiece_vocab.txt")
    assert(in != null, "fixture missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val fixture = try WordPieceTokenizer.fromVocabText(src.getLines()) finally src.close()

    val decomposed = Map(
      "column" -> Vector(("col", 0L, 3L), ("##umn", 3L, 6L)),
      "customer" -> Vector(("custom", 0L, 6L), ("##er", 6L, 8L)),
      "spark" -> Vector(("sp", 0L, 2L), ("##ark", 2L, 5L)),
      "stream" -> Vector(("str", 0L, 3L), ("##eam", 3L, 6L)),
      "vector" -> Vector(("vec", 0L, 3L), ("##tor", 3L, 6L)),
      "window" -> Vector(("win", 0L, 3L), ("##dow", 3L, 6L)))
    val whole = Seq("a", "agg", "batch", "big", "data", "dup", "fast", "filter",
      "group", "hash", "join", "key", "line", "merge", "order", "part", "query",
      "row", "scan", "slow", "small", "sort", "table", "the", "value")

    whole.foreach { w =>
      val got = fixture.tokenize(w, lowercase = true, removePunct = true)
      assert(got.map(t => (t.token, t.start, t.end)) == Vector((w, 0L, w.length.toLong)), s"word $w → $got")
    }
    decomposed.foreach { case (w, expect) =>
      val got = fixture.tokenize(w, lowercase = true, removePunct = true)
      assert(got.map(t => (t.token, t.start, t.end)) == expect, s"word $w → $got")
    }
  }

  test("over-long words collapse to UNK") {
    val tiny = new WordPieceTokenizer(vocab, maxInputCharsPerWord = 3)
    assert(tiny.wordPieces("fast") == Vector(("[UNK]", 0L, 4L)))
  }
}

class TokenizerRegistrySpec extends SparkSpec {

  import spark.implicits._

  test("registered WordPiece backend runs through the Column API") {
    val vocab = Set("spark", "##s", "run", "##s", "fast")
    TokenizerModels.register("wordpiece:test", new WordPieceTokenizer(vocab))
    assert(TokenizerModels.loadedModels.contains("wordpiece:test"))
    TokenizerModels.prefetch("wordpiece:test")

    val out = Seq("Sparks runs fast").toDF("text")
      .select(explode(Tokenize.tokenize(col("text"), "wordpiece:test")).as("t"))
      .select($"t.token").as[String].collect().toSeq
    assert(out == Seq("spark", "##s", "run", "##s", "fast"))
  }

  test("bundled zh backend runs through the Column API with exact offsets") {
    val out = Seq("今天天气很好 Python 编程").toDF("text")
      .select(explode(Tokenize.tokenize(col("text"), TokenizerModels.ZhDict)).as("t"))
      .select($"t.token", $"t.start", $"t.end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(_._1) ==
      Seq("今天", "天气", "很好", "python", "编程"))
    // code-point offsets: Han chars count 1 each; 'python' spans 7..13
    assert(out.head == ("今天", 0L, 2L))
    assert(out(3) == ("python", 7L, 13L))
  }

  test("bundled ja/ko backends run through the Column API with exact offsets") {
    val ja = Seq("関西国際空港で Python を使う").toDF("text")
      .select(explode(Tokenize.tokenize(col("text"), TokenizerModels.JaDict)).as("t"))
      .select($"t.token", $"t.start", $"t.end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ja.map(_._1) == Seq("関西", "国際", "空港", "で", "python", "を", "使う"))
    assert(ja.head == ("関西", 0L, 2L))
    assert(ja(4) == ("python", 8L, 14L))

    val ko = Seq("한국어 분석은 재미있다").toDF("text")
      .select(explode(Tokenize.tokenize(col("text"), TokenizerModels.KoDict)).as("t"))
      .select($"t.token").as[String].collect().toSeq
    assert(ko == Seq("한국어", "분석", "은", "재미있다"), ko)
  }

  test("hosted HF id fails fast; unknown id names itself") {
    val e = intercept[UnsupportedOperationException] {
      Tokenize.tokenize(col("text"), "huggingface:bert-base-uncased")
    }
    assert(e.getMessage.contains("register an offline backend"))
    val u = intercept[IllegalArgumentException] {
      Tokenize.tokenize(col("text"), "nope:missing")
    }
    assert(u.getMessage.contains("nope:missing"))
  }
}
