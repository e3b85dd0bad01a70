package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixtures from the reference's pytest suite — FIXTURES.md §A
  * (`tests/test_polars_text_utils.py`). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](input: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(Option(input)).toDF("s").select(c(col("s"))).collect()(0).get(0).asInstanceOf[T]

  test("clean_text fixtures") {
    assert(one[String]("Hello, World! 123", TextFunctions.cleanText) == "hello world")
    assert(one[String]("  Hi--there\t42 ", TextFunctions.cleanText) == "hi there")
    assert(one[String](null, TextFunctions.cleanText) == "")
    assert(one[String]("今天天气很好。", TextFunctions.cleanText) == "今天天气很好。")
  }

  test("word_count fixtures — all three branches") {
    val cases = Seq(
      "hello world" -> 2L,
      "  one   two  " -> 2L,
      "single" -> 1L,
      "" -> 0L,
      null.asInstanceOf[String] -> 0L,
      "今天天气很好" -> 6L,
      "ご飯" -> 2L,
      "안녕하세요" -> 5L,
      "Hello 你好" -> 2L,
      "今天 nice 天气" -> 3L)
    for ((in, want) <- cases)
      assert(one[Long](in, TextFunctions.wordCount) == want, s"input=$in")
  }

  test("char_count fixtures — code points, not UTF-16 units") {
    assert(one[Long]("abc", TextFunctions.charCount) == 3L)
    assert(one[Long]("", TextFunctions.charCount) == 0L)
    assert(one[Long](null, TextFunctions.charCount) == 0L)
    assert(one[Long]("今天", TextFunctions.charCount) == 2L)
    assert(one[Long]("hi 🙂", TextFunctions.charCount) == 4L) // emoji = 1
  }

  test("sentence_count fixtures") {
    val cases = Seq(
      "One. Two? Three!" -> 3L,
      "今天天气很好。明天也会很好！你想去哪里？" -> 3L,
      "ご飯を食べました。映画を見ますか？" -> 2L,
      "Hello. 你好。" -> 2L,
      "" -> 0L,
      null.asInstanceOf[String] -> 0L)
    for ((in, want) <- cases)
      assert(one[Long](in, TextFunctions.sentenceCount) == want, s"input=$in")
  }
}
