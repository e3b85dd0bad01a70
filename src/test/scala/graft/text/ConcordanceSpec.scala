package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Concordance semantics — fixtures mirror the reference's contract tests
  * (`tests/test_concordance.py:5-50`) plus offset/edge behavior from
  * `src/concordance.rs:58-150`. */
class ConcordanceSpec extends AnyFunSuite {

  private val text = "Hello world, hello again."

  test("case-insensitive match finds both casings; contexts tokenized raw") {
    val m = Concordance.concordance(text, "hello", numLeftTokens = 1, numRightTokens = 2)
    assert(m.size == 2)

    val first = m(0)
    assert(first.matched_text == "Hello")
    assert(first.left_context == "")
    assert(first.l1 == "")
    // context tokenize keeps case and punctuation (lowercase=false, removePunct=false)
    assert(first.right_context == "world ,")
    assert(first.r1 == "world")
    assert((first.start_idx, first.end_idx) == (0L, 5L))

    val second = m(1)
    assert(second.matched_text == "hello")
    assert(second.left_context == ",")
    assert(second.l1 == ",")
    assert(second.right_context == "again .")
    assert(second.r1 == "again")
    assert((second.start_idx, second.end_idx) == (13L, 18L))
  }

  test("case-sensitive matches only the exact casing") {
    val m = Concordance.concordance(text, "hello", caseSensitive = true)
    assert(m.map(_.start_idx) == Vector(13L))
  }

  test("empty search word / null / empty text → no matches") {
    assert(Concordance.concordance(text, "").isEmpty)
    assert(Concordance.concordance(null, "x").isEmpty)
    assert(Concordance.concordance("", "x").isEmpty)
    assert(Concordance.concordance(text, null).isEmpty)
  }

  test("no matches → empty") {
    assert(Concordance.concordance(text, "zebra").isEmpty)
  }

  test("offsets are code points (emoji counts 1)") {
    val m = Concordance.concordance("aa 😀 bb", "bb")
    assert(m.size == 1)
    assert((m(0).start_idx, m(0).end_idx) == (5L, 7L))
    assert(m(0).left_context == "aa 😀")
    assert(m(0).l1 == "😀")
  }

  test("regex mode matches pattern; escaped mode treats it literally") {
    val rx = Concordance.concordance("cat cot cut", "c.t", regex = true)
    assert(rx.map(_.matched_text) == Vector("cat", "cot", "cut"))
    val lit = Concordance.concordance("cat c.t cut", "c.t")
    assert(lit.map(_.start_idx) == Vector(4L))
  }

  test("context windows clamp at text bounds and zero widths yield empty") {
    val m = Concordance.concordance("a b spark c d", "spark", numLeftTokens = 10, numRightTokens = 0)
    assert(m.size == 1)
    assert(m(0).left_context == "a b")
    assert(m(0).right_context == "")
    assert(m(0).r1 == "")
  }

  test("multiple matches keep ascending offsets (single-sweep conversion)") {
    val m = Concordance.concordance("x spark y spark z spark", "spark")
    assert(m.map(_.start_idx) == Vector(2L, 10L, 18L))
    assert(m.map(_.end_idx) == Vector(7L, 15L, 23L))
  }
}
