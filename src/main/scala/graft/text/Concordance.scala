package graft.text

import java.util.regex.Pattern

import org.apache.spark.sql.Column

/** One KWIC (keyword-in-context) match. Field set and order mirror the
  * reference's 7-field struct
  * (`/root/reference/src/concordance.rs:17-34`). Offsets are Unicode
  * code-point indices into the source text. */
case class ConcordanceMatch(
    left_context: String,
    matched_text: String,
    right_context: String,
    start_idx: Long,
    end_idx: Long,
    l1: String,
    r1: String)

/** Concordance (KWIC) — semantics re-derived from
  * `/root/reference/src/concordance.rs:58-150`:
  *
  *   - empty search word → no matches; null text → no matches,
  *   - the pattern is regex-escaped unless `regex=true`; matching is
  *     case-insensitive unless `caseSensitive=true`,
  *   - for every (non-overlapping) match: the text left/right of the match
  *     is tokenized with the plain-words tokenizer *without* lowercasing or
  *     punctuation-removal (`src/concordance.rs:101-102`), the last
  *     `numLeftTokens` / first `numRightTokens` are kept and joined with a
  *     single space (`detokenize`, `src/concordance.rs:51-56`),
  *   - `l1`/`r1` are the nearest left/right tokens ("" when absent),
  *   - `start_idx`/`end_idx` are code-point offsets of the match, computed
  *     in one forward sweep over the text (O(C+M), the reference's
  *     optimization at `src/concordance.rs:82-90`).
  *
  * Scale: elementwise and deterministic — Catalyst keeps pushdown below it,
  * rows process independently, no shuffle is introduced. At 100 TB the
  * operator runs at scan speed; the downstream `explode` fans out matches
  * without materializing per-document state.
  */
object Concordance {

  /** Compile the search pattern once per invocation — the pattern is
    * constant for a whole column call, so per-row compilation would be pure
    * overhead on the hot KWIC path (the reference likewise compiles once,
    * `src/concordance.rs:64-70`). `Pattern` is immutable and thread-safe;
    * only the per-text `Matcher` is allocated per row. */
  private[text] def compilePattern(
      searchWord: String,
      regex: Boolean,
      caseSensitive: Boolean): Pattern = {
    val pattern = if (regex) searchWord else Pattern.quote(searchWord)
    var flags = 0
    if (!caseSensitive) flags |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
    Pattern.compile(pattern, flags)
  }

  def concordance(
      text: String,
      searchWord: String,
      numLeftTokens: Int = 5,
      numRightTokens: Int = 5,
      regex: Boolean = false,
      caseSensitive: Boolean = false): Vector[ConcordanceMatch] = {
    if (searchWord == null || searchWord.isEmpty) Vector.empty
    else concordance(text, compilePattern(searchWord, regex, caseSensitive), numLeftTokens, numRightTokens)
  }

  /** Core matcher over a pre-compiled pattern (one compile per column
    * call, not per row). */
  def concordance(
      text: String,
      compiled: Pattern,
      numLeftTokens: Int,
      numRightTokens: Int): Vector[ConcordanceMatch] = {
    if (text == null || text.isEmpty)
      return Vector.empty

    val matcher = compiled.matcher(text)

    val out = Vector.newBuilder[ConcordanceMatch]
    // Single forward sweep converting UTF-16 match offsets to code-point
    // offsets: matches arrive in ascending order, so we carry the running
    // code-point count instead of rescanning the prefix per match.
    var sweepUtf16 = 0
    var sweepCp = 0L
    def cpAt(utf16: Int): Long = {
      sweepCp += text.codePointCount(sweepUtf16, utf16)
      sweepUtf16 = utf16
      sweepCp
    }

    while (matcher.find()) {
      val s = matcher.start()
      val e = matcher.end()
      val startCp = cpAt(s)
      val endCp = cpAt(e)

      val leftTokens = PlainTokenizer
        .tokenize(text.substring(0, s), lowercase = false, removePunct = false)
        .map(_.token)
      val rightTokens = PlainTokenizer
        .tokenize(text.substring(e), lowercase = false, removePunct = false)
        .map(_.token)

      val leftSlice =
        if (numLeftTokens <= 0) Vector.empty[String]
        else leftTokens.takeRight(numLeftTokens)
      val rightSlice =
        if (numRightTokens <= 0) Vector.empty[String]
        else rightTokens.take(numRightTokens)

      out += ConcordanceMatch(
        left_context = leftSlice.mkString(" "),
        matched_text = matcher.group(),
        right_context = rightSlice.mkString(" "),
        start_idx = startCp,
        end_idx = endCp,
        l1 = leftSlice.lastOption.getOrElse(""),
        r1 = rightSlice.headOption.getOrElse(""))
    }
    out.result()
  }

  /** Column API: returns `ArrayType(StructType(...7 fields...))`; compose
    * with `explode` + `col("c.*")` exactly like the reference's
    * `.list.explode().struct.unnest()` (`tests/test_concordance.py:33-50`). */
  def concordanceCol(
      c: Column,
      searchWord: String,
      numLeftTokens: Int = 5,
      numRightTokens: Int = 5,
      regex: Boolean = false,
      caseSensitive: Boolean = false): Column = {
    // The codegen'd [[ConcordanceExpr]] — pattern compiled once per
    // expression (never per row), no case-class encoder round-trip.
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ConcordanceExpr(
      Bridge.expression(c), searchWord, numLeftTokens, numRightTokens,
      regex, caseSensitive))
  }
}
