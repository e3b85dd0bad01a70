package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Elementwise text operators (SURVEY.md §2.1).
  *
  * Semantics match the reference implementation
  * (`/root/reference/src/expressions.rs:53-184`) exactly, including its null
  * contract (null → "" / 0, never null — `src/expressions.rs:84-103`).
  *
  * Everything here is a pure `Column` composition over Spark built-ins: no
  * UDFs, so the whole tier stays inside whole-stage codegen, filters push
  * down past it to the parquet scan, and Catalyst can constant-fold /
  * reorder freely. At 100 TB these run at scan speed.
  */
object TextFunctions {

  /** Unicode White_Space — Java regex `\p{IsWhite_Space}` equals Rust
    * `char::is_whitespace` (the reference's whitespace test). */
  private val Ws = "\\p{IsWhite_Space}"

  /** Rust `char::is_ascii_punctuation` (all ASCII graphic non-alnum) plus
    * ASCII digits — the exact replacement class of the reference's
    * `clean_text` (`src/expressions.rs:53-66`). */
  private val PunctOrDigit = "[!-/:-@\\[-`{-~0-9]"

  /** CJK "word characters" — Han, Ext-A, Ext-B, Hiragana, Katakana, Hangul
    * (`src/expressions.rs:114-131`). `\x{...}` syntax so the same class text
    * works in Java regex and RE2 (DuckDB oracle). */
  val CjkClass: String =
    "[\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}\\x{20000}-\\x{2A6DF}" +
      "\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}\\x{AC00}-\\x{D7AF}]"

  /** Sentence terminators: ASCII `.!?`, CJK full-width, Arabic, Devanagari
    * (`src/expressions.rs:163-176`). */
  val SentenceTerminators: String = "[.!?。！？۔؟।॥]"

  private def notNull(c: Column): Column = coalesce(c, lit(""))

  /** Unicode-aware trim (Spark's `trim` only strips ASCII space). */
  private def uniTrim(c: Column): Column =
    regexp_replace(c, s"^$Ws+|$Ws+$$", "")

  /** lowercase → ASCII punctuation/digits → space → collapse whitespace runs
    * → trim. Unicode letters/CJK pass through. null → "". */
  def cleanText(c: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(lower(notNull(c)), PunctOrDigit, " "),
        s"$Ws+",
        " "))

  /** 3-branch word count: whitespace-split count if any internal whitespace;
    * per-character count for pure-CJK runs; else 1. Empty/null → 0. */
  def wordCount(c: Column): Column = {
    val t = uniTrim(notNull(c))
    when(t === "", lit(0L))
      .when(t.rlike(Ws), size(split(t, s"$Ws+")).cast("long"))
      .when(t.rlike(s"^$CjkClass+$$"), length(t).cast("long"))
      .otherwise(lit(1L))
  }

  /** Unicode code-point count. null → 0. (Spark `length` on StringType is
    * already code-point based.) */
  def charCount(c: Column): Column = length(notNull(c)).cast("long")

  /** Count non-whitespace-only segments between sentence terminators.
    * null → 0. */
  def sentenceCount(c: Column): Column =
    size(
      filter(
        split(notNull(c), SentenceTerminators),
        s => s.rlike(s"[^$Ws]")))
      .cast("long")
}
