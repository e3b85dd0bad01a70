package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / boilerplate scrubbing for web-scale training corpora — the
  * redaction verbs the C4 pipeline (Raffel et al. 2020, arXiv:1910.10683)
  * and successors apply before dedup: URL and e-mail redaction, control
  * character stripping. The reference engine stops at `clean_text`
  * normalization; these extend its cleaning tier with the
  * sanitization steps a curation pipeline runs first.
  *
  * Every verb is a single codegen'd `regexp_replace` — pure Column,
  * elementwise, scan speed, composes under predicate pushdown. Patterns
  * are exported as constants so an external checker (or the DuckDB
  * oracle) can re-derive the scrub independently; they use the portable
  * regex subset (character classes, `\b`, greedy quantifiers) that Java
  * regex and RE2 interpret identically.
  */
object Scrub {

  /** http(s) URLs and bare `www.` hosts, through the next whitespace. */
  val UrlPattern = "(?i)\\b(?:https?://|www\\.)[^\\s]+"

  /** RFC-ish mailbox: local part with dots/plus-tags, dotted domain. */
  val EmailPattern = "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\b"

  /** C0 controls (minus tab/newline/CR, which are layout) + DEL. */
  val ControlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  def redactUrls(c: Column, placeholder: String = "<URL>"): Column =
    regexp_replace(c, UrlPattern, placeholder)

  def redactEmails(c: Column, placeholder: String = "<EMAIL>"): Column =
    regexp_replace(c, EmailPattern, placeholder)

  def stripControls(c: Column): Column =
    regexp_replace(c, ControlPattern, "")

  /** The full scrub, in the only safe order: URLs first (an address
    * inside a URL's query string belongs to the URL), then e-mails, then
    * control characters. Null passes through as null, like the other
    * elementwise verbs. */
  def scrub(
      c: Column,
      urlPlaceholder: String = "<URL>",
      emailPlaceholder: String = "<EMAIL>"): Column =
    stripControls(redactEmails(redactUrls(c, urlPlaceholder), emailPlaceholder))
}
