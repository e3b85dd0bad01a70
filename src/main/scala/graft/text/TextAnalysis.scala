package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines beyond the
  * reference's surface (builder mandate): language identification, quality
  * scoring, and document fingerprinting.
  *
  * Everything here is pure `Column` algebra over built-ins — no UDFs, so
  * the tier stays inside whole-stage codegen and runs at scan speed at any
  * scale, and every operator is SQL-expressible for the DuckDB oracle.
  */
object TextAnalysis {

  /** Latin-script language markers: tiny per-language function-word lists
    * (the classic cheap lang-id heuristic; script ranges handle CJK). */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "los", "que", "y", "es", "una", "para"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour"))

  /** Marker priority order for deterministic ties. */
  val MarkerLangs: Seq[String] = Seq("en", "de", "es", "fr")

  /** English stopwords for the quality heuristic. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "is", "in", "it", "that", "for", "on")

  private def notNull(c: Column): Column = coalesce(c, lit(""))

  /** Lowercased whitespace tokens (cheap heuristic tokenization — quality
    * metrics don't need offset-faithful tokens). */
  private def wsTokens(c: Column): Column =
    filter(split(lower(notNull(c)), "\\s+"), t => t =!= "")

  private def markerHits(c: Column, words: Seq[String]): Column =
    size(filter(wsTokens(c), t => t.isInCollection(words)))

  private def charClassCount(c: Column, clazz: String): Column =
    length(notNull(c)) - length(regexp_replace(notNull(c), clazz, ""))

  /** Script + function-word language id:
    *   1. any kana → `ja` (kana is unique to Japanese),
    *   2. any hangul → `ko`,
    *   3. Han ≥ 30% of characters → `zh`,
    *   4. otherwise the marker list with the most hits (priority order
    *      breaks ties), `und` when nothing fires. */
  def langId(c: Column): Column = {
    val kana = charClassCount(c, "[\\x{3040}-\\x{30FF}]")
    val hangul = charClassCount(c, "[\\x{AC00}-\\x{D7AF}]")
    val han = charClassCount(c, "[\\x{4E00}-\\x{9FFF}]")
    val hits = MarkerLangs.map(l => l -> markerHits(c, Markers(l))).toMap
    // first language (in priority order) with hits > 0 that ties-or-beats
    // every other language's hit count
    val best = MarkerLangs.foldRight(lit("und")) { (lang, onward) =>
      val wins = MarkerLangs.filterNot(_ == lang).foldLeft(hits(lang) > 0) {
        (acc, other) => acc && hits(lang) >= hits(other)
      }
      when(wins, lit(lang)).otherwise(onward)
    }
    when(kana > 0, "ja")
      .when(hangul > 0, "ko")
      .when(han > 0 && han * 10 >= length(notNull(c)) * 3, "zh")
      .otherwise(best)
  }

  /** Quality metrics + a composite score in [0, 1]
    * (Gopher-style cheap filters: enough words, low punctuation/digit
    * noise, some stopword mass):
    * {{{ score = min(1, n_words/20) · (1-punct_ratio) · (1-digit_ratio) }}}
    * `keep` flags docs with ≥ 10 words and ≥ 1 stopword hit. */
  def qualityMetrics(c: Column): Seq[(String, Column)] = {
    val chars = length(notNull(c))
    val words = size(wsTokens(c)).cast("long")
    val punct = charClassCount(c, "[!-/:-@\\[-`{-~]")
    val digits = charClassCount(c, "[0-9]")
    val stop = markerHits(c, EnStopwords).cast("long")
    val safeChars = greatest(chars.cast("double"), lit(1.0))
    val safeWords = greatest(words.cast("double"), lit(1.0))
    val punctRatio = punct / safeChars
    val digitRatio = digits / safeChars
    Seq(
      "n_words" -> words,
      "punct_ratio" -> punctRatio,
      "digit_ratio" -> digitRatio,
      "stopword_ratio" -> stop / safeWords,
      "quality_score" ->
        least(lit(1.0), words / lit(20.0)) * (lit(1.0) - punctRatio) * (lit(1.0) - digitRatio),
      "keep" -> (words >= 10 && stop >= 1))
  }

  /** Deterministic document fingerprint: polynomial rolling hash
    * `h = (h·31 + codepoint) mod 1e9+7` over the `clean_text`-normalized
    * Unicode code points, so trivially-reformatted documents collide.
    * Implemented as the native codegen'd [[CodePointHashExpr]] — genuinely
    * code-point-based (surrogate pairs hash as one value), so the result
    * matches DuckDB's `unicode(ch)` formulation on any corpus, not just
    * ASCII, with one walk per row and no per-character array. */
  def fingerprint(c: Column): Column =
    codePointHash(TextFunctions.cleanText(c))

  /** The fingerprint's hash kernel over the RAW string (no `clean_text`
    * normalization): `h = (h·31 + codepoint) mod 1e9+7`. Collision-grade
    * only — it is affine in the trailing character, so anything that
    * thresholds or buckets hash values should use [[fnv1a64]] instead. */
  def codePointHash(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(CodePointHashExpr(Bridge.expression(c)))
  }

  /** FNV-1a 64 over the code points of the RAW string — the engine's
    * well-avalanched oracle-recomputable hash, for sampling gates and
    * bucket assignment ([[Fnv1aExpr]] for why the 31-hash won't do). */
  def fnv1a64(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Fnv1aExpr(Bridge.expression(c)))
  }

  /** Stride-1 k-token shingle keys of the text ([[ShingleKeysExpr]]). */
  def shingleKeys(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ShingleKeysExpr(Bridge.expression(c), k))
  }

  /** Winnowing fingerprints `array<struct<pos, fp>>` over the k-token
    * shingle stream with window `w` ([[WinnowExpr]]): density ~2/(w+1),
    * guaranteed hit for any shared run of ≥ w+k−1 tokens. */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(WinnowExpr(Bridge.expression(c), k, w))
  }
}
