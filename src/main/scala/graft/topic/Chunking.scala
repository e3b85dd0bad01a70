package graft.topic

/** One chunk of a source document (reference
  * `/root/reference/src/topic_modeling/chunking.rs:27-32`): `docIndex` ties
  * the chunk to its document for rollup, `chunkIndex` is its 0-based ordinal
  * within the document. */
case class Chunk(docIndex: Long, chunkIndex: Int, text: String)

/** Paragraph → sentence → length chunking, re-derived from
  * `/root/reference/src/topic_modeling/chunking.rs:72-346`.
  *
  * Strategy: split paragraphs (blank-line boundaries) first; split oversized
  * paragraphs into sentences (same terminator set as `sentence_count`);
  * split oversized sentences by greedy word packing (single-word blobs by
  * characters); then pack units up to `maxTokens` with an `overlap`-token
  * suffix carried across chunk seams. A non-whitespace document always
  * yields ≥ 1 chunk; whitespace-only documents yield none.
  *
  * The token counter is injectable (the reference sizes with the embedder's
  * tokenizer, truncation disabled); the default counts plain-words tokens.
  *
  * Pure per-document function — in Spark it runs inside a `flatMap`/UDF, so
  * chunking is embarrassingly parallel and `posexplode` keeps
  * `(doc, chunk_index, text)` without any shuffle.
  */
object Chunking {

  final case class Config(maxTokens: Int = 256, overlap: Int = 32)

  private case class Unit(text: String, tokens: Int)

  private val Terminators = Set('.', '!', '?', '。', '！', '？', '۔', '؟', '।', '॥')

  /** Default sizer: plain-words token count (lowercase/punct-drop identical
    * to `token_frequencies`' hard-coded tokenize flags). */
  def defaultCounter(text: String): Int =
    graft.text.PlainTokenizer.tokenize(text).length

  def chunkDocument(
      docIndex: Long,
      doc: String,
      cfg: Config = Config(),
      countTokens: String => Int = defaultCounter): Vector[Chunk] = {
    require(cfg.maxTokens > 0, "chunking maxTokens must be > 0")
    if (doc == null || doc.trim.isEmpty) return Vector.empty

    val units = Vector.newBuilder[Unit]
    splitParagraphs(doc).foreach(p => appendSizedUnits(p, cfg.maxTokens, countTokens, units))

    packUnits(units.result(), cfg).zipWithIndex.map { case (text, i) =>
      Chunk(docIndex, i, text)
    }
  }

  private def appendSizedUnits(
      text: String,
      maxTokens: Int,
      count: String => Int,
      out: scala.collection.mutable.Builder[Unit, Vector[Unit]]): scala.Unit = {
    val trimmed = text.trim
    if (trimmed.isEmpty) return
    val tokens = count(trimmed)
    if (tokens <= maxTokens) { out += Unit(trimmed, tokens); return }
    val sentences = splitSentences(trimmed)
    if (sentences.length > 1)
      sentences.foreach { s =>
        val t = count(s)
        if (t <= maxTokens) out += Unit(s, t)
        else appendLengthUnits(s, maxTokens, count, out)
      }
    else appendLengthUnits(trimmed, maxTokens, count, out)
  }

  private def appendLengthUnits(
      text: String,
      maxTokens: Int,
      count: String => Int,
      out: scala.collection.mutable.Builder[Unit, Vector[Unit]]): scala.Unit = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.length > 1) {
      val packed = Vector.newBuilder[Unit]
      appendPackedSegments(words, " ", maxTokens, count, packed)
      packed.result().foreach { u =>
        if (u.tokens <= maxTokens) out += u
        else appendLengthUnits(u.text, maxTokens, count, out)
      }
    } else {
      // single-word blob: pack by code points
      val chars = new scala.collection.mutable.ArrayBuffer[String]
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        val n = Character.charCount(cp)
        chars += text.substring(i, i + n)
        i += n
      }
      appendPackedSegments(chars.toArray, "", maxTokens, count, out)
    }
  }

  private def appendPackedSegments(
      segments: Array[String],
      separator: String,
      maxTokens: Int,
      count: String => Int,
      out: scala.collection.mutable.Builder[Unit, Vector[Unit]]): scala.Unit = {
    var current = ""
    segments.foreach { segment =>
      val candidate = if (current.isEmpty) segment else current + separator + segment
      val candidateTokens = count(candidate)
      if (candidateTokens <= maxTokens || current.isEmpty) current = candidate
      else {
        out += Unit(current, count(current))
        current = segment
      }
    }
    if (current.trim.nonEmpty) out += Unit(current, count(current))
  }

  private def packUnits(units: Vector[Unit], cfg: Config): Vector[String] = {
    val overlap = math.min(cfg.overlap, math.max(cfg.maxTokens - 1, 0))
    val chunks = Vector.newBuilder[String]
    var current = Vector.empty[Unit]
    var currentTokens = 0

    units.foreach { unit =>
      if (current.nonEmpty && currentTokens + unit.tokens > cfg.maxTokens) {
        chunks += current.map(_.text).mkString(" ")
        current = overlapSuffix(current, overlap, cfg.maxTokens)
        currentTokens = current.map(_.tokens).sum
        while (current.nonEmpty && currentTokens + unit.tokens > cfg.maxTokens) {
          currentTokens -= current.head.tokens
          current = current.tail
        }
      }
      currentTokens += unit.tokens
      current = current :+ unit
    }
    if (current.nonEmpty) chunks += current.map(_.text).mkString(" ")
    chunks.result()
  }

  private def overlapSuffix(units: Vector[Unit], overlap: Int, maxTokens: Int): Vector[Unit] = {
    if (overlap == 0) return Vector.empty
    var selected = List.empty[Unit]
    var tokens = 0
    val it = units.reverseIterator
    var done = false
    while (it.hasNext && !done) {
      val unit = it.next()
      if (tokens + unit.tokens >= maxTokens) done = true
      else {
        selected = unit :: selected
        tokens += unit.tokens
        if (tokens >= overlap) done = true
      }
    }
    selected.toVector
  }

  private[topic] def splitParagraphs(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val current = new StringBuilder
    text.linesIterator.foreach { line =>
      val trimmed = line.trim
      if (trimmed.isEmpty) {
        if (current.nonEmpty) { out += current.result().trim; current.clear() }
      } else {
        if (current.nonEmpty) current.append('\n')
        current.append(trimmed)
      }
    }
    if (current.nonEmpty) out += current.result().trim
    out.result()
  }

  private[topic] def splitSentences(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (Terminators.contains(ch)) {
        val sentence = text.substring(start, i + 1).trim
        if (sentence.nonEmpty) out += sentence
        start = i + 1
      }
      i += 1
    }
    val trailing = text.substring(start).trim
    if (trailing.nonEmpty) out += trailing
    out.result()
  }
}
