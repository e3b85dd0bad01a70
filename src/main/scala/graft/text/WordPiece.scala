package graft.text

/** WordPiece subword tokenizer — the algorithm behind the reference's
  * `huggingface:*` backend (`/root/reference/src/tokenizer.rs:144-162`),
  * implemented from the published BERT greedy longest-match-first scheme so
  * it runs offline against any caller-supplied vocabulary.
  *
  * Contract pinned by the reference's tests
  * (`tests/test_tokenize_with_offsets.py:64-78`):
  *   - continuation pieces carry a `##` prefix in the token string,
  *   - offsets index the *unprefixed* substring of the (lowercased when
  *     `lowercase=true`) text, in Unicode code points,
  *   - a word with no vocab decomposition becomes `[UNK]`, which the
  *     special-token filter then drops,
  *   - pre-tokenization is the same BERT-style whitespace+punctuation
  *     split as `native:plain_words_en`.
  *
  * The hosted `huggingface:bert-base-uncased` id stays fail-fast (its
  * vocabulary is a network artifact); users with a local `vocab.txt` build
  * a backend with `WordPieceTokenizer(vocab)` and register it under any id.
  */
final class WordPieceTokenizer(
    vocab: Set[String],
    unkToken: String = "[UNK]",
    maxInputCharsPerWord: Int = 100,
    contPrefix: String = "##",
    override val caseAware: Boolean = true)
    extends TokenizerBackend {

  override def tokenize(
      text: String,
      lowercase: Boolean,
      removePunct: Boolean): Vector[Token] = {
    // Pre-tokenize keeping punctuation pieces (WordPiece vocabularies
    // contain punctuation); drop-filters apply after subword splitting.
    val pre = PlainTokenizer.tokenize(text, lowercase, removePunct = false)
    val out = Vector.newBuilder[Token]
    pre.foreach { word =>
      wordPieces(word.token).foreach { case (piece, relStart, relEnd) =>
        val bare = if (piece.startsWith(contPrefix)) piece.substring(contPrefix.length) else piece
        val keep = !PlainTokenizer.isSpecialToken(piece) &&
          (!removePunct || bare.exists(c => Character.isLetterOrDigit(c)))
        if (keep) out += Token(piece, word.start + relStart, word.start + relEnd)
      }
    }
    out.result()
  }

  /** Greedy longest-match-first decomposition of one pre-token. Returns
    * `(piece, startCp, endCp)` with offsets relative to the word. */
  private[text] def wordPieces(word: String): Vector[(String, Long, Long)] = {
    // operate on code points so offsets stay code-point-faithful
    val cps = word.codePoints().toArray
    if (cps.length > maxInputCharsPerWord) return Vector((unkToken, 0L, cps.length.toLong))
    val pieces = Vector.newBuilder[(String, Long, Long)]
    var start = 0
    while (start < cps.length) {
      var end = cps.length
      var found: String = null
      while (found == null && end > start) {
        val prefix = if (start > 0) contPrefix else ""
        val candidate = prefix + new String(cps, start, end - start)
        if (vocab.contains(candidate)) found = candidate
        else end -= 1
      }
      if (found == null) return Vector((unkToken, 0L, cps.length.toLong))
      pieces += ((found, start.toLong, end.toLong))
      start = end
    }
    pieces.result()
  }
}

object WordPieceTokenizer {

  /** Build from `vocab.txt` content (one piece per line — the HF/BERT
    * distribution format). */
  def fromVocabText(lines: Iterator[String]): WordPieceTokenizer =
    new WordPieceTokenizer(lines.map(_.trim).filter(_.nonEmpty).toSet)
}
