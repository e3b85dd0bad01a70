package graft.text

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** One token with Unicode code-point offsets into the (optionally
  * lowercased) source text. Matches the reference's
  * `List(Struct{token, start, end})` output schema
  * (`/root/reference/src/expressions.rs:487-501`). */
case class Token(token: String, start: Long, end: Long)

/** `native:plain_words_en` tokenizer — BERT-style pre-tokenization
  * re-expressed from the reference's semantics
  * (`/root/reference/src/tokenizer.rs:62-117`):
  *
  *   1. optional full-Unicode lowercase (offsets then index the lowercased
  *      text — `tests/test_tokenize_with_offsets.py:64-78`),
  *   2. split on Unicode whitespace (separators removed),
  *   3. isolate every punctuation character (ASCII punctuation or Unicode
  *      category P*) as its own token,
  *   4. if `removePunct`, drop tokens containing no alphanumeric char,
  *   5. drop special tokens `[CLS] [SEP] [PAD] [UNK] [MASK]` — both the
  *      bracketed form and the bare word (`src/tokenizer.rs:30, 52-60`),
  *   6. offsets are Unicode code-point indices (JVM strings are UTF-16, so
  *      we walk code points; a Hanzi or an emoji counts as 1).
  *
  * Single O(C) pass — offsets are computed directly in code points, so the
  * reference's byte→char sweep (`src/offsets.rs:21-51`) is unnecessary here.
  */
object PlainTokenizer {

  private val SpecialWords = Set("CLS", "SEP", "PAD", "UNK", "MASK")

  private def asciiUpper(s: String): String =
    s.map(c => if (c >= 'a' && c <= 'z') (c - 32).toChar else c)

  /** `[CLS]` etc. or the bare word (reference `is_special_token_text`,
    * `src/tokenizer.rs:52-60`). */
  def isSpecialToken(tok: String): Boolean = {
    val up = asciiUpper(tok)
    SpecialWords.contains(up) ||
    (up.length > 2 && up.head == '[' && up.last == ']' &&
      SpecialWords.contains(up.substring(1, up.length - 1)))
  }

  /** Rust `char::is_whitespace` == Unicode White_Space. Java needs the union
    * of `isWhitespace` (control whitespace) and `isSpaceChar` (Zs/Zl/Zp,
    * incl. NBSP) plus U+0085 NEL, which neither Java predicate covers. */
  @inline def isWs(cp: Int): Boolean =
    Character.isWhitespace(cp) || Character.isSpaceChar(cp) || cp == 0x85

  /** HF BertPreTokenizer punctuation test: ASCII punctuation (all graphic
    * non-alnum ASCII) or Unicode general category P*. */
  @inline def isPunct(cp: Int): Boolean =
    if (cp < 128) {
      (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
      (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')
    } else {
      Character.getType(cp) match {
        case Character.CONNECTOR_PUNCTUATION | Character.DASH_PUNCTUATION |
            Character.START_PUNCTUATION | Character.END_PUNCTUATION |
            Character.INITIAL_QUOTE_PUNCTUATION |
            Character.FINAL_QUOTE_PUNCTUATION |
            Character.OTHER_PUNCTUATION =>
          true
        case _ => false
      }
    }

  /** Rust `char::is_alphanumeric` = Alphabetic ∪ {Nd, Nl, No}. */
  @inline def isAlnum(cp: Int): Boolean =
    Character.isLetterOrDigit(cp) || {
      val t = Character.getType(cp)
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }

  private def hasAlnum(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isAlnum(cp)) return true
      i += Character.charCount(cp)
    }
    false
  }

  def tokenize(
      text: String,
      lowercase: Boolean = true,
      removePunct: Boolean = true): Vector[Token] = {
    if (text == null || text.isEmpty) return Vector.empty
    val t = if (lowercase) text.toLowerCase(Locale.ROOT) else text
    val out = Vector.newBuilder[Token]

    def emit(tok: String, startCp: Long, endCp: Long): Unit = {
      if (tok.nonEmpty &&
        (!removePunct || hasAlnum(tok)) &&
        !isSpecialToken(tok)) {
        out += Token(tok, startCp, endCp)
      }
    }

    var i = 0 // UTF-16 index
    var cp$ = 0L // code-point index
    var segStart = -1 // UTF-16 start of current word segment
    var segStartCp = 0L
    def flush(endUtf16: Int, endCp: Long): Unit =
      if (segStart >= 0) {
        emit(t.substring(segStart, endUtf16), segStartCp, endCp)
        segStart = -1
      }
    while (i < t.length) {
      val cp = t.codePointAt(i)
      val n = Character.charCount(cp)
      if (isWs(cp)) {
        flush(i, cp$)
      } else if (isPunct(cp)) {
        flush(i, cp$)
        emit(t.substring(i, i + n), cp$, cp$ + 1)
      } else {
        if (segStart < 0) { segStart = i; segStartCp = cp$ }
      }
      i += n
      cp$ += 1
    }
    flush(t.length, cp$)
    out.result()
  }
}

/** A tokenizer backend: the reference's `TokenizerBackend` enum
  * (`src/tokenizer.rs:40-44`) as a trait so user-supplied backends
  * (WordPiece with a local vocab, a future morphological segmenter) plug
  * into the same registry, UDF, and offset machinery. Instances are
  * captured in UDF closures, so they must be serializable; heavyweight
  * state should live in lazy fields re-derived per executor. */
trait TokenizerBackend extends Serializable {
  def tokenize(text: String, lowercase: Boolean, removePunct: Boolean): Vector[Token]
  /** Lowercasing is meaningful (reference `case_aware`,
    * `src/tokenizer.rs:95-103`): caseless-script backends skip the fold. */
  def caseAware: Boolean = true
}

/** The `native:plain_words_en` backend. */
object PlainBackend extends TokenizerBackend {
  override def tokenize(text: String, lowercase: Boolean, removePunct: Boolean): Vector[Token] =
    PlainTokenizer.tokenize(text, lowercase, removePunct)
}

/** Model inventory + backend registry mirroring the reference's predefined
  * ids and process-wide registry
  * (`/root/reference/polars_text/models.py:22-57`,
  * `src/tokenizer.rs:211-241`). Only the native backend loads in this
  * zero-egress build; CJK (`lindera:*`) and hosted HuggingFace ids fail
  * fast with a clear message (deviation recorded in README). Users can
  * [[register]] an offline backend — e.g. a [[WordPieceTokenizer]] built
  * from a local vocab — under any id, including the predefined ones. */
object TokenizerModels {
  val PlainWordsEn = "native:plain_words_en"

  /** Bundled offline word-segmentation backends ([[DictSegBackend]]) —
    * the zero-egress stand-ins for the `lindera:*` zh/ja/ko ids:
    * word-level (zh/ja) / morpheme-level (ko) segmentation from shipped
    * dictionary resources, loaded lazily on first resolve (no network,
    * no model artifact). */
  val ZhDict = "local:zh-dict"
  val JaDict = "local:ja-dict"
  val KoDict = "local:ko-dict"

  /** id → supported language codes. The reference's 8 predefined ids
    * (`polars_text/models.py:22-57`) plus the bundled [[ZhDict]],
    * [[JaDict]], [[KoDict]]. */
  val inventory: Map[String, Seq[String]] = Map(
    PlainWordsEn -> Seq("en"),
    ZhDict -> Seq("zh"),
    JaDict -> Seq("ja"),
    KoDict -> Seq("ko"),
    "huggingface:bert-base-uncased" -> Seq("en"),
    "lindera:cc-cedict" -> Seq("zh"),
    "lindera:jieba" -> Seq("zh"),
    "lindera:ja-ipadic" -> Seq("ja"),
    "lindera:ja-ipadic-neologd" -> Seq("ja"),
    "lindera:ja-unidic" -> Seq("ja"),
    "lindera:ko-dic" -> Seq("ko"))

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, TokenizerBackend]()
  registry.put(PlainWordsEn, PlainBackend)

  /** Lazy bundled load. `putIfAbsent`, not `put`: a user backend
    * registered under the same id BEFORE the first resolve wins — the
    * register-or-replace contract says the bundled default must never
    * silently overwrite an explicit registration. */
  private def loadBundled(id: String, resource: String, inRun: Int => Boolean): Unit = {
    val in = getClass.getResourceAsStream(resource)
    // (Predef.require — this object's own require(model) shadows it)
    Predef.require(in != null, s"$resource bundled dictionary missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try registry.putIfAbsent(id, new DictSegBackend(ZhDictSegmenter.fromFreqText(src.getLines()), inRun))
    finally src.close()
    ()
  }
  private lazy val zhDictLoaded: Unit = loadBundled(ZhDict, "/graft/zh_dict.txt", ZhDictSegmenter.isHan)
  private lazy val jaDictLoaded: Unit = loadBundled(JaDict, "/graft/ja_dict.txt", ZhDictSegmenter.isJa)
  private lazy val koDictLoaded: Unit = loadBundled(KoDict, "/graft/ko_dict.txt", ZhDictSegmenter.isHangul)

  /** Register (or replace) a backend under `id`. */
  def register(id: String, backend: TokenizerBackend): Unit = { registry.put(id, backend); () }

  /** Opt-in gate: serve `lindera:*` ids with the bundled dictionary
    * segmenters ([[ZhDict]]/[[JaDict]]/[[KoDict]]) instead of failing
    * fast. The reference keeps its own Lindera integration behind an
    * explicit env opt-in too (`POLARS_TEXT_RUN_LINDERA_TESTS`,
    * `/root/reference/tests/test_lindera_integration.py:23-31`); this
    * mirrors that posture for the zero-egress build. DEFAULT OFF: the
    * bundled DP segmenters share Lindera's dictionary-DAG family (jieba's
    * max-probability DP is literally `lindera:jieba`'s algorithm) but not
    * its dictionaries or the ja/ko lattice costs, so substituting them
    * must be an explicit user decision, never silent. System property
    * takes precedence over env so tests can exercise the gate in-JVM. */
  val LinderaFallbackEnv = "GRAFT_LINDERA_DICT_FALLBACK"
  val LinderaFallbackProp = "graft.lindera.dict.fallback"
  private def linderaFallbackEnabled: Boolean = {
    val v = sys.props.get(LinderaFallbackProp).orElse(sys.env.get(LinderaFallbackEnv))
    v.exists(s => s == "1" || s.equalsIgnoreCase("true"))
  }
  private val linderaWarned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** The bundled stand-in for a `lindera:*` id, by inventory language. */
  private def linderaBundledId(model: String): Option[String] =
    inventory.get(model).collect {
      case langs if langs.contains("zh") => ZhDict
      case langs if langs.contains("ja") => JaDict
      case langs if langs.contains("ko") => KoDict
    }

  /** Resolve a model id to its backend; unknown ids and registered-but-
    * unloaded ids fail with distinct messages (the reference's
    * `ensure_tokenizer_for_model` contract). */
  def resolve(model: String): TokenizerBackend = {
    // idempotent bundled loads
    if (model == ZhDict) zhDictLoaded
    else if (model == JaDict) jaDictLoaded
    else if (model == KoDict) koDictLoaded
    val found = registry.get(model)
    if (found != null) found
    else if (model.startsWith("huggingface:") && HfTokenizerGate.servesId(model)) {
      // gated local tokenizer.json (never the network); putIfAbsent so an
      // explicit registration under the id still wins
      registry.putIfAbsent(model, HfTokenizerJson.fromEnv())
      registry.get(model)
    } else if (model.startsWith("lindera:") && linderaFallbackEnabled &&
        linderaBundledId(model).isDefined) {
      val sub = linderaBundledId(model).get
      if (linderaWarned.add(model))
        System.err.println(
          s"[graft] $model → bundled $sub dictionary segmenter " +
            s"($LinderaFallbackEnv opt-in); NOT the Lindera lattice/dictionaries")
      // resolved DYNAMICALLY, never written into the registry under the
      // lindera id: disabling the gate restores fail-fast, and an explicit
      // register() under the id always wins (checked above)
      resolve(sub)
    } else if (!inventory.contains(model))
      throw new IllegalArgumentException(
        s"unknown tokenizer model '$model'; known: ${(inventory.keys ++ loadedModels).toSeq.distinct.sorted.mkString(", ")}")
    else {
      val langs = inventory(model)
      val bundled =
        if (langs.contains("zh")) s" or the bundled $ZhDict"
        else if (langs.contains("ja")) s" or the bundled $JaDict"
        else if (langs.contains("ko")) s" or the bundled $KoDict"
        else ""
      val hfHint =
        if (model.startsWith("huggingface:"))
          s"; or point ${HfTokenizerGate.TokenizerJsonEnv} at a local " +
            s"tokenizer.json (and ${HfTokenizerGate.ModelIdEnv} at '$model')"
        else if (model.startsWith("lindera:"))
          s"; or set $LinderaFallbackEnv=1 to serve lindera:* ids with the " +
            "bundled dictionary segmenters"
        else ""
      throw new UnsupportedOperationException(
        s"tokenizer model '$model' requires a network-fetched backend, " +
          "unavailable in this offline build; use " + PlainWordsEn + bundled +
          " or register an offline backend via TokenizerModels.register" + hfHint)
    }
  }

  /** Idempotent warm-load (`prefetch_model` parity). */
  def prefetch(model: String): Unit = { resolve(model); () }

  /** Sorted ids with a loaded backend (`list_loaded_models` parity). */
  def loadedModels: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keys.asScala.toSeq.sorted
  }

  def require(model: String): Unit = { resolve(model); () }
}

/** Column-level tokenize API. Deterministic UDF (same input ⇒ same output)
  * so Catalyst keeps filter/limit pushdown below it — the reference's
  * `is_elementwise=True` contract (`polars_text/functions.py:70`). */
object Tokenize {

  /** The token-string array (`array<string>`) of [[tokenize]] — the
    * `transform(tokenize(c), _.getField("token"))` projection every
    * token-stream operator opens with, as the native
    * [[TokenStringsExpr]] so the scan stays inside whole-stage codegen
    * (ArrayTransform is CodegenFallback). Same values, null-for-null. */
  def tokenStrings(
      c: Column,
      model: String = TokenizerModels.PlainWordsEn,
      lowercase: Boolean = true,
      removePunct: Boolean = true): Column =
    org.apache.spark.sql.graft.Bridge.column(
      TokenStringsExpr(org.apache.spark.sql.graft.Bridge.expression(
        tokenize(c, model, lowercase, removePunct))))

  /** `size(tokenize(c))` without the array: the count-only native
    * expression on the plain-words hot path (no per-token struct/string
    * materialization — what [[graft.sql.TokenCountRewrite]] gives SQL
    * users, offered to the Column API directly), `size(tokenize)` for
    * every other backend. Null text counts 0 on both paths. */
  def tokenCount(
      c: Column,
      model: String = TokenizerModels.PlainWordsEn,
      lowercase: Boolean = true,
      removePunct: Boolean = true): Column = {
    val backend = TokenizerModels.resolve(model)
    if (backend eq PlainBackend)
      org.apache.spark.sql.graft.Bridge.column(
        TokenCountExpr(org.apache.spark.sql.graft.Bridge.expression(c), lowercase, removePunct))
    else org.apache.spark.sql.functions.size(tokenize(c, model, lowercase, removePunct))
  }

  def tokenize(
      c: Column,
      model: String = TokenizerModels.PlainWordsEn,
      lowercase: Boolean = true,
      removePunct: Boolean = true): Column = {
    val backend = TokenizerModels.resolve(model) // fail fast at plan build
    if (backend eq PlainBackend) {
      // hot path: native Catalyst expression — no UDF encoder round-trip,
      // stays inside whole-stage codegen (TokenizeExpression.scala)
      org.apache.spark.sql.graft.Bridge.column(
        TokenizeExpr(org.apache.spark.sql.graft.Bridge.expression(c), lowercase, removePunct))
    } else {
      val lc = lowercase && backend.caseAware
      val f = udf { text: String =>
        backend.tokenize(if (text == null) "" else text, lc, removePunct)
      }
      f(c)
    }
  }
}
