package graft.text

/** Gated LOCAL-FILE loader for a HuggingFace `tokenizer.json` — the
  * offline counterpart of the reference's hub fetch
  * (`/root/reference/src/tokenizer.rs:291-306`: resolve the model repo,
  * download `tokenizer.json`, build the tokenizer). This build is
  * zero-egress, so the artifact must already be on local disk; the gate
  * follows the exact posture proven by
  * [[graft.embed.OnnxRuntimeGate]]:
  *
  *   1. `GRAFT_HF_TOKENIZER_JSON` names a local `tokenizer.json`;
  *   2. `GRAFT_HF_TOKENIZER_MODEL_ID` (default
  *      `huggingface:bert-base-uncased`) names the ONE id the artifact
  *      serves — other `huggingface:*` ids keep failing fast rather
  *      than silently aliasing the wrong vocabulary.
  *
  * Only the `WordPiece` model type loads (the algorithm this engine
  * implements natively — [[WordPieceTokenizer]]); a BPE/Unigram file
  * fails with its actual type named, not a wrong tokenization. The
  * parse reads the published `tokenizer.json` schema: `model.vocab`
  * (piece → id), `model.unk_token`, `model.continuing_subword_prefix`,
  * `model.max_input_chars_per_word`, and honors
  * `normalizer.lowercase == false` by flipping the backend to
  * case-preserving (`caseAware = false` semantics are the registry's
  * existing contract for caseless backends).
  *
  * Offset contract pinned by the reference
  * (`tests/test_tokenize_with_offsets.py:64-78`): continuation pieces
  * carry the `##` prefix in the token string, offsets index the
  * UNPREFIXED substring of the lowercased text in code points —
  * [[WordPieceTokenizer]] already implements it; this file only
  * supplies a real vocabulary.
  */
object HfTokenizerGate {

  val TokenizerJsonEnv = "GRAFT_HF_TOKENIZER_JSON"
  val ModelIdEnv = "GRAFT_HF_TOKENIZER_MODEL_ID"
  val DefaultModelId = "huggingface:bert-base-uncased"

  /** System properties take precedence over env (the LinderaFallbackProp
    * pattern) so in-JVM callers — the q_tokenize_hf_json query, specs —
    * can open the gate for a scoped span without process env. */
  val TokenizerJsonProp = "graft.hf.tokenizer.json"
  val ModelIdProp = "graft.hf.tokenizer.model.id"

  def tokenizerJsonPath: Option[String] = {
    // filter each source independently: a property pointing at a
    // missing/stale file falls through to the env var instead of
    // silently disabling it
    def existing(p: Option[String]) = p.filter(f => new java.io.File(f).isFile)
    existing(sys.props.get(TokenizerJsonProp))
      .orElse(existing(sys.env.get(TokenizerJsonEnv)))
  }

  def configuredModelId: String =
    sys.props.get(ModelIdProp).orElse(sys.env.get(ModelIdEnv)).getOrElse(DefaultModelId)

  def available: Boolean = tokenizerJsonPath.isDefined

  /** Does the local artifact serve this id? One artifact, one id. */
  def servesId(id: String): Boolean = available && id == configuredModelId

  def unavailableReason: String =
    if (available) "available"
    else s"$TokenizerJsonEnv does not name a local tokenizer.json file"
}

object HfTokenizerJson {

  /** Parse a local `tokenizer.json` into the native WordPiece backend.
    * Jackson rides on Spark's own classpath — no new dependency. */
  def load(path: String): WordPieceTokenizer = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    val model = root.path("model")
    require(!model.isMissingNode, s"$path: no 'model' object — not a tokenizer.json")
    val tpe = model.path("type").asText("")
    require(tpe == "WordPiece",
      s"$path: model.type is '$tpe'; only WordPiece loads offline — " +
        "BPE/Unigram vocabularies need their own merge machinery")
    val vocabNode = model.path("vocab")
    require(vocabNode.isObject, s"$path: model.vocab missing or not an object")
    val vocab = Set.newBuilder[String]
    vocabNode.fieldNames().forEachRemaining(vocab += _)
    val unk = model.path("unk_token").asText("[UNK]")
    val maxChars = model.path("max_input_chars_per_word").asInt(100)
    val prefix = model.path("continuing_subword_prefix").asText("##")
    // BertNormalizer carries the lowercase flag; a cased model
    // (lowercase=false) must not be case-folded by the tokenize API
    val lowercases = root.path("normalizer").path("lowercase").asBoolean(true)
    new WordPieceTokenizer(vocab.result(), unk, maxChars, prefix, caseAware = lowercases)
  }

  /** Load from the gate's env configuration (gate must be open). */
  def fromEnv(): WordPieceTokenizer = {
    require(HfTokenizerGate.available, HfTokenizerGate.unavailableReason)
    load(HfTokenizerGate.tokenizerJsonPath.get)
  }
}
