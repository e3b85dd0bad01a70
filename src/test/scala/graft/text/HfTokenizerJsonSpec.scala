package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The local `tokenizer.json` loader (reference hub fetch re-expressed as
  * a gated local file, `src/tokenizer.rs:291-306`). The PARSER runs
  * ungated against a fixture file; resolving the real
  * `huggingface:bert-base-uncased` id end-to-end is gated on the env
  * configuration ([[HfTokenizerGate]]) and cancels in this zero-egress
  * container — the reference's own network-gated test posture. */
class HfTokenizerJsonSpec extends AnyFunSuite {

  private def fixturePath: String = {
    val url = getClass.getResource("/graft/hf_tokenizer_fixture.json")
    assert(url != null, "hf_tokenizer_fixture.json missing from test resources")
    new java.io.File(url.toURI).getAbsolutePath
  }

  test("parses a WordPiece tokenizer.json: vocab, unk, prefix, normalizer") {
    val tok = HfTokenizerJson.load(fixturePath)
    assert(tok.caseAware, "fixture normalizer lowercases")
    val out = tok.tokenize("Tokenization happens fast", lowercase = true, removePunct = true)
    assert(out.map(_.token) == Vector("token", "##ization", "happens", "fast"))
  }

  test("##-offset invariant: offsets index the unprefixed substring of the lowercased text") {
    // the reference's test_hf_offsets_reconstruct_english_lowercased
    // (tests/test_tokenize_with_offsets.py:64-78) against the fixture vocab
    val tok = HfTokenizerJson.load(fixturePath)
    val text = "Tokenization happens fast, unbelievable!"
    val lc = text.toLowerCase(java.util.Locale.ROOT)
    val rows = tok.tokenize(text, lowercase = true, removePunct = false)
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val stripped =
        if (row.token.startsWith("##")) row.token.substring(2) else row.token
      val extracted = lc.substring(row.start.toInt, row.end.toInt)
      assert(stripped == extracted,
        s"offset mismatch: token=${row.token} stripped=$stripped extracted=$extracted row=$row")
    }
    assert(rows.map(_.token).contains("##believ"), "continuation pieces must surface")
  }

  test("undecomposable words become [UNK] and the special filter drops them") {
    val tok = HfTokenizerJson.load(fixturePath)
    val out = tok.tokenize("token zzzqqq fast", lowercase = true, removePunct = true)
    assert(out.map(_.token) == Vector("token", "fast"))
  }

  test("non-WordPiece model types fail with the actual type named") {
    val bad = java.nio.file.Files.createTempFile("graft-bpe-", ".json")
    java.nio.file.Files.writeString(bad,
      """{"model": {"type": "BPE", "vocab": {}, "merges": []}}""")
    val e = intercept[IllegalArgumentException](HfTokenizerJson.load(bad.toString))
    assert(e.getMessage.contains("BPE"))
    java.nio.file.Files.delete(bad)
  }

  test("gate: ungated huggingface ids fail fast with the env hint") {
    assume(!HfTokenizerGate.available, "gate is open in this environment")
    val e = intercept[UnsupportedOperationException](
      TokenizerModels.resolve("huggingface:bert-base-uncased"))
    assert(e.getMessage.contains(HfTokenizerGate.TokenizerJsonEnv))
  }

  test("gated: huggingface:bert-base-uncased resolves from the local artifact") {
    assume(HfTokenizerGate.servesId("huggingface:bert-base-uncased"),
      HfTokenizerGate.unavailableReason)
    val backend = TokenizerModels.resolve("huggingface:bert-base-uncased")
    val text = "Tokenization happens fast"
    val lc = text.toLowerCase(java.util.Locale.ROOT)
    val rows = backend.tokenize(text, lowercase = true, removePunct = true)
    assert(rows.nonEmpty, "real vocab returned no tokens")
    rows.foreach { row =>
      val stripped =
        if (row.token.startsWith("##")) row.token.substring(2) else row.token
      assert(stripped == lc.substring(row.start.toInt, row.end.toInt))
    }
  }
}
