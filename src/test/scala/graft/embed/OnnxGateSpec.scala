package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** The ONNX gate ([[OnnxRuntimeGate]]): everything but the actual ORT
  * crossing is testable offline. Mirrors the reference's artifact-gated
  * test posture (`tests/test_lindera_integration.py:20-33`) — when the
  * runtime/model are absent the real-inference test CANCELS, it is not
  * faked. */
class OnnxGateSpec extends AnyFunSuite {

  // BERT-style mini vocab: ids = line numbers
  private val vocab = Vector(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", // 0..3
    "hello", "world", "spark", "##s", "the") // 4..8

  private def model(maxSeqLen: Int = 512) =
    OnnxEmbeddingModel("/nonexistent/model.onnx", vocab, dim = 8, maxSeqLen = maxSeqLen)

  test("gate is closed in this container and says why") {
    assert(!OnnxRuntimeGate.runtimePresent)
    assert(!OnnxRuntimeGate.available)
    assert(OnnxRuntimeGate.unavailableReason.contains("ai.onnxruntime"))
  }

  test("onnx:* ids fail fast through the registry with the gate's reason") {
    val e = intercept[UnsupportedOperationException] {
      EmbedderRegistry.ensure("onnx:all-MiniLM-L6-v2")
    }
    assert(e.getMessage.contains(OnnxRuntimeGate.ModelPathEnv))
    assert(e.getMessage.contains(EmbedderRegistry.DefaultModelId))
  }

  test("a registered model under an onnx: id still wins over the gate") {
    // register-or-replace contract: users with their own backend bypass
    // the loader entirely, gate open or closed
    EmbedderRegistry.register("onnx:custom", HashProjectionModel(dim = 4))
    assert(EmbedderRegistry.ensure("onnx:custom").dim == 4)
  }

  test("prepare: [CLS]/[SEP] framing, padding, mask, null rows") {
    val (ids, mask, seq) = model().prepare(Seq("hello worlds", "spark", null))
    // "hello worlds" → hello(4) world(5) ##s(7); framed = 2,4,5,7,3 → seq 5
    assert(seq == 5)
    assert(ids.toSeq == Seq(
      2L, 4L, 5L, 7L, 3L, // hello worlds
      2L, 6L, 3L, 0L, 0L, // spark + 2×[PAD]
      0L, 0L, 0L, 0L, 0L)) // null row: all [PAD]
    assert(mask.toSeq == Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("prepare: unknown words drop; frames truncate at maxSeqLen") {
    // undecomposable words become [UNK] pieces, which the repo's shared
    // WordPiece special-token filter then drops — the embedder frames
    // only real pieces (documented in prepare's scaladoc)
    val m = model(maxSeqLen = 4)
    val (ids, _, seq) = m.prepare(Seq("hello qqq world the spark"))
    // body truncated to maxSeqLen-2 pieces, then framed
    assert(seq == 4)
    assert(ids.toSeq == Seq(2L, 4L, 5L, 3L)) // [CLS] hello world [SEP]
  }

  test("countTokens counts WordPiece pieces (the chunking sizer contract)") {
    assert(model().countTokens("hello worlds") == 3) // hello world ##s
    assert(model().countTokens(null) == 0)
  }

  test("real inference (CANCELS unless a local runtime+model are configured)") {
    assume(OnnxRuntimeGate.available, OnnxRuntimeGate.unavailableReason)
    val m = OnnxEmbeddingModel.fromEnv()
    val out = m.encodeBatch(Seq("hello world", null))
    assert(out.head.length == m.dim)
    val norm = math.sqrt(out.head.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
    assert(out(1).isEmpty)
  }
}
