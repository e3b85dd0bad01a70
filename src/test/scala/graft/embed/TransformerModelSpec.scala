package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** The ungated transformer forward pass: pins the full embedding
  * lifecycle (WordPiece ids → encoder → mean-pool → L2) end-to-end with
  * no environment gate — the properties a real MiniLM deployment relies
  * on, checked on the deterministic random-init fixture. */
class TransformerModelSpec extends AnyFunSuite {

  private val model = TransformerModel.fixture()

  test("resolves through the registry ungated") {
    val m = EmbedderRegistry.ensure(TransformerModel.FixtureModelId)
    assert(m.dim == 32)
    assert(EmbedderRegistry.loadedEmbedders.contains(TransformerModel.FixtureModelId))
  }

  test("deterministic: two instances agree bitwise") {
    val other = TransformerModel.fixture()
    val a = model.encodeBatch(Seq("spark merge join", "data table"))
    val b = other.encodeBatch(Seq("spark merge join", "data table"))
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("output rows are unit-norm") {
    val out = model.encodeBatch(Seq("spark join", "filter group sort", "a"))
    for (v <- out) {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"norm $n")
    }
  }

  test("batch independence: a text embeds identically alone or padded in a batch") {
    // the property that makes batch-32 execution safe: attention never
    // sees padding, pooling masks it out
    val alone = model.encodeBatch(Seq("spark join")).head
    val inBatch = model.encodeBatch(
      Seq("spark join", "a much longer text with many more words to force padding rows",
        "filter")).head
    assert(alone.toSeq == inBatch.toSeq)
  }

  test("null -> empty row; empty text -> zero vector (the reference null contract)") {
    val out = model.encodeBatch(Seq(null, "", "spark"))
    assert(out(0).isEmpty)
    assert(out(1).toSeq == Seq.fill(32)(0.0f))
    assert(out(2).length == 32)
  }

  test("attention mixes context: the same word embeds differently in different sentences") {
    // a bag-of-words model (the hash-projection pseudo-embedder) cannot
    // distinguish these; a transformer must
    val a = model.encodeBatch(Seq("spark join", "spark filter")).map(_.toSeq)
    assert(a(0) != a(1))
    // word order matters through position embeddings
    val b = model.encodeBatch(Seq("join spark", "spark join")).map(_.toSeq)
    assert(b(0) != b(1))
  }

  test("truncation caps the sequence at maxSeqLen") {
    val word = "data " // a single-piece word in the fixture vocab
    val long = word * 500
    assert(model.countTokens(long) == 500) // count ignores truncation
    val v = model.encodeBatch(Seq(long)).head
    val vCap = model.encodeBatch(Seq(word * model.maxSeqLen)).head
    assert(v.toSeq == vCap.toSeq, "beyond-cap tokens must not change the embedding")
  }

  test("multi-piece words and OOV follow the WordPiece fixture contract") {
    // "spark" decomposes sp + ##ark (2 pieces)
    assert(model.countTokens("spark") == 2)
    // a word with no vocab decomposition becomes [UNK], which the
    // tokenizer DROPS (the special-token contract) — an OOV-only text
    // therefore embeds like an empty one: the zero vector, not a crash
    val v = model.encodeBatch(Seq("zzzunknownzzz")).head
    assert(v.toSeq == Seq.fill(32)(0.0f))
  }
}
