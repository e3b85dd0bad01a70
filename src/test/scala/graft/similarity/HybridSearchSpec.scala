package graft.similarity

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {

  /** Deterministic test model: vector = (#a's, #b's, #c's) — cosine
    * favors docs whose letter histogram points the query's way. */
  private val ModelId = "test:hybrid-letters"
  private def registered: Unit = graft.embed.EmbedderRegistry.register(
    ModelId,
    new graft.embed.EmbeddingModel {
      override def dim: Int = 3
      override def countTokens(text: String): Int =
        if (text == null) 0 else text.split("\\s+").length
      override def encodeBatch(texts: Seq[String]): Seq[Array[Float]] =
        texts.map { t =>
          val s = if (t == null) "" else t
          Array('a', 'b', 'c').map(c => s.count(_ == c).toFloat)
        }
    })

  // query terms Seq("spark"), query text "cccc" → query vector (0,0,4):
  //   doc 1 lexical hit AND high-cosine ((1,0,3) — "spark" carries one 'a')
  //   doc 2 lexical hit, cosine 0 (ranked below the poolK=2 cut)
  //   doc 3 pure semantic hit (cos 1.0)
  //   doc 4 no term, cosine 0 — cut from both lists
  //   doc 5 zero vector (cosine null) and no term — in neither list
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "spark ccc"),
      (2L, "spark"),
      (3L, "cc"),
      (4L, "bbb"),
      (5L, "zzz"))
      .toDF("doc_id", "text")
  }

  private def run(k: Int = 10, poolK: Int = 2) = {
    registered
    HybridSearch.rrf(docs, "text", "doc_id",
      Seq("spark"), "cccc", ModelId, k = k, poolK = poolK)
  }

  test("fuses both lists; single-list docs carry a null rank on the other side") {
    val rows = run().collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))
    val byId = rows.map(r => r._1 -> r).toMap
    // doc 1 is in both lists (lex r2 — bm25 favors the shorter doc 2 —
    // and sem r2 behind doc 3's perfect cosine) → two reciprocal parts
    val (_, l1, s1, f1) = byId(1L)
    assert(l1.contains(2L) && s1.contains(2L), s"got $rows")
    assert(math.abs(f1 - (1.0 / 62 + 1.0 / 62)) < 1e-6)
    // doc 2 lexical-only (rank 1), doc 3 semantic-only (rank 1)
    assert(byId(2L)._2.contains(1L) && byId(2L)._3.isEmpty)
    assert(byId(3L)._2.isEmpty && byId(3L)._3.contains(1L))
    // docs 4 (cut by poolK) and 5 (zero vector, no term) appear nowhere
    assert(!byId.contains(4L) && !byId.contains(5L))
    // output is fused-score descending with id tie-break
    val order = rows.map(r => (-r._4, r._1))
    assert(order.sorted.toSeq == order.toSeq)
    // the dual-list doc outranks both rank-1 single-list docs
    assert(rows.head._1 == 1L)
  }

  test("k bounds the fused output") {
    assert(run(k = 2).collect().length == 2)
  }

  test("poolK bounds each list before fusion") {
    // poolK=1: only each list's best survives — doc 2 (lex), doc 3 (sem)
    val ids = run(poolK = 1).collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L), s"got $ids")
  }

  test("deterministic across runs") {
    val a = run().collect().toSeq
    val b = run().collect().toSeq
    assert(a == b)
  }
}
