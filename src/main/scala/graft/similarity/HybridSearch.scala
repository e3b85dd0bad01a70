package graft.similarity

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Hybrid lexical+semantic retrieval via reciprocal-rank fusion
  * (Cormack, Clarke & Büttcher 2009, "Reciprocal Rank Fusion outperforms
  * Condorcet and individual rank learning methods"):
  *
  * {{{ rrf(d) = Σ_lists 1 / (rrfK + rank_d) }}}
  *
  * over a BM25 keyword list ([[Bm25.search]]) and an embedding-cosine
  * list against one query vector. The standard retrieval front end of a
  * training-data pipeline (decontamination audits, targeted corpus
  * probes, eval-neighborhood inspection) where neither pure lexical nor
  * pure semantic recall suffices.
  *
  * Scale design (100 TB): BM25 contributes its two elementwise
  * zero-shuffle scans; the semantic side is ONE embed+cosine scan feeding
  * a bounded `TakeOrdered` top-`poolK` (the [[Similarity.cosineFast]]
  * fused expression — whole-stage codegen, no HOF fallback). Both
  * candidate lists are cut to `poolK` BEFORE anything else happens, so
  * only ≤ 2·poolK rows ever leave those scans. Ranks are then assigned
  * positionally on the driver over the two collected lists — a bounded
  * barrier like the quantile/rate-table collects elsewhere in the repo,
  * NOT a single-partition window exchange — and the fused ≤ 2·poolK-row
  * local relation is rounded, sorted and cut to `k` in Spark. Nothing
  * corpus-proportional ever shuffles or reaches the driver.
  *
  * Determinism: both lists rank by (score rounded to `roundTo`, doc id)
  * — the [[Bm25.search]] rounding-before-cut contract — so ranks, the
  * poolK cut, and the fused order are reproducible bit-for-bit by an
  * independent checker that re-derives the same rounded scores.
  */
object HybridSearch {

  /** Fuse BM25 over `terms` with cosine against `queryText`'s embedding
    * (both embedded under `modelId`). Returns the top `k` as
    * `(doc_id, r_lex, r_sem, rrf)` — list ranks nullable when a document
    * appears in only one list. */
  def rrf(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      queryText: String,
      modelId: String,
      k: Int = 20,
      poolK: Int = 50,
      rrfK: Int = 60,
      roundTo: Int = 6): DataFrame = {
    val spark = df.sparkSession

    // TakeOrdered top-poolK, collected IN rank order (≤ poolK rows each)
    val lexIds: Array[Any] =
      Bm25.search(df, textCol, idCol, terms, k = poolK, roundTo = roundTo)
        .orderBy(col("score").desc, col("doc_id").asc)
        .select("doc_id")
        .collect()
        .map(_.get(0))

    val qVec: Array[Float] =
      graft.embed.EmbedderRegistry.ensure(modelId).encodeBatch(Seq(queryText)).head
    val semIds: Array[Any] = graft.embed.Embedders
      .embed(df.select(col(idCol).as("doc_id"), col(textCol).as("__t")), "__t", "__e", modelId)
      .select(col("doc_id"),
        round(Similarity.cosineFast(col("__e"), typedLit(qVec.toSeq)), roundTo).as("__s"))
      .filter(col("__s").isNotNull)
      .orderBy(col("__s").desc, col("doc_id").asc)
      .limit(poolK)
      .select("doc_id")
      .collect()
      .map(_.get(0))

    fuse(spark, lexIds, semIds, df.schema(idCol).dataType, k, rrfK, roundTo)
  }

  /** The positional-rank fusion both entry points share: ranks assigned
    * over the two ≤ poolK collected lists, fused locally, rounded,
    * sorted and cut to `k` in Spark. */
  private def fuse(
      spark: org.apache.spark.sql.SparkSession,
      lexIds: Array[Any],
      semIds: Array[Any],
      idType: org.apache.spark.sql.types.DataType,
      k: Int,
      rrfK: Int,
      roundTo: Int): DataFrame = {
    val rLex = lexIds.iterator.zipWithIndex.map { case (id, i) => (id, i + 1L) }.toMap
    val rSem = semIds.iterator.zipWithIndex.map { case (id, i) => (id, i + 1L) }.toMap
    def part(r: Option[Long]): Double = r.fold(0.0)(x => 1.0 / (rrfK + x))
    val fused: Seq[Row] = (lexIds ++ semIds).distinct.toSeq.map { id =>
      Row(id, rLex.get(id).map(Long.box).orNull, rSem.get(id).map(Long.box).orNull,
        part(rLex.get(id)) + part(rSem.get(id)))
    }

    val schema = StructType(Seq(
      StructField("doc_id", idType, nullable = true),
      StructField("r_lex", LongType, nullable = true),
      StructField("r_sem", LongType, nullable = true),
      StructField("__rrf", DoubleType, nullable = false)))
    spark.createDataFrame(fused.asJava, schema)
      .select(col("doc_id"), col("r_lex"), col("r_sem"),
        round(col("__rrf"), roundTo).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The SERVED hybrid stack — both candidate lists read from PERSISTED
    * indexes, no corpus scan anywhere: the lexical list from the BM25
    * inverted index ([[Bm25IndexStore.serveBm25TopK]] — ≤|terms| posting
    * buckets via static pruning) and the semantic list from the IVFADC
    * index ([[IndexStore.serveIvfPqTopK]] — nProbe of nCells cell
    * directories via dynamic pruning, ADC over stored codes). This is
    * the production retrieval front end: the corpus was tokenized,
    * embedded and encoded ONCE at build time; a query costs two pruned
    * artifact reads and a ≤2·poolK-row fusion.
    *
    * The semantic list is the ANN index's answer (approximate by
    * design — probed cells + ADC distances), NOT the in-session exact
    * cosine — the honest production trade [[rrf]]'s oracle-twin query
    * quantifies via q_knn_probe_recall. The query vector embeds under
    * `modelId` and enters with id −1 (never a corpus id, so the
    * serve-path self-exclusion is inert). Fusion, rounding, ties and
    * the final cut are [[rrf]]'s exactly. */
  def rrfServed(
      spark: org.apache.spark.sql.SparkSession,
      bm25Dir: String,
      annDir: String,
      terms: Seq[String],
      queryText: String,
      modelId: String,
      k: Int = 20,
      poolK: Int = 20,
      rrfK: Int = 60,
      roundTo: Int = 6,
      nProbe: Int = 3): DataFrame = {
    import spark.implicits._
    val lexIds: Array[Any] =
      Bm25IndexStore.serveBm25TopK(spark, bm25Dir, terms, k = poolK, roundTo = roundTo)
        .orderBy(col("score").desc, col("doc_id").asc)
        .select("doc_id")
        .collect()
        .map(_.get(0))
    val qVec: Array[Float] =
      graft.embed.EmbedderRegistry.ensure(modelId).encodeBatch(Seq(queryText)).head
    val qDf = Seq((-1L, qVec.toSeq)).toDF("vec_id", "embedding")
    val semIds: Array[Any] =
      IndexStore.serveIvfPqTopK(qDf, annDir, k = poolK, nProbe = nProbe)
        .orderBy(col("rank").asc)
        .select("neighbor_id")
        .collect()
        .map(_.get(0))
    fuse(spark, lexIds, semIds, org.apache.spark.sql.types.LongType, k, rrfK, roundTo)
  }
}
