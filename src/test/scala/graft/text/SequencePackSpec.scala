package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a b c d"),          // 4 tokens, shard 0
    (1L, "e f g"),            // 3 tokens, shard 1
    (2L, "h i j k l m"),      // 6 tokens, shard 0
    (3L, "n o"),              // 2 tokens, shard 1
    (4L, "p q r s t"),        // 5 tokens, shard 0
    (5L, "")                  // 0 tokens, shard 1
  ).toDF("doc_id", "text")

  test("packs shard-locally with exact integer bin arithmetic") {
    val out = SequencePack.pack(docs, "text", "doc_id", budget = 5, nShards = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // shard 0 in id order: doc 0 (4 tok, start 0), doc 2 (6 tok, start 4),
    // doc 4 (5 tok, start 10); shard 1: doc 1 (3, start 0), doc 3 (2,
    // start 3), doc 5 (0, start 5)
    assert(out === Array(
      (0L, 0, 4L, 0L, 0L),
      (1L, 1, 3L, 0L, 0L),
      (2L, 0, 6L, 0L, 4L),
      (3L, 1, 2L, 0L, 3L),
      (4L, 0, 5L, 2L, 0L),
      (5L, 1, 0L, 1L, 0L)))
  }

  test("placement invariants: offsets in [0, budget), every doc placed once") {
    val budget = 7
    val out = SequencePack.pack(docs, "text", "doc_id", budget = budget, nShards = 3)
    assert(out.count() === docs.count())
    assert(out.filter(col("seq_offset") < 0 || col("seq_offset") >= budget).isEmpty)
    assert(out.filter(col("seq_id") < 0).isEmpty)
    // concatenating a shard in id order reproduces each doc's start slot
    val recomputed = out
      .withColumn("start",
        coalesce(sum("n_tokens").over(
          org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id")
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter(col("seq_id") =!= expr(s"start DIV $budget") ||
        col("seq_offset") =!= col("start") % budget)
    assert(recomputed.isEmpty)
  }

  test("shard-partitioned windows only") {
    // (the one-scan/one-tokenize physical pin lives in PlanShapeSpec
    // against parquet input — over a LocalRelation the projection is
    // constant-folded away by ConvertToLocalRelation)
    val out = SequencePack.pack(docs, "text", "doc_id", budget = 5, nShards = 2)
    val global = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "packing must never use an unpartitioned window")
  }

  test("trainOrder: layout-invariant, bijective within shard, salt changes the order") {
    import spark.implicits._
    val ids = (1L to 200L).toDF("doc_id")
    def orderOf(df: org.apache.spark.sql.DataFrame, salt: String) =
      SequencePack.trainOrder(df, "doc_id", nShards = 4, salt = salt)
        .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val base = orderOf(ids, "epoch0")
    // the placement is a pure function of (id, salt): any repartitioning
    // of the input must produce the identical total order — retries and
    // cluster-layout changes can't reorder an epoch
    assert(orderOf(ids.repartition(7), "epoch0") == base)
    // (shard, pos) is a total order: positions within a shard are 1..n
    base.values.groupBy(_._1).foreach { case (_, ps) =>
      assert(ps.map(_._2).toSeq.sorted == (1L to ps.size).toSeq)
    }
    // a new salt is a genuinely different epoch order
    assert(orderOf(ids, "epoch1") != base)
  }
}
