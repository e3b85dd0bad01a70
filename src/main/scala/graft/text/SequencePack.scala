package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-token-budget sequence packing for LLM training-data assembly
  * (beyond-reference pipeline operator): assigns every document a
  * `(shard, seq_id, seq_offset)` placement so that concatenating the
  * documents of one shard in id order and splitting at multiples of
  * `budget` tokens yields the training sequences — the GPT-style
  * "concatenate, then cut at the sequence boundary" packing contract,
  * where a document may straddle two sequences (its `seq_offset` +
  * length exceeding `budget` marks the split point).
  *
  * Scale design (100 TB): packing is inherently sequential — each
  * document's placement depends on the running token total before it —
  * so a single global order would funnel the corpus through ONE
  * partition (the unpartitioned-window scale-killer). Instead documents
  * are salted into `nShards` deterministic shards (`id % nShards`) and
  * packed independently within each shard: every window below is
  * PARTITIONED by shard, shards scale with the cluster, and the
  * placement is a pure function of the input (re-runnable on retry,
  * oracle-checkable). One tokenize scan, one shard-keyed exchange.
  */
object SequencePack {

  /** Placement frame `(id, shard, n_tokens, seq_id, seq_offset)`.
    * `idCol` must be numeric (the shard is `id % nShards`); `seq_id`
    * numbers sequences within a shard, so `(shard, seq_id)` is the
    * global sequence key. Exact integer arithmetic throughout (DIV/%),
    * no floating point near the bin boundary. */
  def pack(
      df: DataFrame,
      textCol: String,
      idCol: String,
      budget: Int,
      nShards: Int = 64,
      model: String = TokenizerModels.PlainWordsEn): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val byShard = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol),
        Tokenize.tokenCount(col(textCol), model).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col(idCol), lit(nShards)).cast("int"))
      .withColumn(
        "start_tok",
        coalesce(sum(col("n_tokens")).over(byShard), lit(0L)))
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens"),
        expr(s"start_tok DIV $budget").as("seq_id"),
        (col("start_tok") % budget).as("seq_offset"))
  }

  /** Deterministic global shuffle + shard assignment — the writer step
    * between curation and [[pack]]: training wants documents in
    * pseudo-random order that is REPRODUCIBLE (re-runs, resumes, and
    * engine ports must agree on the epoch order), so the order key is
    * a salted FNV-1a hash of the id, never a `rand()`. Returns
    * `(id, shard, pos)` where `shard = pmod(h, nShards)` and `pos`
    * ranks the shard's rows by `(h, id)` — `(shard, pos)` is a total
    * order over the corpus any engine can recompute; vary `salt` per
    * epoch for fresh orders.
    *
    * Scale shape: the hash is one codegen'd expression over the id
    * (text never read), one shard-keyed exchange, and the rank window
    * is PARTITIONED by shard — shards are the write-parallelism unit,
    * exactly like [[pack]]'s. */
  def trainOrder(
      df: DataFrame,
      idCol: String,
      nShards: Int = 64,
      salt: String = "epoch0"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = TextAnalysis.fnv1a64(
      concat(lit(salt), lit(":"), col(idCol).cast("string")))
    df.select(col(idCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("h"), col(idCol)))
        .cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
