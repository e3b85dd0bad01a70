package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared maintenance for parquet artifact trees that accrete streaming
  * delta subdirectories (the ANN code table, the dedup index's
  * signatures and bands): rewrite base + all deltas into `targetFiles`
  * fresh files and swap the tree in place. Months of micro-batch deltas
  * are thousands of tiny files, and scan throughput dies by file-open
  * overhead long before data volume matters.
  *
  * Hadoop FS API throughout — the rest of the index IO goes through
  * Spark's FS layer, so the stores must work on HDFS/object stores too,
  * not just the local filesystem. The swap is two directory renames —
  * NOT atomic against a concurrently running serving job (a production
  * deployment puts a manifest or table format in front; documented
  * limitation, same class as the parquet-overwrite the build jobs
  * already do). Crash recovery: a prior run that died between the two
  * renames leaves `<subdir>_precompact` behind — if the live tree also
  * exists the leftover is garbage and is deleted; if the live tree is
  * MISSING the crash was mid-swap and the old tree (the only complete
  * copy) is restored before proceeding.
  *
  * READER-DURING-SWAP contract (spec-pinned in `ArtifactTreeSpec`): a
  * probe/serve that resolves the live path can observe exactly three
  * states — the complete OLD tree (before the first rename), a loud
  * path-not-found failure (inside the two-rename window, where the live
  * path briefly does not exist — fail-and-retry territory, rename makes
  * no torn directory to read), or the complete NEW tree (after the
  * second rename; the lingering `_precompact`/`_compacting` siblings
  * are invisible because every reader addresses `<root>/<subdir>`
  * only). A reader can never see a MIX of old and new rows: the new
  * tree is written complete under `_compacting` before any rename
  * touches the live path, and the two trees never share a directory.
  * The one remaining hazard is a reader whose files were LISTED before
  * the swap and opened after (Spark plans cache file listings) — it
  * fails with deleted/missing-file errors, again loudly, never with
  * silently wrong rows. Operate compactions single-writer and off-peak,
  * or front the tree with a manifest if serving cannot tolerate
  * retries. */
object ArtifactTree {

  /** `transform` runs inside the rewrite (the place physical row drops —
    * tombstone folding — belong: compaction is the one job that already
    * rewrites every row, so a corpus-sized anti-join is in budget here
    * and nowhere else). `partitionCols` preserves a partitioned layout
    * (e.g. the IVF codes' cell directories, which serving's partition
    * pruning depends on); rows are clustered by those columns so each
    * partition directory lands in at most `targetFiles` files. */
  def compact(
      spark: SparkSession,
      root: String,
      subdir: String,
      targetFiles: Int,
      transform: DataFrame => DataFrame = identity,
      partitionCols: Seq[String] = Nil): Unit = {
    val hp = new org.apache.hadoop.fs.Path(root)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(hp, subdir)
    val tmp = new org.apache.hadoop.fs.Path(hp, s"${subdir}_compacting")
    val old = new org.apache.hadoop.fs.Path(hp, s"${subdir}_precompact")
    if (fs.exists(old)) {
      if (fs.exists(live)) fs.delete(old, true)
      else { if (!fs.rename(old, live)) sys.error(s"compact: failed to restore $old -> $live") }
    }
    // recursiveFileLookup flattens streaming-delta subtrees but DISABLES
    // partition-column inference — a partitioned tree must go through
    // normal partition discovery or its partition columns vanish
    val source =
      if (partitionCols.isEmpty)
        spark.read.option("recursiveFileLookup", "true").parquet(live.toString)
      else spark.read.parquet(live.toString)
    val rewritten = transform(source)
    val writer =
      if (partitionCols.isEmpty) rewritten.repartition(targetFiles).write
      else rewritten
        .repartition(targetFiles, partitionCols.map(org.apache.spark.sql.functions.col): _*)
        .write.partitionBy(partitionCols: _*)
    writer.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(live, old)) sys.error(s"compact: rename $live -> $old failed")
    if (!fs.rename(tmp, live)) sys.error(s"compact: rename $tmp -> $live failed")
    // old tree removed only after the new one is in place
    fs.delete(old, true)
  }

  /** Whether an artifact subtree exists (absent ⇒ callers skip its scan
    * entirely — the zero-tombstone plan is byte-identical to the
    * pre-delete-feature plan). */
  def exists(spark: SparkSession, root: String, subdir: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(root, subdir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Optional artifact subtree (the tombstone pattern both index
    * stores share): None when absent — callers skip the scan entirely
    * and their plan is byte-identical to the pre-delete-feature one. */
  def readOptional(spark: SparkSession, root: String, subdir: String): Option[DataFrame] =
    if (!exists(spark, root, subdir)) None
    else Some(spark.read.option("recursiveFileLookup", "true").parquet(s"$root/$subdir"))

  /** Remove an artifact subtree (tombstone clearing after a compaction
    * has folded the drops in). */
  def remove(spark: SparkSession, root: String, subdir: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(root, subdir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
  }
}
