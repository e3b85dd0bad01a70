package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The artifact-tree swap's READER contract, pinned state by state: a
  * concurrent probe/serve resolving the live path sees the complete old
  * tree, a loud path-not-found, or the complete new tree — never a torn
  * mix of old and new rows, and never a silent wrong answer. Plus the
  * crash half-states' recovery (a re-run heals both), complementing the
  * store-level lifecycle specs. */
class ArtifactTreeSpec extends SparkSpec {

  private def freshTree(): (String, java.nio.file.Path) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-atree-")
    (1 to 100).map(i => (i.toLong, "old")).toDF("id", "gen")
      .write.mode("overwrite").parquet(s"$root/data")
    (root.toString, root)
  }

  private def readGen(root: String): Set[String] = {
    spark.read.parquet(s"$root/data").select("gen").distinct()
      .collect().map(_.getString(0)).toSet
  }

  test("reader during the swap window: old tree, loud failure, or new tree — never a mix") {
    val (root, rootPath) = freshTree()
    import spark.implicits._

    // Stage the compaction by hand, freezing each intermediate state.
    // State A: the new tree is fully written under _compacting, live
    // untouched — a reader sees ONLY old rows.
    (1 to 50).map(i => (i.toLong, "new")).toDF("id", "gen")
      .write.mode("overwrite").parquet(s"$root/data_compacting")
    assert(readGen(root) == Set("old"),
      "pre-swap reader must see the complete old tree only")

    // State B: first rename done (live -> _precompact), live missing —
    // a reader fails LOUDLY (path not found), it can never read a torn
    // directory, because rename never leaves partial contents behind.
    val live = rootPath.resolve("data")
    val pre = rootPath.resolve("data_precompact")
    java.nio.file.Files.move(live, pre)
    val e = intercept[Exception] { readGen(root) }
    val msg = e.getMessage
    assert(msg != null && (msg.contains("data") || msg.contains("PATH_NOT_FOUND")),
      s"mid-swap reader must fail on the missing live path, got: $msg")

    // State C: second rename done — a reader sees ONLY new rows even
    // though the old tree still lingers as _precompact (readers address
    // <root>/data only; the siblings are invisible).
    java.nio.file.Files.move(rootPath.resolve("data_compacting"), live)
    assert(readGen(root) == Set("new"),
      "post-swap reader must see the complete new tree only")
  }

  test("crash half-states: a re-run compact heals both rename orders") {
    import spark.implicits._
    // half-state 1: died between the renames — only _precompact holds
    // the data; a re-run restores it and compacts normally
    val (root1, rootPath1) = freshTree()
    java.nio.file.Files.move(rootPath1.resolve("data"), rootPath1.resolve("data_precompact"))
    ArtifactTree.compact(spark, root1, "data", targetFiles = 2)
    assert(readGen(root1) == Set("old"))
    assert(!java.nio.file.Files.exists(rootPath1.resolve("data_precompact")))

    // half-state 2: died after the second rename but before the old-tree
    // delete — _precompact is garbage next to a complete live tree; a
    // re-run deletes it and the live rows are untouched
    val (root2, rootPath2) = freshTree()
    (1 to 100).map(i => (i.toLong, "old")).toDF("id", "gen")
      .write.mode("overwrite").parquet(s"$root2/data_precompact")
    ArtifactTree.compact(spark, root2, "data", targetFiles = 2)
    assert(readGen(root2) == Set("old"))
    assert(!java.nio.file.Files.exists(rootPath2.resolve("data_precompact")))
  }

  test("compact folds a transform exactly once and bounds the file count") {
    val (root, _) = freshTree()
    ArtifactTree.compact(spark, root, "data", targetFiles = 2,
      transform = df => df.filter(col("id") % 2 === 0))
    val rows = spark.read.parquet(s"$root/data")
    assert(rows.count() == 50)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/data"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(files <= 2, s"expected <= 2 parquet files, got $files")
  }
}
