package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persist-and-serve contract: build writes the two artifacts, the
  * serving path reproduces the in-session pipeline bit-for-bit, and the
  * served plan contains neither training nor an encode scan. */
class IndexStoreSpec extends SparkSpec {

  import spark.implicits._

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private def corpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map(i => (i, unit(Array.fill(dim)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
  }

  test("served top-k equals the in-session ADC+rerank pipeline exactly") {
    val df = corpus(300, 16, seed = 11L)
    val queries = df.filter($"vec_id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-indexstore-").toString
    IndexStore.writePqIndex(df, dir, m = 4, kCent = 8, seed = 7L, sampleSize = 300)
    val served = IndexStore.servePqTopK(queries, df, dir, k = 5, shortlistK = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val inSession = ProductQuant.pqTopKRerank(queries, df, k = 5, shortlistK = 20,
        m = 4, kCent = 8, seed = 7L, sampleSize = 300)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served == inSession)
  }

  test("codebooks round-trip the [m][k][dsub] layout through parquet") {
    val df = corpus(200, 16, seed = 13L)
    val cbs = ProductQuant.trainedCodebooks(df, m = 4, k = 8, seed = 3L, sampleSize = 200)
    val dir = java.nio.file.Files.createTempDirectory("graft-indexstore-").toString
    IndexStore.writePqIndex(df, dir, m = 4, kCent = 8, seed = 3L, sampleSize = 200, codebooks = cbs)
    val back = IndexStore.readCodebooks(spark, dir)
    assert(back.map(_.map(_.toSeq).toSeq).toSeq == cbs.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("append encodes deltas with the persisted codebooks — equals the one-shot build") {
    val df = corpus(300, 16, seed = 19L)
    val cbs = ProductQuant.trainedCodebooks(df, m = 4, k = 8, seed = 7L, sampleSize = 300)
    val full = java.nio.file.Files.createTempDirectory("graft-indexstore-").toString
    IndexStore.writePqIndex(df, full, m = 4, kCent = 8, seed = 7L, sampleSize = 300, codebooks = cbs)
    val inc = java.nio.file.Files.createTempDirectory("graft-indexstore-").toString
    IndexStore.writePqIndex(df.filter($"vec_id" < 150), inc,
      m = 4, kCent = 8, seed = 7L, sampleSize = 300, codebooks = cbs)
    IndexStore.appendToPqIndex(df.filter($"vec_id" >= 150), inc)
    val q = df.filter($"vec_id" < 3)
    val a = IndexStore.servePqTopK(q, df, full, k = 5, shortlistK = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val b = IndexStore.servePqTopK(q, df, inc, k = 5, shortlistK = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
  }

  test("compaction recovers from a crashed prior compaction in either half-state") {
    val df = corpus(200, 16, seed = 23L)
    val dir = java.nio.file.Files.createTempDirectory("graft-indexstore-").toString
    IndexStore.writePqIndex(df, dir, m = 4, kCent = 8, seed = 3L, sampleSize = 200)
    val q = df.filter($"vec_id" < 3)
    val expected = IndexStore.servePqTopK(q, df, dir, k = 5, shortlistK = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val root = java.nio.file.Paths.get(dir)
    val codes = root.resolve("codes")
    val pre = root.resolve("codes_precompact")

    // half-state A: crash AFTER the swap — codes is the new tree, the
    // old tree lingers as codes_precompact garbage. Compaction must
    // clean it and succeed.
    java.nio.file.Files.createDirectory(pre)
    java.nio.file.Files.write(pre.resolve("stale.parquet"), Array[Byte](1, 2, 3))
    IndexStore.compactPqIndex(spark, dir, targetFiles = 2)
    assert(!java.nio.file.Files.exists(pre), "stale precompact garbage must be cleaned")
    val afterA = IndexStore.servePqTopK(q, df, dir, k = 5, shortlistK = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(afterA == expected)

    // half-state B: crash MID-swap — codes was renamed away but the new
    // tree never moved in; codes_precompact holds the only copy.
    // Compaction must restore it before compacting.
    java.nio.file.Files.move(codes, pre)
    assert(!java.nio.file.Files.exists(codes))
    IndexStore.compactPqIndex(spark, dir, targetFiles = 2)
    assert(java.nio.file.Files.exists(codes) && !java.nio.file.Files.exists(pre))
    val afterB = IndexStore.servePqTopK(q, df, dir, k = 5, shortlistK = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(afterB == expected)
  }

  test("the served plan reads the persisted codes and never re-encodes or trains") {
    val df = corpus(200, 16, seed = 17L)
    val dir = java.nio.file.Files.createTempDirectory("graft-indexstore-").toString
    IndexStore.writePqIndex(df, dir, m = 4, kCent = 8, seed = 3L, sampleSize = 200)
    val served = IndexStore.servePqTopK(df.filter($"vec_id" < 2), df, dir, k = 3, shortlistK = 10)
    // the persisted codes table appears as a parquet scan leaf...
    val leaves = served.queryExecution.sparkPlan.collectLeaves().map(_.toString)
    assert(leaves.exists(l => l.contains("parquet") && l.contains("codes")),
      s"serving must scan the persisted codes table; leaves=\n${leaves.mkString("\n")}")
    // ...and nothing in the plan re-encodes (codes come from the index)
    val plan = served.queryExecution.sparkPlan.toString
    assert(!plan.toLowerCase.contains("pqencode"),
      "serving must not re-encode the corpus — codes come from the index")
  }
}
