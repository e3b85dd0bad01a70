package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {

  import spark.implicits._

  test("salted count equals direct groupBy count on a skewed key") {
    // one heavy key (90%) + a long tail — the salting target scenario
    val rows = Seq.fill(900)("heavy") ++ (0 until 100).map(i => s"tail$i")
    val df = rows.toDF("k").repartition(8)
    val direct = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val salted = Salting.saltedCount(df, col("k"), salts = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
    assert(salted("heavy") == 900L)
  }

  test("salted sum equals direct sum") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "a" else "b", i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum")).as[(String, Long)].collect().toMap
    val salted = Salting.saltedSum(df, col("k"), col("v"), salts = 4)
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  test("first shuffle spreads the heavy key across sub-keys") {
    // heavy KEY, distinct rows (the realistic shape: a stopword token with
    // varying positions/payload) — the deterministic row hash must spread it
    val df = (1 to 100).map(i => ("heavy", i)).toDF("k", "pos").repartition(4)
    val partials = df
      .select(col("k"), Salting.rowSalt(df, 8).as("salt"))
      .groupBy("k", "salt").count()
    assert(partials.count() > 1, "heavy key should occupy multiple salt sub-keys")
  }

  test("salt is deterministic: same rows, same sub-key assignment across evaluations") {
    val df = (1 to 50).map(i => ("k" + i % 5, i)).toDF("k", "v")
    val a = df.select(col("k"), col("v"), Salting.rowSalt(df, 8).as("salt")).collect().toSet
    val b = df.select(col("k"), col("v"), Salting.rowSalt(df, 8).as("salt")).collect().toSet
    assert(a == b)
  }

  test("filters on the key push below the salting projection to the parquet scan") {
    // the deterministic salt keeps the projection transparent to Catalyst:
    // a key filter above BOTH aggregations must reach PushedFilters (a
    // nondeterministic salt — monotonically_increasing_id, rand — blocks
    // predicate pushdown through the projection)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), col("source"))
    val plan = Salting.saltedCount(docs, col("lang"), salts = 8)
      .filter(col("key") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan)
  }
}
