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
    val df = Seq.fill(100)("heavy").toDF("k").repartition(4)
    val partials = df
      .select(col("k"), (monotonically_increasing_id() % 8).as("salt"))
      .groupBy("k", "salt").count()
    assert(partials.count() > 1, "heavy key should occupy multiple salt sub-keys")
  }
}
