package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  test("heavier items are sampled more often (weight bias holds in aggregate)") {
    // 200 items, half weight 1, half weight 20; k=40 of 200
    val df = (0L until 200L)
      .map(i => (i, s"strata", s"content-$i", if (i % 2 == 0) 1.0 else 20.0))
      .toDF("id", "s", "txt", "w")
    val picked = WeightedSample.sampleByWeight(df, "s", "id", "txt", "w", k = 40)
      .select($"id").as[Long].collect().toSeq
    val heavy = picked.count(_ % 2 == 1)
    assert(heavy > 30, s"expected the weight-20 half to dominate, got $heavy/40")
  }

  test("deterministic across runs and partitionings; k bounds each stratum") {
    val df = (0L until 120L)
      .map(i => (i, s"s${i % 3}", s"doc-$i", 1.0 + (i % 7)))
      .toDF("id", "s", "txt", "w")
    val a = WeightedSample.sampleByWeight(df, "s", "id", "txt", "w", k = 10)
      .orderBy("s", "pick_rank").collect().toSeq
    val b = WeightedSample.sampleByWeight(df.repartition(7), "s", "id", "txt", "w", k = 10)
      .orderBy("s", "pick_rank").collect().toSeq
    assert(a == b)
    val perStratum = WeightedSample.sampleByWeight(df, "s", "id", "txt", "w", k = 10)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(perStratum.values.forall(_ == 10))
  }

  test("an overwhelming weight is always picked first in its stratum") {
    val df = ((0L until 50L).map(i => (i, "x", s"d$i", 1.0)) :+ ((99L, "x", "big", 1e9)))
      .toDF("id", "s", "txt", "w")
    val top = WeightedSample.sampleByWeight(df, "s", "id", "txt", "w", k = 1)
      .select($"id").as[Long].head()
    assert(top == 99L)
  }
}
