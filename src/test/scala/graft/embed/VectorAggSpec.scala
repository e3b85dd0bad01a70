package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorAggSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      ("a", Seq(1.0f, 2.0f)),
      ("a", Seq(3.0f, 4.0f)),
      ("b", Seq(10.0f, 20.0f)),
      ("b", null.asInstanceOf[Seq[Float]]),
      ("c", Seq.empty[Float]))
      .toDF("label", "embedding")
  }

  private def collectCentroids = {
    VectorAgg.centroids(df, "embedding", "label")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
      .toMap
  }

  test("hand-checked means; null and empty vectors contribute nothing") {
    val c = collectCentroids
    assert(c("a") == Seq(2.0, 3.0))
    assert(c("b") == Seq(10.0, 20.0)) // the null row is skipped, not zero-filled
    assert(c("c") == Seq.empty) // only-empty group → empty centroid
  }

  test("ragged dimensions fail fast instead of silently truncating") {
    import spark.implicits._
    val bad = Seq(("a", Seq(1.0f)), ("a", Seq(1.0f, 2.0f))).toDF("label", "embedding")
    val e = intercept[Exception] {
      VectorAgg.centroids(bad, "embedding", "label").collect()
    }
    assert(e.getMessage != null)
  }

  test("plan is one hash aggregate with partial aggregation — vectors never shuffle whole") {
    val plan = VectorAgg.centroids(df, "embedding", "label")
      .queryExecution.executedPlan.toString
    // typed Aggregators run in ObjectHashAggregate; two phases around one
    // exchange means the map side folded vectors into buffers locally
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }
}
