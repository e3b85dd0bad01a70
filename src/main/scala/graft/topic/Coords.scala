package graft.topic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D topic coordinates: each topic sits at the centroid of its member
  * chunks in a 2-D reduction, outliers excluded (reference
  * `/root/reference/src/topic_modeling/coords.rs:31-59`). Memberless topics
  * default to the origin in the orchestrator.
  *
  * One hash aggregation keyed on the label — nothing driver-side. */
object Coords {

  /** `points`: `(label, x, y)` per chunk → `(label, x, y)` per topic. */
  def topicCoords(points: DataFrame): DataFrame =
    points
      .filter(col("label") =!= Rollup.OutlierLabel)
      .groupBy(col("label"))
      .agg(avg("x").as("x"), avg("y").as("y"))
}
