package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — the time-series
  * normalization step every telemetry/training-metrics pipeline runs
  * before joining signals sampled at different rates (the pandas
  * `resample().ffill()` / QuestDB `SAMPLE BY FILL(PREV)` operation;
  * neither Spark nor the reference ships it as one operator).
  *
  * Semantics: per key, truncate event times to `step` slots; the slot's
  * value is the LAST observation in the slot (deterministic: max by
  * `(ts, tieCol)`); the grid spans the key's own [min, max] slot range;
  * empty slots forward-fill from the latest earlier slot. `observed`
  * marks real slots vs filled ones.
  *
  * Scale shape (100 TB): one `(key, slot)` hash aggregation collapses
  * the raw events to at most one row per slot BEFORE any window runs —
  * the growing `last(ignoreNulls)` window then walks grid-sized (not
  * event-sized) partitions, all partitioned by key, never global. The
  * grid explode is bounded by span/step per key, independent of event
  * volume. */
object Resample {

  def resampleFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tieCol: String,
      step: String = "1 day",
      truncUnit: String = "DAY"): DataFrame = {
    val key = col(keyCol)
    val slotted = events.select(
      key,
      date_trunc(truncUnit, col(tsCol)).as("slot"),
      col(tsCol).as("__ts"),
      col(tieCol).as("__tie"),
      col(valueCol).as("__v"))
    // one aggregation: last observation per (key, slot), deterministic
    val lastPerSlot = slotted
      .groupBy(key, col("slot"))
      .agg(max_by(col("__v"), struct(col("__ts"), col("__tie"))).as("slot_value"))
    val bounds = lastPerSlot
      .groupBy(key)
      .agg(min(col("slot")).as("__t0"), max(col("slot")).as("__t1"))
    val grid = bounds.select(
      key,
      explode(sequence(col("__t0"), col("__t1"), expr(s"INTERVAL $step"))).as("slot"))
    val w = Window.partitionBy(key).orderBy(col("slot"))
    grid
      .join(lastPerSlot, Seq(keyCol, "slot"), "left")
      .select(
        key,
        col("slot"),
        last(col("slot_value"), ignoreNulls = true).over(w).as("value"),
        col("slot_value").isNotNull.as("observed"))
  }
}
