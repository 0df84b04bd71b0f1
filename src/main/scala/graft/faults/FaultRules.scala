package graft.faults

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized fault-detection rule engine.
  *
  * Generalizes the reference's single hardcoded rule — scan a series over a
  * window and set `fc1_flag = 1` where `value > 0.95`
  * (`rusty_timeseries/src/main.rs:384-406`) — into composable column-level
  * rules over any telemetry-shaped frame (series key, event time, value).
  * Rules are pure `withColumn` derivations: the reference's in-place
  * write-back (`main.rs:106-117`) has no Parquet analog, so flags are
  * recomputed declaratively (SURVEY.md §1.2 Q5, §2.4 A) — idempotent and
  * shuffle-free (threshold) or one window shuffle per series key.
  */
object FaultRules {

  /** `value > threshold` ⇒ 1, else null (the reference's rule, main.rs:398). */
  def thresholdFlag(value: Column, threshold: Double): Column =
    when(value > threshold, lit(1L))

  /** Merge a freshly derived flag with a pre-existing one (recompute wins) —
    * the declarative analog of the reference's point update (main.rs:106-117).
    */
  def mergeFlags(derived: Column, prior: Column): Column =
    coalesce(derived, prior)

  /** Rate-of-change rule: |value - lag(value)| > maxDelta within a series. */
  def rateOfChangeFlag(
      seriesKey: Column,
      eventTime: Column,
      tieBreak: Column,
      value: Column,
      maxDelta: Double): Column = {
    val w = Window.partitionBy(seriesKey).orderBy(eventTime, tieBreak)
    when(abs(value - lag(value, 1).over(w)) > maxDelta, lit(1L))
  }

  /** Rolling-average deviation rule: value deviates from the trailing mean
    * of the last `frameRows` rows by more than `maxDev`. The mean is a
    * decimal-exact sum divided by the frame count — plain `avg(double)`
    * accumulates in frame-slide order, which differs across engines and
    * flakes oracle comparisons at rounding boundaries (same recipe as
    * `U.dsum`).
    */
  def rollingDeviationFlag(
      seriesKey: Column,
      eventTime: Column,
      tieBreak: Column,
      value: Column,
      frameRows: Int,
      maxDev: Double): Column = {
    val w = Window
      .partitionBy(seriesKey)
      .orderBy(eventTime, tieBreak)
      .rowsBetween(-frameRows, 0)
    val mean =
      sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .over(w).cast("double") / count(lit(1)).over(w)
    when(abs(value - mean) > maxDev, lit(1L))
  }
}
