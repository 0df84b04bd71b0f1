package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at 100 TB.
  *
  * A telemetry workload concentrates on few hot series (one chatty sensor can
  * be orders of magnitude hotter than the median — the reference's fault job
  * hammers exactly one series, `rusty_timeseries/src/main.rs:389`). A plain
  * `groupBy(key)` sends every hot-key row to one reducer; that task becomes
  * the straggler that bounds the whole stage.
  *
  * Two levers, complementary:
  *   - AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  *     default) re-plans oversized join partitions at runtime — nothing to do.
  *   - Aggregations don't get that treatment when the same key is hot, so
  *     [[saltedAgg]] does the classic two-stage rewrite: salt the key with a
  *     random shard id, partially aggregate (key, salt) — the hot key now
  *     spreads over `nSalts` reducers — then finish on key alone. Correct for
  *     any algebraic aggregate (sum/count/min/max, and avg as sum+count).
  */
object Skew {

  /** Two-stage salted aggregation: `aggs` are the partial (algebraic)
    * aggregates computed per (key, salt); `finish` combines the partials per
    * key. The salt is `xxhash64(saltSource) mod nSalts` — a DETERMINISTIC
    * function of row content, never `rand()`: under task retry Spark may
    * recompute one map task while reducers keep partials fetched from the
    * first attempt, and `rand()` assigns by partition/position, so retried
    * rows would land in different (key, salt) partials and be double-counted
    * or dropped. A content-derived salt re-salts identically on every
    * attempt.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      nSalts: Int)(
      aggs: Seq[Column],
      finish: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts.toLong)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(aggs.head, aggs.tail: _*)
      .groupBy(col("__key"))
      .agg(finish.head, finish.tail: _*)

  /** Salted sum/count/avg of `value` per `key` — the common telemetry shape
    * (per-series stats when some series are pathologically hot). The value
    * column doubles as the salt source; pass a unique id column to
    * [[saltedAgg]] directly when values are heavily repeated.
    */
  def saltedStats(df: DataFrame, key: Column, value: Column, nSalts: Int = 16)
      : DataFrame =
    saltedAgg(df, key, value, nSalts)(
      Seq(
        sum(value.cast(graft.U.Dec)).as("__psum"),
        count(lit(1)).as("__pcnt")),
      Seq(
        sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("n_rows"),
        (sum(col("__psum")).cast("double") / sum(col("__pcnt"))).as("avg_value"),
        // the exact decimal sum, for callers that emit micro-unit integers
        // (a double re-round would reintroduce the half-boundary the
        // decimal path exists to avoid)
        sum(col("__psum")).as("sum_value_dec")))
      .withColumnRenamed("__key", "key")
}
