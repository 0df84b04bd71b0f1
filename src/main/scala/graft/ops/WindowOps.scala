package graft.ops

import graft.{Q, U}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 group E — window functions over the telemetry-shaped
  * `events` table (series key = user_id). The reference has no windows; its
  * fault rule (`rusty_timeseries/src/main.rs:397-399`) is the degenerate
  * per-row case — `q_win_lag_delta` and `q_win_rolling_avg` are its natural
  * generalizations (rate-of-change and smoothed thresholding).
  *
  * Scale notes: every query here is exactly ONE shuffle (partitionBy the
  * series key) followed by an in-partition sort — the canonical time-series
  * access pattern. Rolling sums go through DECIMAL so the frame-slide
  * accumulation order (segment tree in DuckDB vs running sum in Spark)
  * cannot produce float drift.
  */
object WindowOps {

  private def wUser = Window.partitionBy(col("user_id"))
  // Full deterministic in-series order: event time, then unique id.
  private def wOrdered = wUser.orderBy(col("ts"), col("event_id"))

  val qs: Seq[Q] = Seq(
    Q(
      "q_win_rank",
      """SELECT event_id, user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
        |  CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS drnk
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val wVal = wUser.orderBy(col("value").desc, col("event_id"))
      U.events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          row_number().over(wOrdered).cast("long").as("rn"),
          rank().over(wVal).cast("long").as("rnk"),
          dense_rank().over(wVal).cast("long").as("drnk"))
        .orderBy("event_id")
    },

    // Rate-of-change per series (generalizes the reference's fault rule).
    Q(
      "q_win_lag_delta",
      """SELECT event_id, user_id, value,
        |  lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
        |  round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      U.events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          col("value"),
          lag(col("event_id"), 1).over(wOrdered).as("prev_event_id"),
          round(col("value") - lag(col("value"), 1).over(wOrdered), 2)
            .as("delta"))
        .orderBy("event_id")
    },

    // Trailing moving average, row frame [-3, 0].
    Q(
      "q_win_rolling_avg",
      """SELECT event_id, user_id,
        |  round(
        |    CAST(sum(CAST(value AS DECIMAL(18,6)))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        |    4) AS roll_avg
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val frame = wOrdered.rowsBetween(-3, 0)
      U.events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          round(
            sum(col("value").cast(U.Dec)).over(frame).cast("double") /
              count(lit(1)).over(frame),
            4).as("roll_avg"))
        .orderBy("event_id")
    },

    // Time-based frame: trailing 15 minutes by epoch seconds (the
    // reference's fault-scan window, main.rs:393-394, as a sliding frame).
    Q(
      "q_win_range_time",
      """SELECT event_id, user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |  count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 900 PRECEDING AND CURRENT ROW) AS n_15m,
        |  round(
        |    CAST(sum(CAST(value AS DECIMAL(18,6)))
        |      OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 900 PRECEDING AND CURRENT ROW) AS DOUBLE),
        |    2) AS sum_15m
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val epochS = unix_timestamp(col("ts"))
      val frame =
        wUser.orderBy(epochS).rangeBetween(-900, Window.currentRow)
      U.events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          epochS.as("epoch_s"),
          count(lit(1)).over(frame).as("n_15m"),
          round(sum(col("value").cast(U.Dec)).over(frame).cast("double"), 2)
            .as("sum_15m"))
        .orderBy("event_id")
    },

    // Top-k rows per series key.
    Q(
      "q_topk_per_group",
      """SELECT user_id, event_id, value, rn FROM (
        |  SELECT user_id, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn
        |  FROM events) t
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin) { (s, d) =>
      val wVal = wUser.orderBy(col("value").desc, col("event_id"))
      U.events(s, d)
        .select(
          col("user_id"),
          col("event_id"),
          col("value"),
          row_number().over(wVal).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("user_id", "rn")
    },

    // Distribution windows: quartile bucket, percent_rank, cume_dist (by
    // value within series) plus first/last event over the full frame.
    // percent_rank/cume_dist are integer-ratio doubles — IEEE division is
    // exactly rounded, so the raw doubles are bit-identical across engines
    // (no rounding needed). Still exactly one shuffle by the series key.
    Q(
      "q_win_ntile",
      """SELECT event_id, user_id,
        |  CAST(ntile(4) OVER w AS BIGINT) AS tile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist,
        |  first_value(event_id) OVER w2 AS first_eid,
        |  last_value(event_id) OVER w2 AS last_eid
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id),
        |  w2 AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val wv = wUser.orderBy(col("value"), col("event_id"))
      val full = wOrdered
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      U.events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          ntile(4).over(wv).cast("long").as("tile"),
          percent_rank().over(wv).as("pct_rank"),
          cume_dist().over(wv).as("cdist"),
          first(col("event_id")).over(full).as("first_eid"),
          last(col("event_id")).over(full).as("last_eid"))
        .orderBy("event_id")
    }
  )
}
