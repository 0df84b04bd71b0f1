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

    // Rolling autocorrelation per series: corr(value, lag(value)) over a
    // 20-row trailing frame — the quant/telemetry staple for detecting
    // regime changes. Same exact-moment discipline as q_agg_corr but with
    // WINDOW sums: the five moments are DECIMAL frame-sums (exact,
    // order-independent), only the closed form runs in doubles written
    // identically in both engines; degenerate frames (short, or zero
    // variance) yield NULL by an explicit guard, not NaN. One shuffle by
    // the series key.
    Q(
      "q_win_rolling_corr",
      """WITH t AS (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value FROM events),
        |p AS (SELECT user_id, event_id, ts_us, value AS x,
        |        lag(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS y
        |      FROM t),
        |f AS (SELECT user_id, event_id, ts_us, x, y FROM p WHERE y IS NOT NULL),
        |m AS (SELECT user_id, event_id,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x AS DECIMAL(20,6)) * CAST(x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y AS DECIMAL(20,6)) * CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS syy,
        |    CAST(sum(CAST(x AS DECIMAL(20,6)) * CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxy
        |  FROM f
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, n,
        |  CASE WHEN n >= 5 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |       THEN round((n * sxy - sx * sy) /
        |                  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        |       END AS rcorr
        |FROM m ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val wOrd = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val w = wOrd.rowsBetween(-19, Window.currentRow)
      val base = U.events(s, d)
        .select(
          col("user_id"),
          col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("value").as("x"))
        .withColumn("y", lag(col("x"), 1).over(wOrd))
        .filter(col("y").isNotNull)
      val m = base.select(
        col("user_id"),
        col("event_id"),
        count(lit(1)).over(w).as("n"),
        sum(col("x").cast(U.Dec)).over(w).cast("double").as("sx"),
        sum(col("y").cast(U.Dec)).over(w).cast("double").as("sy"),
        sum(col("x").cast(U.Dec20) * col("x").cast(U.Dec)).over(w)
          .cast("double").as("sxx"),
        sum(col("y").cast(U.Dec20) * col("y").cast(U.Dec)).over(w)
          .cast("double").as("syy"),
        sum(col("x").cast(U.Dec20) * col("y").cast(U.Dec)).over(w)
          .cast("double").as("sxy"))
      m.select(
          col("user_id"),
          col("event_id"),
          col("n"),
          when(
            col("n") >= 5 &&
              (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
              (col("n") * col("syy") - col("sy") * col("sy")) > 0,
            round(
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                  sqrt(col("n") * col("syy") - col("sy") * col("sy"))),
              6)).as("rcorr"))
        .orderBy("user_id", "event_id")
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
    },

    // Running totals per series: cumulative exact-decimal sum, cumulative
    // count, and running max over the unbounded-preceding frame — the
    // telemetry "odometer" view (cumulative energy, cumulative faults).
    // The cumulative sum goes through DECIMAL so Spark's running
    // accumulation and DuckDB's segment-tree evaluation cannot drift; the
    // emitted micro-unit BIGINT is exactly integral in both engines. Still
    // the canonical single series-key shuffle + in-partition sort.
    Q(
      "q_win_cumsum",
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,6)))
        |    OVER w * 1000000 AS BIGINT) AS cum_micro,
        |  CAST(count(*) OVER w AS BIGINT) AS cum_n,
        |  round(max(value) OVER w, 6) AS run_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = wOrdered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      U.events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          (sum(col("value").cast(U.Dec)).over(w) * 1000000).cast("long")
            .as("cum_micro"),
          count(lit(1)).over(w).as("cum_n"),
          round(max(col("value")).over(w), 6).as("run_max"))
        .orderBy("event_id")
    },

    // Rolling exact median (robust smoothing — the outlier-immune
    // counterpart to q_win_rolling_avg): 21-row centered frame per series.
    // Exactness: a 21-row interior frame has odd count, so the median IS a
    // data value; edge frames interpolate (a+b)/2 — one identical IEEE op
    // in both engines. Spark's `median` expression rejects window frames
    // (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC); `percentile(value, 0.5)`
    // is the same exact computation and frames fine. Scale: one series-key
    // shuffle; the window buffers only the 21-row frame, not the partition.
    Q(
      "q_win_rolling_median",
      """SELECT event_id, user_id,
        |  round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING), 6) AS med
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = wOrdered.rowsBetween(-10, 10)
      U.events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          round(expr("percentile(value, 0.5)").over(w), 6).as("med"))
        .orderBy("event_id")
    },

    // Gaps-and-islands: longest run of consecutive ACTIVE DAYS per series —
    // the classic streak query (user engagement, sensor uptime). Island key
    // = day-number minus per-series row_number: constant within a
    // consecutive run, strictly decreasing across a gap. All-integer
    // arithmetic end to end. Scale: the distinct collapses each series to
    // at most (calendar days) rows BEFORE the window — the window input is
    // bounded by time, not by event volume, so a 100× event blow-up changes
    // only the pre-aggregated first exchange.
    Q(
      "q_win_streak",
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn
        |  FROM events),
        |isl AS (
        |  SELECT user_id, dn,
        |    dn - row_number() OVER (PARTITION BY user_id ORDER BY dn) AS grp
        |  FROM days),
        |runs AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS active_days, count(*) AS n_streaks
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val days = U.events(s, d)
        .select(
          col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long")
            .as("dn"))
        .distinct()
      val isl = days.withColumn(
        "grp",
        col("dn") - row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("dn"))))
      isl
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(
          max(col("len")).as("longest_streak"),
          sum(col("len")).as("active_days"),
          count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    },

    // Rising-run pattern detection (MATCH_RECOGNIZE's bread-and-butter
    // A B+ shape without the clause): per series, maximal runs of
    // consecutive value RISES in (ts, event_id) order via gaps-and-islands
    // — lag marks each rise, a running sum of the breaks numbers the
    // islands, and the run lengths aggregate per island. Emits the rise
    // count, the longest run, and how many runs reach length 3 (the
    // "three rising readings" alert shape). All integer; the one exchange
    // is the series-key window shuffle, reused by every window in the
    // chain (same partitioning), then the island aggregate rides it.
    Q(
      "q_win_pattern",
      """WITH o AS (
        |  SELECT user_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |m AS (
        |  SELECT user_id, rn, value > pv AS rise,
        |    sum(CASE WHEN value > pv THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |  FROM o WHERE pv IS NOT NULL),
        |runs AS (
        |  SELECT user_id, grp, count(*) AS run_len
        |  FROM m WHERE rise GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(sum(run_len) AS BIGINT) AS n_rises,
        |  CAST(max(run_len) AS BIGINT) AS max_run,
        |  CAST(count(*) FILTER (WHERE run_len >= 3) AS BIGINT) AS n_runs_ge3
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val o = U.events(s, d).select(
        col("user_id"),
        col("value"),
        lag(col("value"), 1).over(byUser).as("pv"),
        row_number().over(byUser).as("rn"))
      val m = o
        .filter(col("pv").isNotNull)
        .select(
          col("user_id"),
          (col("value") > col("pv")).as("rise"),
          sum(when(col("value") > col("pv"), 0).otherwise(1))
            .over(Window.partitionBy(col("user_id")).orderBy(col("rn")))
            .as("grp"))
      m.filter(col("rise"))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("user_id"))
        .agg(
          sum(col("run_len")).as("n_rises"),
          max(col("run_len")).as("max_run"),
          count(when(col("run_len") >= 3, 1)).as("n_runs_ge3"))
        .orderBy("user_id")
    }
  )
}
