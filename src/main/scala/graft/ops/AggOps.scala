package graft.ops

import graft.{Q, U}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 group D — aggregation. The reference's only aggregate is a
  * client-side threshold count (`py_client.py:40-49`); this group provides
  * the full server-side surface: multi-aggregate hash aggregation (TPC-H Q1
  * shape), exact and approximate distinct counting, and hierarchical
  * rollup/cube/grouping-sets.
  *
  * Scale notes: all of these hash-aggregate with map-side partial
  * aggregation, so the shuffle carries one row per (partition x group), not
  * per input row. `approx_count_distinct` (HLL++) is the 100 TB path where
  * exact distinct would shuffle every distinct key.
  */
object AggOps {

  private val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val charge =
    col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))

  val qs: Seq[Q] = Seq(
    // TPC-H Q1 shape: partial+final hash aggregate, 8 aggregates per group.
    Q(
      "q_agg_hash",
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      U.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(U.dsum(col("l_quantity")), 2).as("sum_qty"),
          round(U.dsum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(U.dsum(revenue), 2).as("sum_disc_price"),
          round(U.dsum(charge), 2).as("sum_charge"),
          round(U.davg(col("l_quantity")), 4).as("avg_qty"),
          round(U.davg(col("l_extendedprice")), 4).as("avg_price"),
          round(U.davg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Exact distinct counts per group (expand + two-phase aggregate).
    Q(
      "q_agg_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        U.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag")
    },

    // HLL++ sketch distinct — the scale path; no exact oracle (driver
    // records a rows-only check), correctness bounded in ScalaTest instead.
    Q.noOracle("q_agg_approx_distinct") { (s, d) =>
      U.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // Quantile sketch (Greenwald-Khanna via percentile_approx) — the scale
    // path where exact percentiles would need a full sort; accuracy bounded
    // against exact quantiles in ScalaTest, driver records rows-only.
    Q.noOracle("q_agg_approx_quantile") { (s, d) =>
      U.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000))
            .as("p95"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // Hierarchical totals: rollup / cube / grouping sets.
    Q(
      "q_agg_rollup",
      """SELECT CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, d) =>
        U.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          // grouping() is only resolvable inside the agg list of the
          // rollup/cube Aggregate itself, not in a downstream select.
          .agg(
            grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"),
            round(U.dsum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n"))
          .select(
            col("g_flag"),
            col("g_status"),
            col("l_returnflag"),
            col("l_linestatus"),
            col("sum_qty"),
            col("n"))
          .orderBy(
            col("g_flag"),
            col("g_status"),
            col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },
    Q(
      "q_agg_cube",
      """SELECT CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, d) =>
        U.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"),
            round(U.dsum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n"))
          .select(
            col("g_flag"),
            col("g_status"),
            col("l_returnflag"),
            col("l_linestatus"),
            col("sum_qty"),
            col("n"))
          .orderBy(
            col("g_flag"),
            col("g_status"),
            col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },
    Q(
      "q_agg_gsets",
      """SELECT CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, d) =>
        U.lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
        s.sql(
          """SELECT CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
            |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
            |  l_returnflag, l_linestatus,
            |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
            |  count(*) AS n
            |FROM graft_lineitem_gs
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }
  )
}
