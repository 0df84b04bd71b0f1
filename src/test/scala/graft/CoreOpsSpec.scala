package graft

import graft.faults.FaultRules
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Reference-parity semantics on hand-built frames (SURVEY.md §5.2.2):
  * boundary-inclusive ranges (main.rs:131-134), null-vs-0 flags (§1.2 Q2),
  * duplicate keys (Q5), empty results (main.rs:463-472 analog).
  */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val telemetry = Seq(
    ("Sa_FanSpeed", ts("2024-08-28 11:59:59"), 0.50, None: Option[Byte], "id-a"),
    ("Sa_FanSpeed", ts("2024-08-28 12:00:00"), 0.96, None: Option[Byte], "id-a"),
    ("Sa_FanSpeed", ts("2024-08-28 12:05:00"), 0.20, Some(0: Byte), "id-a"),
    ("Sa_FanSpeed", ts("2024-08-28 12:05:00"), 0.99, None: Option[Byte], "id-a"), // dup key (Q5)
    ("Oa_Temp", ts("2024-08-28 12:01:00"), 0.97, None: Option[Byte], "id-b"),
    ("Sa_FanSpeed", ts("2024-08-28 12:10:01"), 0.98, None: Option[Byte], "id-a"))
    .toDF("sensor_name", "timestamp", "value", "fc1_flag", "timeseries_id")

  test("R2 range scan: both endpoints inclusive, series equality") {
    val out = telemetry
      .filter(
        col("timeseries_id") === "id-a" &&
          col("timestamp").between(ts("2024-08-28 12:00:00"), ts("2024-08-28 12:05:00")))
      .collect()
    // excludes 11:59:59 (before start) and 12:10:01 (after end) and id-b
    assert(out.length === 3)
    assert(out.forall(_.getAs[String]("timeseries_id") == "id-a"))
  }

  test("R2 range scan on empty table returns empty, not error") {
    val out = telemetry
      .filter(col("timeseries_id") === "no-such-series")
      .collect()
    assert(out.isEmpty)
  }

  test("R5 threshold flag: > is strict; flag is null (not 0) below threshold") {
    val out = telemetry
      .withColumn("derived", FaultRules.thresholdFlag(col("value"), 0.95))
      .orderBy("timestamp", "value")
      .collect()
    val flags = out.map(r => Option(r.getAs[java.lang.Long]("derived")))
    // values: 0.50->null, 0.96->1, 0.20->null, 0.99->1, 0.97->1, 0.98->1
    assert(flags.count(_.contains(1L)) === 4)
    assert(flags.count(_.contains(1L)) + flags.count(_.isEmpty) === flags.length)
  }

  test("R5 exact flag count matches brute force") {
    val n = telemetry
      .withColumn("f", FaultRules.thresholdFlag(col("value"), 0.95))
      .filter(col("f") === 1)
      .count()
    val brute = telemetry.collect().count(_.getAs[Double]("value") > 0.95)
    assert(n === brute)
  }

  test("Q2 fidelity: Some(0) flag survives (reference conflated it with None)") {
    val zeros = telemetry.filter(col("fc1_flag") === 0).count()
    val nulls = telemetry.filter(col("fc1_flag").isNull).count()
    assert(zeros === 1)
    assert(nulls === 5)
  }

  test("R3 recompute: merge keeps derived over prior, prior where no derive") {
    val out = telemetry
      .withColumn(
        "merged",
        FaultRules.mergeFlags(
          FaultRules.thresholdFlag(col("value"), 0.95),
          col("fc1_flag").cast("long")))
      .collect()
    // 0.20 row had prior Some(0) and derives nothing -> keeps 0
    val zeroRow = out.find(_.getAs[Double]("value") == 0.20).get
    assert(zeroRow.getAs[java.lang.Long]("merged") === 0L)
    // 0.96 row derives 1
    val hot = out.find(_.getAs[Double]("value") == 0.96).get
    assert(hot.getAs[java.lang.Long]("merged") === 1L)
  }

  test("Q5 duplicates: both rows with identical (timestamp, id) key survive") {
    val dups = telemetry
      .filter(col("timestamp") === ts("2024-08-28 12:05:00") && col("timeseries_id") === "id-a")
      .count()
    assert(dups === 2)
  }

  test("rate-of-change rule flags jumps within series only") {
    val out = telemetry
      .withColumn(
        "roc",
        FaultRules.rateOfChangeFlag(
          col("timeseries_id"), col("timestamp"), col("value"),
          col("value"), 0.4))
      .filter(col("roc") === 1)
      .collect()
    // id-a ordered: .50 -> .96 (+.46 flag), .20 (-.76 flag), .99 (+.79 flag), .98 (tie-order by value after .99? no: same ts 12:05 rows ordered by value .20 then .99)
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("timeseries_id") == "id-a"))
  }

  test("quality expectations: 7 rules, both verdicts exercised, counts honest") {
    val rows = Registry.byName("q_quality_expectations").fn(spark, sfDir).collect()
    assert(rows.length === 7)
    val byId = rows.map(r => r.getAs[String]("rule_id") -> r).toMap
    // pass must be DERIVED from the violation count, never asserted separately
    rows.foreach { r =>
      assert(
        r.getAs[Boolean]("pass") === (r.getAs[Long]("n_violations") == 0L),
        s"${r.getAs[String]("rule_id")}: pass disagrees with n_violations")
      assert(r.getAs[Long]("n_checked") >= r.getAs[Long]("n_violations"))
    }
    // the driver data makes r1 and r7 genuinely fail — a gate whose failing
    // branch never runs is untested — and the structural rules pass
    assert(byId("r1_lineitem_qty_range").getAs[Long]("n_violations") > 0)
    assert(byId("r7_events_value_range").getAs[Long]("n_violations") > 0)
    assert(byId("r3_orders_custkey_fk").getAs[Boolean]("pass"))
    assert(byId("r4_orders_orderkey_unique").getAs[Boolean]("pass"))
    assert(byId("r6_customer_nationkey_fk").getAs[Boolean]("pass"))
    // r1's count equals an independent recompute of the same predicate
    val expectR1 = U.lineitem(spark, sfDir)
      .filter(col("l_quantity").isNull || col("l_quantity") < 1 || col("l_quantity") > 45)
      .count()
    assert(byId("r1_lineitem_qty_range").getAs[Long]("n_violations") === expectR1)
    // n_checked is the full table cardinality per rule's table
    assert(byId("r5_documents_nchars_consistent").getAs[Long]("n_checked") ===
      U.documents(spark, sfDir).count())
  }

  test("quality drift: crafted shifted corpus drifts, stationary one does not") {
    // X: first half all in bucket 0, second half all in bucket 19 -> TVD 1.0
    // Y: identical halves -> TVD 0. Midpoint us = (0 + 1000 + 1) div 2 = 500.
    val rows =
      (0L until 50L).map(i => ("X", i, 1.0)) ++
        (950L until 1000L).map(i => ("X", i, 480.0)) ++
        (0L until 50L).map(i => ("Y", i, if (i % 2 == 0) 30.0 else 80.0)) ++
        (950L until 1000L).map(i => ("Y", i, if (i % 2 == 0) 30.0 else 80.0))
    val out = ops.CoreOps
      .driftTvd(rows.toDF("event_type", "us", "value"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r)
      .toMap
    assert(out("X").getAs[Long]("tvd_ppm") === 1000000L)
    assert(out("X").getAs[Boolean]("drifted"))
    assert(out("Y").getAs[Long]("tvd_ppm") === 0L)
    assert(!out("Y").getAs[Boolean]("drifted"))
    assert(out("X").getAs[Long]("n_a") === 50L && out("X").getAs[Long]("n_b") === 50L)
    // registry-data sanity: every tvd is a valid probability distance
    val reg = Registry.byName("q_quality_drift").fn(spark, sfDir).collect()
    assert(reg.nonEmpty)
    reg.foreach { r =>
      val t = r.getAs[Long]("tvd_ppm")
      assert(t >= 0L && t <= 1000000L)
      assert(r.getAs[Boolean]("drifted") === (t > 100000L))
    }
  }
}
