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
}
