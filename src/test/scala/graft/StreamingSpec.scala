package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Streaming operators verified by batch equivalence (SURVEY.md §5.2.4):
  * each group-J transform run over a MemoryStream (complete/append output to
  * a memory sink) must equal the same transform applied to the same rows as
  * a batch frame — including late-arriving rows admitted by the watermark.
  */
/** Top-level so Spark can derive an Encoder (inner classes need outer scope). */
case class Tele(
    sensor_name: String, timestamp: Timestamp, value: Double,
    fc1_flag: Option[Byte], timeseries_id: String)

/** Document record for the streaming near-dup dedup tests. */
case class Doc(doc_id: Long, text: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    Tele("Sa_FanSpeed", ts("2024-08-28 12:00:10"), 0.96, None, "id-a"),
    Tele("Sa_FanSpeed", ts("2024-08-28 12:01:00"), 0.50, None, "id-a"),
    Tele("Sa_FanSpeed", ts("2024-08-28 12:06:00"), 0.99, None, "id-a"),
    Tele("Oa_Temp",     ts("2024-08-28 12:02:00"), 0.97, None, "id-b"),
    // late row: arrives after the 12:06 row but belongs to the first window
    Tele("Sa_FanSpeed", ts("2024-08-28 12:03:00"), 0.98, None, "id-a"),
    Tele("Sa_FanSpeed", ts("2024-08-28 13:00:00"), 0.10, None, "id-a"))

  // Default trigger, not AvailableNow: AvailableNow snapshots the available
  // offsets at start(), so data added afterwards silently never processes
  // (observed as intermittently empty sinks); the default micro-batch loop
  // plus processAllAvailable() is race-free for add-then-drain tests.
  private def runComplete(
      name: String)(xform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Tele]
    val q = xform(mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .start()
    mem.addData(rows.take(4))
    q.processAllAvailable()
    mem.addData(rows.drop(4))
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("faultCounts stream == batch on same rows, late row lands in its window") {
    val streamed = runComplete("fc_stream")(df =>
      Streams.faultCounts(df, threshold = 0.95, windowLen = "5 minutes"))
    val batch = Streams.faultCounts(
      rows.toDF(), threshold = 0.95, windowLen = "5 minutes")
    assert(
      streamed.orderBy("timeseries_id", "window_start").collect().toSeq ===
        batch.orderBy("timeseries_id", "window_start").collect().toSeq)
    // the late 12:03 fault (0.98) must be counted in the 12:00 window
    val w0 = streamed
      .filter(col("timeseries_id") === "id-a" &&
        col("window_start") === ts("2024-08-28 12:00:00"))
      .head()
    assert(w0.getAs[Long]("n_faults") === 2) // 0.96 and late 0.98
  }

  test("hoppingCounts stream == batch; every event lands in its 3 overlapping windows") {
    val streamed = runComplete("hop_stream")(df => Streams.hoppingCounts(df))
    val batch = Streams.hoppingCounts(rows.toDF())
    assert(
      streamed.orderBy("timeseries_id", "window_start").collect().toSeq ===
        batch.orderBy("timeseries_id", "window_start").collect().toSeq)
    // 15m/5m hop: the 12:00:10 event must appear in windows starting
    // 11:50, 11:55, and 12:00 — the constant 3-way fan-out
    val w = streamed
      .filter(col("timeseries_id") === "id-a" &&
        col("window_start").isin(
          ts("2024-08-28 11:50:00"), ts("2024-08-28 11:55:00"),
          ts("2024-08-28 12:00:00")))
      .collect()
    assert(w.length === 3, s"expected the event in 3 hopping windows, got ${w.length}")
  }

  test("qualityGate: per-window per-rule violation counts; stream == batch") {
    val qrows = Seq(
      Tele("S", ts("2024-08-28 12:00:10"), 0.5, None, "id-a"), // clean
      Tele("S", ts("2024-08-28 12:01:00"), 1.5, None, "id-a"), // range (hi)
      Tele("S", ts("2024-08-28 12:02:00"), Double.NaN, Some(1: Byte), "id-a"), // range (NaN)
      Tele("S", ts("2024-08-28 12:03:00"), 0.7, Some(7: Byte), null), // flag + id
      Tele("S", ts("2024-08-28 12:07:00"), 0.2, Some(0: Byte), "id-b")) // clean, window 2
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Tele]
    val q = Streams.qualityGate(mem.toDF())
      .writeStream.format("memory").queryName("qg_stream").outputMode("complete")
      .start()
    mem.addData(qrows)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qg_stream")
    val batch = Streams.qualityGate(qrows.toDF())
    assert(
      streamed.orderBy("window_start", "rule_id").collect().toSeq ===
        batch.orderBy("window_start", "rule_id").collect().toSeq)
    val w0 = streamed
      .filter(col("window_start") === ts("2024-08-28 12:00:00"))
      .collect().map(r => r.getAs[String]("rule_id") -> r).toMap
    assert(w0("rv_value_range").getAs[Long]("n_checked") === 4L)
    assert(w0("rv_value_range").getAs[Long]("n_violations") === 2L) // 1.5 + NaN
    assert(w0("rv_id_present").getAs[Long]("n_violations") === 1L)  // null id
    assert(w0("rv_flag_domain").getAs[Long]("n_violations") === 1L) // flag 7
    val w1 = streamed
      .filter(col("window_start") === ts("2024-08-28 12:05:00"))
      .collect()
    assert(w1.length === 3 && w1.forall(_.getAs[Long]("n_violations") === 0L))
    // malformed STRING flags must fail the domain rule, not slip through:
    // 'abc' casts to NULL (unparseable), '1.7' stays fractional; '1' and
    // a NULL flag conform
    val weird = Seq(
      ("2024-08-28 12:00:10", "id-a", 0.5, "abc"),
      ("2024-08-28 12:00:20", "id-a", 0.5, "1.7"),
      ("2024-08-28 12:00:30", "id-a", 0.5, "1"),
      ("2024-08-28 12:00:40", "id-a", 0.5, null))
      .toDF("ts_s", "timeseries_id", "value", "fc1_flag")
      .select(
        col("ts_s").cast("timestamp").as("timestamp"),
        col("timeseries_id"), col("value"), col("fc1_flag"))
    val wf = Streams.qualityGate(weird)
      .filter(col("rule_id") === "rv_flag_domain").collect()
    assert(wf.map(_.getAs[Long]("n_violations")).sum === 2L,
      "unparseable and fractional flags must both count as violations")
  }

  test("sessionize stream == batch on same rows") {
    val streamed = runComplete("sess_stream")(df =>
      Streams.sessionize(df, gap = "30 minutes"))
    val batch = Streams.sessionize(rows.toDF(), gap = "30 minutes")
    assert(
      streamed.orderBy("timeseries_id", "session_start").collect().toSeq ===
        batch.orderBy("timeseries_id", "session_start").collect().toSeq)
    // 13:00 row is > 30 min after 12:06 -> id-a has 2 sessions
    assert(streamed.filter(col("timeseries_id") === "id-a").count() === 2)
  }

  test("append mode: watermark finalizes windows and DROPS data later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Tele]
    val q = Streams.faultCounts(
      mem.toDF(), threshold = 0.95, windowLen = "5 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("wm_drop")
      .outputMode("append").start()
    def t(s: String, v: Double) = Tele("Sa_FanSpeed", ts(s), v, None, "id-a")
    // b1: one fault in the 12:00 window
    mem.addData(Seq(t("2024-08-28 12:01:00", 0.99)))
    q.processAllAvailable()
    // b2: event at 13:00 -> after this batch the watermark is 12:50
    mem.addData(Seq(t("2024-08-28 13:00:00", 0.10)))
    q.processAllAvailable()
    // b3: another batch lets the finalized 12:00 window emit
    mem.addData(Seq(t("2024-08-28 13:01:00", 0.10)))
    q.processAllAvailable()
    val emitted = spark.table("wm_drop")
      .filter(col("window_start") === ts("2024-08-28 12:00:00")).collect()
    assert(emitted.length === 1 && emitted.head.getAs[Long]("n_rows") === 1)
    // b4: a row for the already-finalized 12:00 window, far behind the
    // watermark -> dropped, the emitted window must NOT change or re-emit
    mem.addData(Seq(t("2024-08-28 12:02:00", 0.99)))
    q.processAllAvailable()
    mem.addData(Seq(t("2024-08-28 13:02:00", 0.10)))
    q.processAllAvailable()
    q.stop()
    val after = spark.table("wm_drop")
      .filter(col("window_start") === ts("2024-08-28 12:00:00")).collect()
    assert(after.length === 1, "finalized window must not re-emit for a too-late row")
    assert(after.head.getAs[Long]("n_rows") === 1,
      "too-late row must be dropped, not merged into the finalized window")
  }

  test("dedupExact drops at-least-once redelivery within the watermark, keeps distinct rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Tele]
    val q = Streams.dedupExact(mem.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    val r1 = Tele("Sa_FanSpeed", ts("2024-08-28 12:00:10"), 0.96, None, "id-a")
    val r2 = Tele("Sa_FanSpeed", ts("2024-08-28 12:01:00"), 0.50, None, "id-a")
    mem.addData(Seq(r1, r2, r1)) // duplicate inside one micro-batch
    q.processAllAvailable()
    mem.addData(Seq(r1)) // redelivery in a LATER micro-batch (state hit)
    q.processAllAvailable()
    val r3 = r2.copy(timestamp = ts("2024-08-28 12:08:00")) // new content
    mem.addData(Seq(r3))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_stream")
    assert(out.count() === 3, "exactly one row per distinct content digest")
    // batch equivalence: same distinct content set as a batch dedup
    val batchKeys = Seq(r1, r2, r1, r1, r3).toDF()
      .select(concat_ws("|", col("timeseries_id"), col("timestamp").cast("long"),
        col("value").cast("string")).as("k"))
      .distinct().collect().map(_.getString(0)).toSet
    val streamKeys = out
      .select(concat_ws("|", col("timeseries_id"), col("timestamp").cast("long"),
        col("value").cast("string")).as("k"))
      .collect().map(_.getString(0)).toSet
    assert(streamKeys === batchKeys)
  }

  test("intervalJoin stream-stream == batch join on same rows; outside-window rows unmatched") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[Tele]
    val rMem = MemoryStream[Tele]
    val q = Streams.intervalJoin(lMem.toDF(), rMem.toDF(), maxDelay = "10 minutes")
      .writeStream.format("memory").queryName("ij_stream")
      .outputMode("append").start()
    val lRows = Seq(
      Tele("cmd", ts("2024-08-28 12:00:00"), 1.0, None, "id-a"),
      Tele("cmd", ts("2024-08-28 12:20:00"), 2.0, None, "id-a"))
    val rRows = Seq(
      Tele("rsp", ts("2024-08-28 12:05:00"), 10.0, None, "id-a"), // matches 12:00
      Tele("rsp", ts("2024-08-28 12:15:00"), 20.0, None, "id-a"), // matches nothing (>10m after 12:00, before 12:20)
      Tele("rsp", ts("2024-08-28 12:25:00"), 30.0, None, "id-a"), // matches 12:20
      Tele("rsp", ts("2024-08-28 12:05:00"), 40.0, None, "id-b")) // wrong series
    lMem.addData(lRows)
    rMem.addData(rRows)
    q.processAllAvailable()
    // advance both watermarks so buffered state can flush deterministically
    lMem.addData(Seq(Tele("cmd", ts("2024-08-28 14:00:00"), 0.0, None, "id-z")))
    rMem.addData(Seq(Tele("rsp", ts("2024-08-28 14:00:00"), 0.0, None, "id-z")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij_stream")
      .select("timeseries_id", "l_value", "r_value")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val want = Streams.intervalJoin(
        (lRows :+ Tele("cmd", ts("2024-08-28 14:00:00"), 0.0, None, "id-z")).toDF(),
        (rRows :+ Tele("rsp", ts("2024-08-28 14:00:00"), 0.0, None, "id-z")).toDF())
      .select("timeseries_id", "l_value", "r_value")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got === Set(("id-a", 1.0, 10.0), ("id-a", 2.0, 30.0), ("id-z", 0.0, 0.0)))
  }

  test("intervalJoin left_outer: unmatched left rows emit with null right side only after the watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[Tele]
    val rMem = MemoryStream[Tele]
    val q = Streams.intervalJoin(
        lMem.toDF(), rMem.toDF(), maxDelay = "10 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("loj_stream")
      .outputMode("append").start()
    val matched = Tele("cmd", ts("2024-08-28 12:00:00"), 1.0, None, "id-a")
    val orphan = Tele("cmd", ts("2024-08-28 12:00:00"), 2.0, None, "id-b")
    lMem.addData(Seq(matched, orphan))
    rMem.addData(Seq(Tele("rsp", ts("2024-08-28 12:05:00"), 10.0, None, "id-a")))
    q.processAllAvailable()
    // watermark hasn't passed orphan's window yet: no null-padded row
    assert(spark.table("loj_stream").filter(col("r_value").isNull).count() === 0)
    // advance both watermarks far past 12:10 -> orphan's window closes
    lMem.addData(Seq(Tele("cmd", ts("2024-08-28 14:00:00"), 0.0, None, "id-z")))
    rMem.addData(Seq(Tele("rsp", ts("2024-08-28 14:00:00"), 0.0, None, "id-z")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("loj_stream")
      .select("timeseries_id", "l_value", "r_value")
      .collect().map(r => (r.getString(0), r.getDouble(1), Option(r.get(2)))).toSet
    assert(out.contains(("id-a", 1.0, Some(10.0))), "matched pair")
    assert(out.contains(("id-b", 2.0, None)), "orphan emitted null-padded after watermark")
  }

  test("faultFlags is stateless and batch-identical") {
    // stateless transform: apply to batch frame both ways
    val flagged = Streams.faultFlags(rows.toDF(), 0.95)
    val expect = rows.map(t => if (t.value > 0.95) Some(1L) else None)
    val got = flagged.collect().map(r => Option(r.getAs[java.lang.Long]("fc1_flag")).map(_.toLong))
    assert(got.toSeq === expect)
  }

  test("enrich: stream-static broadcast join attaches catalog attrs, keeps uncataloged rows") {
    implicit val sqlCtx = spark.sqlContext
    val catalog = Seq(("id-a", "AHU-1", "Briq:Supply_Fan")).toDF(
      "timeseries_id", "equipment", "brick_class")
    val mem = MemoryStream[Tele]
    val q = Streams.enrich(mem.toDF(), catalog)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData(rows.take(4))
    q.processAllAvailable(); q.stop()
    val out = spark.table("enriched")
    assert(out.count() === 4)
    assert(out.filter(col("timeseries_id") === "id-a")
      .collect().forall(_.getAs[String]("equipment") == "AHU-1"))
    // left join: the uncataloged id-b row survives with null attrs
    val idb = out.filter(col("timeseries_id") === "id-b").collect()
    assert(idb.length === 1 && idb.head.getAs[String]("equipment") == null)
  }

  test("rates: counter reset across a micro-batch boundary; final snapshot == batch kernel") {
    import graft.streaming.Telemetry
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Telemetry]
    val q = Streams.rates(mem.toDS())
      .writeStream.format("memory").queryName("rates_stream")
      .outputMode("append").start()
    def t(s: String, v: Double, id: String = "ctr-a") =
      Telemetry("Counter", ts(s), v, None, id)
    // micro-batch 1: monotone counter (deltas 1500, 1500 milli-units)
    mem.addData(Seq(
      t("2024-08-28 12:00:00", 1.000),
      t("2024-08-28 12:01:00", 2.500),
      t("2024-08-28 12:02:00", 4.000)))
    q.processAllAvailable()
    // micro-batch 2: the counter RESET (4.000 -> 0.500) spans the batch
    // boundary — detectable only via carried state — plus one more
    // increment and one out-of-order row older than the carried last ts
    mem.addData(Seq(
      t("2024-08-28 12:03:00", 0.500),
      t("2024-08-28 12:04:00", 1.500),
      t("2024-08-28 12:01:30", 9.999))) // across-batch late: dropped+counted
    q.processAllAvailable()
    q.stop()
    // latest snapshot = the one with the max duration
    val last = spark.table("rates_stream")
      .orderBy(col("dur_us").desc).head()
    assert(last.getAs[Long]("increase_m") === 1500L + 1500L + 500L + 1000L)
    assert(last.getAs[Long]("n_resets") === 1L)
    assert(last.getAs[Long]("dur_us") === 240L * 1000000L)
    assert(last.getAs[Long]("n_late_dropped") === 1L)
    // batch kernel on the same (non-dropped) rows: identical fold
    val folded = Seq(1.000, 2.500, 4.000, 0.500, 1.500)
      .map(v => math.floor(v * 1000 + 0.5).toLong)
      .sliding(2).map { case Seq(a, b) => if (b - a < 0) b else b - a }.sum
    assert(last.getAs[Long]("increase_m") === folded)
    assert(last.getAs[Double]("rate_per_s") === (folded / 1000.0) / 240.0)
  }

  test("ewma: fold spans a micro-batch boundary; final snapshot == batch kernel") {
    import graft.streaming.Telemetry
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Telemetry]
    val q = Streams.ewma(mem.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    def t(s: String, v: Double, id: String = "ewma-a") =
      Telemetry("Sensor", ts(s), v, None, id)
    // micro-batch 1: three in-order samples
    mem.addData(Seq(
      t("2024-08-28 12:00:00", 1.0),
      t("2024-08-28 12:01:00", 2.0),
      t("2024-08-28 12:02:00", 4.0)))
    q.processAllAvailable()
    // micro-batch 2: the fold CONTINUES from carried state (e after batch 1
    // must seed batch 2), plus one across-batch late row: dropped + counted
    // because an order-sensitive recurrence cannot retro-fold
    mem.addData(Seq(
      t("2024-08-28 12:03:00", 8.0),
      t("2024-08-28 12:04:00", 0.5),
      t("2024-08-28 12:01:30", 99.9))) // late vs carried lastTs
    q.processAllAvailable()
    q.stop()
    val last = spark.table("ewma_stream").orderBy(col("n").desc).head()
    // driver-side twin of the batch q_ts_ewma kernel on the kept rows
    val folded = Seq(2.0, 4.0, 8.0, 0.5)
      .foldLeft(1.0)((e, v) => 0.25 * v + 0.75 * e)
    assert(last.getAs[Long]("n") === 5L)
    assert(last.getAs[Double]("ewma") === math.floor(folded * 1e6 + 0.5) / 1e6)
    assert(last.getAs[Long]("n_late_dropped") === 1L)
    // the batch-1 snapshot was itself the 3-row prefix fold
    val first = spark.table("ewma_stream").orderBy(col("n").asc).head()
    val prefix = Seq(2.0, 4.0).foldLeft(1.0)((e, v) => 0.25 * v + 0.75 * e)
    assert(first.getAs[Long]("n") === 3L)
    assert(first.getAs[Double]("ewma") === math.floor(prefix * 1e6 + 0.5) / 1e6)
  }

  test("rates: equal-timestamp rows fold in deterministic (ts, value) order") {
    import graft.streaming.Telemetry
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Telemetry]
    val q = Streams.rates(mem.toDS())
      .writeStream.format("memory").queryName("rates_ties")
      .outputMode("append").start()
    def t(v: Double) =
      Telemetry("Counter", ts("2024-08-28 12:01:00"), v, None, "tie-a")
    // two rows share one timestamp: the fold must order them by value
    // (5.0 before 7.0), NOT by nondeterministic iterator arrival — so the
    // deltas are +4000, +2000 and never a spurious reset
    mem.addData(Seq(
      Telemetry("Counter", ts("2024-08-28 12:00:00"), 1.0, None, "tie-a"),
      t(7.0), t(5.0)))
    q.processAllAvailable()
    q.stop()
    val r = spark.table("rates_ties").orderBy(col("dur_us").desc).head()
    assert(r.getAs[Long]("n_resets") === 0L,
      "equal-ts rows folded out of order: a spurious counter reset appeared")
    assert(r.getAs[Long]("increase_m") === 6000L)
  }

  test("faultRuns: run-length state carries across micro-batches; reset on cool reading") {
    import graft.streaming.{FaultRunAlert, Telemetry}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Telemetry]
    val alerts = Streams.faultRuns(mem.toDS(), threshold = 0.95, minRun = 3)
    // default trigger + processAllAvailable: one continuous query, so keyed
    // state genuinely persists between the two micro-batches below
    val q = alerts.writeStream.format("memory").queryName("fault_runs")
      .outputMode("append").start()
    def t(s: String, v: Double, id: String = "id-a") =
      Telemetry("Sa_FanSpeed", ts(s), v, None, id)
    // micro-batch 1: two consecutive faults (run = 2, below minRun -> silent)
    mem.addData(Seq(
      t("2024-08-28 12:00:00", 0.97),
      t("2024-08-28 12:01:00", 0.98),
      t("2024-08-28 12:00:30", 0.10, id = "id-b")))
    q.processAllAvailable()
    assert(spark.table("fault_runs").count() === 0)
    // micro-batch 2: third consecutive fault crosses minRun using state from
    // batch 1 -> exactly one alert; cool reading resets; 2 more faults stay
    // below minRun again
    mem.addData(Seq(
      t("2024-08-28 12:02:00", 0.99),
      t("2024-08-28 12:03:00", 0.10),
      t("2024-08-28 12:04:00", 0.97),
      t("2024-08-28 12:05:00", 0.98)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("fault_runs").collect()
      .map(r => (r.getAs[String]("timeseries_id"), r.getAs[Int]("run_length")))
    assert(out.toSeq === Seq(("id-a", 3)), s"got ${out.toSeq}")
  }

  test("faultRuns: a silent series' state is EVICTED once the watermark passes its TTL") {
    import graft.streaming.Telemetry
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Telemetry]
    // TTL 30 min: id-old's state must be gone once the watermark passes
    // last-event(12:01) + 30 min = 12:31
    val alerts = Streams.faultRuns(
      mem.toDS(), threshold = 0.95, minRun = 3,
      watermark = "10 minutes", stateTtlMinutes = 30)
    val q = alerts.writeStream.format("memory").queryName("fault_runs_ttl")
      .outputMode("append").start()
    def t(s: String, v: Double, id: String) = Telemetry("S", ts(s), v, None, id)
    // b1: id-old reaches run=2 (one fault short of an alert)
    mem.addData(Seq(
      t("2024-08-28 12:00:00", 0.97, "id-old"),
      t("2024-08-28 12:01:00", 0.98, "id-old")))
    q.processAllAvailable()
    // b2: only id-live traffic; watermark advances to 12:50 > 12:31
    mem.addData(Seq(t("2024-08-28 13:00:00", 0.10, "id-live")))
    q.processAllAvailable()
    // b3: another id-live batch lets the id-old timeout actually fire
    mem.addData(Seq(t("2024-08-28 13:01:00", 0.10, "id-live")))
    q.processAllAvailable()
    // b4: id-old returns with ONE fault. If the run=2 state had survived the
    // silence this would be run=3 -> alert; eviction means it restarts at 1.
    mem.addData(Seq(t("2024-08-28 13:30:00", 0.99, "id-old")))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("fault_runs_ttl").count() === 0,
      "state for the silent series must be dropped, not resumed")
  }

  test("silentSeries: exactly one alert for the series that goes quiet; live series never alerts") {
    import graft.streaming.Telemetry
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Telemetry]
    val q = Streams
      .silentSeries(mem.toDS(), horizonMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("silent_stream")
      .outputMode("append").start()
    def t(s: String, id: String) = Telemetry("S", ts(s), 1.0, None, id)
    // b1: both series report at 12:00
    mem.addData(Seq(t("2024-08-28 12:00:00", "id-quiet"), t("2024-08-28 12:00:00", "id-live")))
    q.processAllAvailable()
    // b2: only id-live; watermark -> 12:50 > id-quiet's 12:00 + 30m horizon
    mem.addData(Seq(t("2024-08-28 13:00:00", "id-live")))
    q.processAllAvailable()
    // b3: another live batch lets the elapsed timeout actually fire
    mem.addData(Seq(t("2024-08-28 13:01:00", "id-live")))
    q.processAllAvailable()
    val first = spark.table("silent_stream").collect()
    assert(first.length === 1, s"expected exactly one alert, got ${first.toSeq}")
    assert(first.head.getAs[String]("timeseries_id") === "id-quiet")
    assert(first.head.getAs[java.sql.Timestamp]("last_seen") === ts("2024-08-28 12:00:00"))
    // watermark-measured silence is a LOWER bound >= the horizon
    assert(first.head.getAs[Long]("silent_for_ms") >= 30L * 60000L)
    // b4: id-quiet RETURNS -> state re-arms fresh from the new last-seen
    mem.addData(Seq(t("2024-08-28 13:30:00", "id-quiet")))
    q.processAllAvailable()
    // b5/b6: live traffic advances the watermark past 13:30 + 30m -> a
    // SECOND alert for the same series, with the new last_seen
    mem.addData(Seq(t("2024-08-28 15:00:00", "id-live")))
    q.processAllAvailable()
    mem.addData(Seq(t("2024-08-28 15:01:00", "id-live")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("silent_stream")
      .collect()
      .map(r => (r.getAs[String]("timeseries_id"), r.getAs[java.sql.Timestamp]("last_seen")))
      .sortBy(_._2.getTime)
    assert(out.toSeq === Seq(
      ("id-quiet", ts("2024-08-28 12:00:00")),
      ("id-quiet", ts("2024-08-28 13:30:00"))),
      "a returning series must re-arm and alert again; a live series must never alert")
  }

  test("countMv: stream MV counts == direct batch counts; drift reader matches hand-computed integers; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val mv = java.nio.file.Files.createTempDirectory("graft_cntmv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cntmv_ckpt").toString
    val mem = MemoryStream[Tele]
    val q = Streams
      .countMvSink(mem.toDF(), mv, ckpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    def t(s: String, id: String) = Tele("S", ts(s), 1.0, None, id)
    // 4 days: id-a shrinks 3 -> 1 across the midpoint, id-b grows 1 -> 3
    val b0 = Seq(
      t("2024-08-25 10:00:00", "id-a"), t("2024-08-25 11:00:00", "id-a"),
      t("2024-08-26 10:00:00", "id-a"), t("2024-08-25 10:00:00", "id-b"))
    val b1 = Seq(
      t("2024-08-27 10:00:00", "id-a"),
      t("2024-08-27 10:00:00", "id-b"), t("2024-08-28 10:00:00", "id-b"),
      t("2024-08-28 11:00:00", "id-b"))
    mem.addData(b0); q.processAllAvailable()
    mem.addData(b1); q.processAllAvailable()
    q.stop()
    // MV partials re-merge to the direct per-(series, day) batch counts
    val merged = spark.read.parquet(mv)
      .groupBy(col("timeseries_id"), col("day")).agg(sum("n").as("n"))
      .collect()
      .map(r => (r.getAs[String]("timeseries_id"), r.getAs[java.sql.Date]("day").toString) -> r.getAs[Long]("n"))
      .toMap
    val direct = (b0 ++ b1).groupBy(r => (r.timeseries_id, r.timestamp.toString.take(10)))
      .map { case (k, rs) => k -> rs.length.toLong }
    assert(merged === direct)
    // drift: days 25..28, mid = (19960+19963+1) div 2 -> old = {25,26}, new = {27,28}
    // id-a: n_old=3, n_new=1; id-b: n_old=1, n_new=3; t_old=t_new=4
    val drift = Streams.mvMixDrift(spark, mv).collect()
      .map(r => r.getAs[String]("timeseries_id") ->
        ((r.getAs[Long]("n_old"), r.getAs[Long]("n_new"), r.getAs[Long]("ppm_old"),
          r.getAs[Long]("ppm_new"), r.getAs[Long]("drift_num"), r.getAs[Long]("drift_den"))))
      .toMap
    assert(drift === Map(
      "id-a" -> ((3L, 1L, 750000L, 250000L, 8L, 32L)),
      "id-b" -> ((1L, 3L, 250000L, 750000L, 8L, 32L))))
    // replay batch 1: same rows, same batch_id -> byte-equal effect
    import spark.implicits._
    Streams.countMvBatch(b1.toDF(), mv, batchId = 1L)
    val drift2 = Streams.mvMixDrift(spark, mv).collect()
      .map(r => r.getAs[String]("timeseries_id") -> r.getAs[Long]("drift_num")).toMap
    assert(drift2 === Map("id-a" -> 8L, "id-b" -> 8L))
  }

  test("cmMv: estimates off the streamed CM MV equal exact counts; range prunes; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val mv = java.nio.file.Files.createTempDirectory("graft_cmmv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cmmv_ckpt").toString
    val mem = MemoryStream[Tele]
    val q = Streams
      .cmMvSink(mem.toDF(), mv, ckpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    def t(s: String, id: String) = Tele("S", ts(s), 1.0, None, id)
    val b0 = Seq(
      t("2024-08-25 10:00:00", "id-a"), t("2024-08-25 11:00:00", "id-a"),
      t("2024-08-25 10:00:00", "id-b"))
    val b1 = Seq(
      t("2024-08-26 10:00:00", "id-a"),
      t("2024-08-26 10:00:00", "id-c"), t("2024-08-26 11:00:00", "id-c"),
      t("2024-08-26 12:00:00", "id-c"))
    mem.addData(b0); q.processAllAvailable()
    mem.addData(b1); q.processAllAvailable()
    q.stop()
    def ests(start: String, end: String): Map[String, Long] =
      Streams.cmEstimate(
        spark, mv, Seq("id-a", "id-b", "id-c", "id-ghost"), start, end)
        .collect()
        .map(r => r.getAs[String]("timeseries_id") -> r.getAs[Long]("est"))
        .toMap
    // 3 ids in 4x512 cells: no id collides with another in all 4 depths,
    // so every estimate is exact (one-sided guarantee met with equality);
    // the never-seen key reads an untouched cell -> 0
    assert(ests("2024-08-25", "2024-08-26") ===
      Map("id-a" -> 3L, "id-b" -> 1L, "id-c" -> 3L, "id-ghost" -> 0L))
    // day-range pruning: only day-25 partials contribute
    assert(ests("2024-08-25", "2024-08-25") ===
      Map("id-a" -> 2L, "id-b" -> 1L, "id-c" -> 0L, "id-ghost" -> 0L))
    // replay batch 1: same rows, same batch_id directory -> identical cells
    import spark.implicits._
    Streams.cmMvBatch(b1.toDF(), mv, batchId = 1L)
    assert(ests("2024-08-25", "2024-08-26") ===
      Map("id-a" -> 3L, "id-b" -> 1L, "id-c" -> 3L, "id-ghost" -> 0L))
  }

  test("hhMv: merged stream partials equal exact counts in MG's exact regime; replay preserves the summary") {
    implicit val sqlCtx = spark.sqlContext
    val mv = java.nio.file.Files.createTempDirectory("graft_hhmv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hhmv_ckpt").toString
    val mem = MemoryStream[Tele]
    val q = Streams
      .hhMvSink(mem.toDF(), mv, ckpt, k = 8, Trigger.ProcessingTime("0 seconds"))
      .start()
    def t(s: String, id: String) = Tele("S", ts(s), 1.0, None, id)
    // two days, three series, split across two batches; k=8 >= 3 distinct
    // -> MG never decrements, so every partial is the exact count map and
    // the merged MV must equal exact counts regardless of order
    val b0 = Seq(
      t("2024-08-25 10:00:00", "id-hot"), t("2024-08-25 11:00:00", "id-hot"),
      t("2024-08-25 12:00:00", "id-warm"), t("2024-08-26 10:00:00", "id-hot"))
    val b1 = Seq(
      t("2024-08-26 11:00:00", "id-hot"), t("2024-08-26 12:00:00", "id-warm"),
      t("2024-08-26 13:00:00", "id-cold"))
    mem.addData(b0); q.processAllAvailable()
    mem.addData(b1); q.processAllAvailable()
    q.stop()
    def readHh() = Streams
      .mvHeavyHitters(spark, mv, "2024-08-25", "2024-08-26", k = 8)
      .collect()
      .map(r => r.getAs[String]("timeseries_id") ->
        ((r.getAs[Long]("est"), r.getAs[Long]("n_total"))))
      .toMap
    val got = readHh()
    assert(got === Map(
      "id-hot" -> ((4L, 7L)), "id-warm" -> ((2L, 7L)), "id-cold" -> ((1L, 7L))))
    // day-range pruning: day 25 alone sees only its own rows
    val d25 = Streams.mvHeavyHitters(spark, mv, "2024-08-25", "2024-08-25", k = 8)
      .collect().map(r => r.getAs[String]("timeseries_id") -> r.getAs[Long]("est")).toMap
    assert(d25 === Map("id-hot" -> 2L, "id-warm" -> 1L))
    // replay batch 1 (at-least-once): the overwritten partial summarizes
    // the same rows, so the merged read is unchanged
    import spark.implicits._
    Streams.hhMvBatch(b1.toDF(), mv, batchId = 1L, k = 8)
    assert(readHh() === got)
  }

  test("minhashDedup: cross/intra-batch near-dups drop, survivors index, replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft_mhdedup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mhdedup_ckpt").toString
    // 40-word base text; near-dups differ in ONE trailing word -> shingle
    // jaccard 37/39 ~ 0.95 -> expected signature agreement ~30/32, far
    // above the minAgree=26 cut (and deterministic: fixed hash family)
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    def mut(last: String) = (0 until 39).map(i => s"w$i").mkString(" ") + " " + last
    val novel = (0 until 40).map(i => s"u$i").mkString(" ")
    val mem = MemoryStream[Doc]
    val q = Streams
      .minhashDedupSink(mem.toDF(), store, ckpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    // b0: doc 1 (base) and doc 2 (near-dup of 1) — INTRA-batch: higher id drops
    val b0 = Seq(Doc(1L, base), Doc(2L, mut("x2")))
    mem.addData(b0)
    q.processAllAvailable()
    // b1: doc 3 (near-dup of 1 — CROSS-batch vs the stored index),
    //     doc 4 (novel — survives), doc 5 (too short to shingle — kept)
    val b1 = Seq(Doc(3L, mut("x3")), Doc(4L, novel), Doc(5L, "tiny doc"))
    mem.addData(b1)
    q.processAllAvailable()
    q.stop()
    val decisions = Streams.dedupDecisions(spark, store).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_of"), r.getAs[Long]("agree"), r.getAs[Long]("batch_id"))))
      .toMap
    assert(decisions.keySet === Set(2L, 3L), s"wrong drop set: $decisions")
    assert(decisions(2L)._1 === 1L && decisions(2L)._3 === 0L)
    assert(decisions(3L)._1 === 1L && decisions(3L)._3 === 1L)
    decisions.values.foreach { case (_, agree, _) =>
      assert(agree >= 26L && agree <= 32L)
    }
    val survivors = Streams.dedupSurvivors(spark, store).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("batch_id")).toMap
    assert(survivors === Map(1L -> 0L, 4L -> 1L, 5L -> 1L))
    // replay batch 1 directly (at-least-once redelivery): candidate reads
    // exclude batch_id >= 1, outputs overwrite their own dirs -> the store
    // must come back IDENTICAL, not re-matched against its own attempt
    import spark.implicits._
    Streams.minhashDedupBatch(b1.toDF(), store, batchId = 1L)
    val decisions2 = Streams.dedupDecisions(spark, store).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"),
        r.getAs[Long]("agree"), r.getAs[Long]("batch_id"))).toSet
    val survivors2 = Streams.dedupSurvivors(spark, store).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("batch_id")).toMap
    assert(decisions2 === decisions.map { case (k, (d, a, b)) => (k, d, a, b) }.toSet)
    assert(survivors2 === survivors)
  }

  test("minhashDedup: an all-short batch indexes nothing matchable but keeps every doc") {
    // every doc under 3 tokens: no signatures exist, so candidate
    // generation sees empty frames end to end — the batch must still
    // record all docs as survivors (null sigs) and no decisions
    val store = java.nio.file.Files.createTempDirectory("graft_mhshort").toString
    import spark.implicits._
    val b = Seq(Doc(1L, "one two"), Doc(2L, "x"), Doc(3L, ""))
    Streams.minhashDedupBatch(b.toDF(), store, batchId = 0L)
    val survivors = Streams.dedupSurvivors(spark, store).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(survivors === Set(1L, 2L, 3L))
    assert(Streams.dedupDecisions(spark, store).collect().isEmpty)
  }

  test("upsertSink: update overrides append, replay is a no-op, partition layout survives") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_ckpt").toString
    val mem = MemoryStream[Tele]
    val q = Streams
      .upsertSink(mem.toDF(), out, ckpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    def t(s: String, v: Double, id: String) = Tele("S", ts(s), v, None, id)
    // b1: initial appends across TWO date partitions
    val b1 = Seq(
      t("2024-08-28 12:00:00", 1.0, "id-a"),
      t("2024-08-28 12:01:00", 2.0, "id-a"),
      t("2024-08-29 09:00:00", 5.0, "id-b"))
    mem.addData(b1)
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() === 3)
    // b2: a late CORRECTION for (id-a, 12:01) — delivered twice in one
    // batch with conflicting values; the deterministic tie-break must keep
    // the greater (9.0), and the stored 2.0 must be REPLACED, not duplicated
    val b2 = Seq(
      t("2024-08-28 12:01:00", 9.0, "id-a"),
      t("2024-08-28 12:01:00", 7.0, "id-a"))
    mem.addData(b2)
    q.processAllAvailable()
    q.stop()
    def snapshot() = spark.read.parquet(out)
      .select("timeseries_id", "timestamp", "value")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    val afterUpdate = snapshot()
    assert(afterUpdate === Set(
      ("id-a", ts("2024-08-28 12:00:00"), 1.0),
      ("id-a", ts("2024-08-28 12:01:00"), 9.0), // update overrode the append
      ("id-b", ts("2024-08-29 09:00:00"), 5.0)))
    // replay idempotence: at-least-once foreachBatch re-delivers batch 2 —
    // re-merging it must leave the layout byte-identical in content
    Streams.upsertBatch(b2.toDF(), out)
    assert(snapshot() === afterUpdate, "replaying a batch must be a no-op")
    // partition-layout survival: still day-partitioned dirs, still
    // compactable via the same swap discipline
    val dirs = new java.io.File(out).list().filter(_.startsWith("event_date=")).sorted
    assert(dirs.toSeq === Seq("event_date=2024-08-28", "event_date=2024-08-29"))
    graft.sources.Layout.compactPartition(
      spark, out, "2024-08-28", seriesCol = "timeseries_id", tsCol = "timestamp")
    assert(snapshot() === afterUpdate, "compaction after upserts must preserve contents")
  }

  test("upsertDeltaSink: O(batch) delta landing, later-batch-wins fold == direct tier, crash-mid-delete refold is safe") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_updelta").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_updelta_ckpt").toString
    val mem = MemoryStream[Tele]
    // compactEvery=2: batch 0 pending, batch 1 folds both, batch 2 pending
    val q = Streams
      .upsertDeltaSink(mem.toDF(), out, ckpt,
        Trigger.ProcessingTime("0 seconds"), compactEvery = 2)
      .start()
    def t(s: String, v: Double, id: String) = Tele("S", ts(s), v, None, id)
    val b1 = Seq(
      t("2024-08-28 12:00:00", 1.0, "id-a"),
      t("2024-08-28 12:01:00", 2.0, "id-a"),
      t("2024-08-29 09:00:00", 5.0, "id-b"))
    val b2 = Seq( // conflicting duplicate delivery: greatest tuple (9.0) wins
      t("2024-08-28 12:01:00", 9.0, "id-a"),
      t("2024-08-28 12:01:00", 7.0, "id-a"))
    val b3 = Seq( // later batch beats an earlier one even with a SMALLER value
      t("2024-08-28 12:01:00", 3.0, "id-a"),
      t("2024-08-30 10:00:00", 4.0, "id-c"))
    Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("timeseries_id", "timestamp", "value")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    val expected = Set(
      ("id-a", ts("2024-08-28 12:00:00"), 1.0),
      ("id-a", ts("2024-08-28 12:01:00"), 3.0),
      ("id-b", ts("2024-08-29 09:00:00"), 5.0),
      ("id-c", ts("2024-08-30 10:00:00"), 4.0))
    // merge-on-read resolves the pending b3 delta; the compacted table
    // (what a plain reader sees) still shows the pre-b3 fold
    assert(snap(Streams.upsertRead(spark, out)) === expected)
    assert(snap(spark.read.parquet(out)) === Set(
      ("id-a", ts("2024-08-28 12:00:00"), 1.0),
      ("id-a", ts("2024-08-28 12:01:00"), 9.0),
      ("id-b", ts("2024-08-29 09:00:00"), 5.0)))
    // the _delta dir is hidden from plain readers by the underscore prefix
    assert(new java.io.File(s"$out/_delta").list().count(_.startsWith("batch=")) === 1)
    // replay of the pending batch overwrites its own dir whole: no-op
    Streams.upsertDeltaBatch(b3.toDF(), out, batchId = 2, compactEvery = 99)
    assert(snap(Streams.upsertRead(spark, out)) === expected,
      "replaying a pending delta batch must be a no-op")
    // crash-mid-compaction window: winners already folded but delta dirs
    // not yet deleted — the re-fold (same winner set) is a key-replace
    // no-op, so compacting twice is safe
    Streams.compactUpsertDeltas(spark, out)
    assert(snap(spark.read.parquet(out)) === expected)
    Streams.upsertDeltaBatch(b3.toDF(), out, batchId = 2, compactEvery = 99)
    Streams.compactUpsertDeltas(spark, out) // the re-fold after a "crash"
    assert(snap(spark.read.parquet(out)) === expected,
      "re-folding an already-folded delta must be a no-op")
    assert(new java.io.File(s"$out/_delta").list() === null ||
      new java.io.File(s"$out/_delta").list().isEmpty)
    // the delta tier's final state is byte-identical to the DIRECT tier's
    // on the same batches (same dedup, same later-batch-wins order)
    val direct = java.nio.file.Files.createTempDirectory("graft_updelta_direct").toString
    Seq(b1, b2, b3).foreach(b => Streams.upsertBatch(b.toDF(), direct))
    assert(snap(spark.read.parquet(direct)) === expected)
    // day-partition layout survives for both tiers
    val dirs = new java.io.File(out).list().filter(_.startsWith("event_date=")).sorted
    assert(dirs.toSeq === Seq(
      "event_date=2024-08-28", "event_date=2024-08-29", "event_date=2024-08-30"))
  }

  test("upsertRead: both anti-join plans — date-pruned split and the all-touched single-scan fallback — resolve identically") {
    // The r17 date-pruned read has two branches (Streams.upsertRead): a
    // touched/untouched partition split when at least half the store's
    // partitions can skip the exchange, and the single-scan fallback when
    // the pending set touches most dates. The delta-sink test above
    // exercises the split (its pending delta leaves 08-29 untouched);
    // this one pins the FALLBACK and that both resolve like eager merges.
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_upread").toString
    def t(s: String, v: Double, id: String) = Tele("S", ts(s), v, None, id)
    val base = Seq(
      t("2024-08-28 10:00:00", 1.0, "id-a"),
      t("2024-08-29 10:00:00", 2.0, "id-a"),
      t("2024-08-30 10:00:00", 3.0, "id-b"),
      t("2024-08-31 10:00:00", 4.0, "id-b"))
    Streams.upsertDeltaBatch(base.toDF(), out, batchId = 0, compactEvery = 99)
    Streams.compactUpsertDeltas(spark, out)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("timeseries_id", "timestamp", "value")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    // pending delta touching EVERY store date -> untouched = 0 -> fallback
    val all = Seq(
      t("2024-08-28 10:00:00", 10.0, "id-a"),
      t("2024-08-29 10:00:00", 20.0, "id-a"),
      t("2024-08-30 10:00:00", 30.0, "id-b"),
      t("2024-08-31 10:00:00", 40.0, "id-b"))
    Streams.upsertDeltaBatch(all.toDF(), out, batchId = 1, compactEvery = 99)
    assert(snap(Streams.upsertRead(spark, out)) === Set(
      ("id-a", ts("2024-08-28 10:00:00"), 10.0),
      ("id-a", ts("2024-08-29 10:00:00"), 20.0),
      ("id-b", ts("2024-08-30 10:00:00"), 30.0),
      ("id-b", ts("2024-08-31 10:00:00"), 40.0)),
      "all-touched fallback must resolve every pending replacement")
    Streams.compactUpsertDeltas(spark, out)
    // pending delta touching ONE of four dates -> split path: three
    // untouched partitions pass through, the touched one anti-joins
    val one = Seq(t("2024-08-30 10:00:00", 99.0, "id-b"))
    Streams.upsertDeltaBatch(one.toDF(), out, batchId = 2, compactEvery = 99)
    assert(snap(Streams.upsertRead(spark, out)) === Set(
      ("id-a", ts("2024-08-28 10:00:00"), 10.0),
      ("id-a", ts("2024-08-29 10:00:00"), 20.0),
      ("id-b", ts("2024-08-30 10:00:00"), 99.0),
      ("id-b", ts("2024-08-31 10:00:00"), 40.0)),
      "date-pruned split must replace only the touched partition's row")
  }

  test("upsertRead: null-timestamp rows survive BOTH anti-join plans and both tiers (ADVICE r17)") {
    // A null timestamp yields a null event_date. Contract: (1) compaction
    // and the direct tier land such rows in the Hive default partition
    // instead of NPE-ing/losing them; (2) upsertRead's date-pruned split
    // routes null-date store rows to the anti-join branch, where SQL
    // null-join semantics keep them — identical to the single-scan
    // fallback; (3) null keys never REPLACE (null != null in joins), so a
    // pending null-ts row appends beside a stored one — consistent across
    // every read path.
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_upnull").toString
    def t(s: String, v: Double, id: String) =
      Tele("S", if (s == null) null else ts(s), v, None, id)
    val base = Seq(
      t("2024-08-28 10:00:00", 1.0, "id-a"),
      t("2024-08-29 10:00:00", 2.0, "id-a"),
      t("2024-08-30 10:00:00", 3.0, "id-b"),
      t("2024-08-31 10:00:00", 4.0, "id-b"),
      t(null, 5.0, "id-n"))
    Streams.upsertDeltaBatch(base.toDF(), out, batchId = 0, compactEvery = 99)
    Streams.compactUpsertDeltas(spark, out)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("timeseries_id", "timestamp", "value")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    // the compacted store itself must retain the null-ts row (Hive
    // default partition, read back as null)
    assert(snap(spark.read.parquet(out)).contains(("id-n", null, 5.0)),
      "compaction must not lose a null-ts row")
    assert(new java.io.File(out).list().contains("event_date=__HIVE_DEFAULT_PARTITION__"))
    val withBase = base.map(r => (r.timeseries_id, r.timestamp, r.value)).toSet
    // SPLIT path: pending touches 1 of 4 real dates + carries a null-ts
    // row -> 3 untouched partitions pass through, nulls ride the anti-join
    val pend = Seq(
      t("2024-08-30 10:00:00", 30.0, "id-b"),
      t(null, 50.0, "id-n"))
    Streams.upsertDeltaBatch(pend.toDF(), out, batchId = 1, compactEvery = 99)
    val expectSplit = withBase - (("id-b", ts("2024-08-30 10:00:00"), 3.0)) +
      (("id-b", ts("2024-08-30 10:00:00"), 30.0)) + (("id-n", null, 50.0))
    assert(snap(Streams.upsertRead(spark, out)) === expectSplit,
      "split plan must keep the stored null-ts row and append the pending one")
    // FALLBACK path: pending touches every real date -> single scan; the
    // resolution of the null-ts rows must be identical to the split's
    val pendAll = Seq(
      t("2024-08-28 10:00:00", 10.0, "id-a"),
      t("2024-08-29 10:00:00", 20.0, "id-a"),
      t("2024-08-31 10:00:00", 40.0, "id-b"))
    Streams.upsertDeltaBatch(pendAll.toDF(), out, batchId = 2, compactEvery = 99)
    val expectAll = Set(
      ("id-a", ts("2024-08-28 10:00:00"), 10.0),
      ("id-a", ts("2024-08-29 10:00:00"), 20.0),
      ("id-b", ts("2024-08-30 10:00:00"), 30.0),
      ("id-b", ts("2024-08-31 10:00:00"), 40.0),
      ("id-n", null: java.sql.Timestamp, 5.0),
      ("id-n", null: java.sql.Timestamp, 50.0))
    assert(snap(Streams.upsertRead(spark, out)) === expectAll,
      "single-scan fallback must agree with the split on null-ts rows")
    // fold everything: the compacted store equals the merge-on-read view,
    // and the DIRECT tier lands the same state from the same batches
    Streams.compactUpsertDeltas(spark, out)
    assert(snap(spark.read.parquet(out)) === expectAll)
    val direct = java.nio.file.Files.createTempDirectory("graft_upnull_direct").toString
    Seq(base, pend, pendAll).foreach(b => Streams.upsertBatch(b.toDF(), direct))
    assert(snap(spark.read.parquet(direct)) === expectAll,
      "direct tier must land null-ts rows identically")
  }

  test("sketchMvSink: stream-maintained KLL MV equals the direct batch sketch; replay is a no-op; day range prunes") {
    implicit val sqlCtx = spark.sqlContext
    val mv = java.nio.file.Files.createTempDirectory("graft_kll_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kll_ckpt").toString
    val mem = MemoryStream[Tele]
    val q = Streams
      .sketchMvSink(mem.toDF(), mv, ckpt, trigger = Trigger.ProcessingTime("0 seconds"))
      .start()
    def t(s: String, v: Double, id: String) = Tele("S", ts(s), v, None, id)
    // b1: series A day 1 (five values), series B day 1
    val b1 = (1 to 5).map(i => t(s"2024-08-28 12:0$i:00", i.toDouble, "id-a")) :+
      t("2024-08-28 13:00:00", 10.0, "id-b")
    mem.addData(b1)
    q.processAllAvailable()
    // b2: MORE of series A day 1 (a second partial for the same (series,
    // day)) plus series A day 2
    val b2 = (6 to 10).map(i => t(s"2024-08-28 14:0${i - 6}:00", i.toDouble, "id-a")) ++
      Seq(t("2024-08-29 09:00:00", 100.0, "id-a"), t("2024-08-29 09:01:00", 102.0, "id-a"))
    mem.addData(b2)
    q.processAllAvailable()
    q.stop()
    def snapshot() = Streams
      .mvQuantiles(spark, mv, "2024-08-28", "2024-08-29")
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("p50")))
      .toMap
    val got = snapshot()
    // stream-MV == direct batch sketch over the same rows (exact regime:
    // 12 values per series << k, so quantiles are exact order statistics)
    val direct = (b1 ++ b2).toDF()
      .groupBy("timeseries_id")
      .agg(kll_sketch_agg_double(col("value"), 16384).as("s"))
      .select(
        col("timeseries_id"),
        kll_sketch_get_n_double(col("s")).as("n"),
        kll_sketch_get_quantile_double(col("s"), lit(0.5)).as("p50"))
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("p50")))
      .toMap
    assert(got === direct, "stream-maintained MV must equal the direct sketch")
    // replay idempotence: re-running batch 1's merge must change nothing
    // (the partial REPLACES its own directory, never double-merges)
    Streams.sketchMvBatch(b1.toDF(), mv, batchId = 0)
    assert(snapshot() === got, "replaying a batch must not double-weight the sketch")
    // day-range read: day 2 only sees series A's two day-2 values
    val day2 = Streams.mvQuantiles(spark, mv, "2024-08-29", "2024-08-29")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(day2 === Map("id-a" -> 2L), s"day-range filter leaked: $day2")
  }

  test("ingestFiles: JSON-lines dir lands as day-partitioned parquet, exactly once") {
    val in = java.nio.file.Files.createTempDirectory("graft_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val json = rows.map(t =>
      s"""{"sensor_name":"${t.sensor_name}","timestamp":"${t.timestamp}","value":${t.value},"timeseries_id":"${t.timeseries_id}"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "batch1.json"),
      json.mkString("\n").getBytes)
    val q = Streams
      .ingestFiles(spark, in, out, ckpt, Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // restart on same checkpoint: no new files -> no duplicate rows
    val q2 = Streams
      .ingestFiles(spark, in, out, ckpt, Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val back = spark.read.parquet(out)
    assert(back.count() === rows.length)
    assert(back.columns.contains("event_date"))
    assert(back.filter(col("event_date") === "2024-08-28").count() === rows.length)
  }

  test("end-to-end pipeline: ingestFiles → faultRuns + upsertSink + countMvSink/mvMixDrift + cmMvSink, two micro-batches, replay is a no-op") {
    // The full reference loop (R1 ingest + R5 fault scan + R6 periodic job +
    // R3 point update, main.rs:234-240,384-406) as ONE continuously running
    // composition: JSON files land via the file sink, a downstream stream
    // over the landed parquet feeds four sinks at once — the upsert store,
    // the daily-count MV, the Count-Min frequency MV, and the typed
    // fault-run detector — and a second file delivers both a
    // run-completing fault AND a late correction.
    import graft.streaming.Telemetry
    implicit val sqlCtx = spark.sqlContext
    def dir(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val in = dir("graft_e2e_in"); val landed = dir("graft_e2e_landed")
    val store = dir("graft_e2e_store"); val mv = dir("graft_e2e_mv")
    val iCkpt = dir("graft_e2e_ickpt"); val uCkpt = dir("graft_e2e_uckpt")
    val mCkpt = dir("graft_e2e_mckpt")
    val cmMv = dir("graft_e2e_cmmv"); val cCkpt = dir("graft_e2e_cckpt")

    def t(s: String, v: Double, id: String) = Tele("S", ts(s), v, None, id)
    // b1: id-a builds a 2-fault run on day 1; id-b has day-1 and day-2 rows
    val b1 = Seq(
      t("2024-08-28 12:00:00", 0.97, "id-a"),
      t("2024-08-28 12:01:00", 0.98, "id-a"),
      t("2024-08-28 11:00:00", 0.10, "id-a"),
      t("2024-08-28 09:00:00", 0.50, "id-b"),
      t("2024-08-29 10:00:00", 0.20, "id-b"))
    // b2: the third consecutive fault for id-a (state must carry across the
    // micro-batch AND the file-landing boundary), a late CORRECTION for
    // (id-b, day-1 09:00), and a fresh day-2 append
    val b2 = Seq(
      t("2024-08-28 12:02:00", 0.99, "id-a"),
      t("2024-08-28 09:00:00", 0.90, "id-b"),
      t("2024-08-29 10:01:00", 0.30, "id-b"))
    def writeJson(name: String, rows: Seq[Tele]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(in, name),
        rows.map(r =>
          s"""{"sensor_name":"${r.sensor_name}","timestamp":"${r.timestamp}","value":${r.value},"timeseries_id":"${r.timeseries_id}"}""")
          .mkString("\n").getBytes)

    // stage 1: R1/R9 ingest — JSON-lines → day-partitioned parquet
    val ingest = Streams
      .ingestFiles(spark, in, landed, iCkpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    // stage 2: one downstream stream over the landed parquet, three sinks.
    // The parquet file source follows the file sink's _spark_metadata log,
    // so downstream only ever sees files the ingest query committed.
    val landedStream = spark.readStream
      .schema(Streams.telemetrySchema.add("event_date", org.apache.spark.sql.types.DateType))
      .parquet(landed)
    val flagged = Streams.faultFlags(landedStream.drop("event_date"), threshold = 0.95)
    val upsertQ = Streams
      .upsertSink(flagged, store, uCkpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    val mvQ = Streams
      .countMvSink(flagged, mv, mCkpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    val cmQ = Streams
      .cmMvSink(flagged, cmMv, cCkpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    // 7-day watermark: the scenario spans two calendar days, so day-2 rows
    // in b1 must not make day-1's b2 fault arrive "late" and be dropped
    val alertsQ = Streams
      .faultRuns(
        landedStream.select("sensor_name", "timestamp", "value", "fc1_flag", "timeseries_id")
          .as[Telemetry],
        threshold = 0.95, minRun = 3, watermark = "7 days")
      .writeStream.format("memory").queryName("e2e_alerts").outputMode("append")
      .start()
    def drainAll(): Unit = {
      ingest.processAllAvailable()
      upsertQ.processAllAvailable(); mvQ.processAllAvailable()
      cmQ.processAllAvailable(); alertsQ.processAllAvailable()
    }

    writeJson("b1.json", b1); drainAll()
    assert(spark.table("e2e_alerts").count() === 0, "run of 2 must stay silent")
    assert(spark.read.parquet(store).count() === 5)
    // capture the MV's batch directories BEFORE b2 lands, so the replay
    // check below can verify its own precondition (b2 in ONE batch) instead
    // of silently assuming it (r10 advice)
    def batchDirs(d: String) = Option(new java.io.File(d).list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("batch_id=")).toSet
    def mvBatchDirs() = batchDirs(mv)
    val mvBatchesBeforeB2 = mvBatchDirs()
    val cmBatchesBeforeB2 = batchDirs(cmMv)
    writeJson("b2.json", b2); drainAll()
    Seq(ingest, upsertQ, mvQ, cmQ, alertsQ).foreach(_.stop())

    // landed: all 8 rows, day-partitioned
    val landedDf = spark.read.parquet(landed)
    assert(landedDf.count() === 8)
    assert(landedDf.filter(col("event_date") === "2024-08-29").count() === 2)
    // alerts: exactly one, fired by the b2 row using b1's carried state
    val alerts = spark.table("e2e_alerts").collect()
      .map(r => (r.getAs[String]("timeseries_id"), r.getAs[Int]("run_length")))
    assert(alerts.toSeq === Seq(("id-a", 3)), s"got ${alerts.toSeq}")
    // store: the correction REPLACED the stored row (7 rows, not 8), flags set
    def snapshot() = spark.read.parquet(store)
      .select(col("timeseries_id"), col("timestamp"), col("value"),
        col("fc1_flag").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    val afterB2 = snapshot()
    assert(afterB2 === Set(
      ("id-a", ts("2024-08-28 12:00:00"), 0.97, 1L),
      ("id-a", ts("2024-08-28 12:01:00"), 0.98, 1L),
      ("id-a", ts("2024-08-28 11:00:00"), 0.10, -1L),
      ("id-a", ts("2024-08-28 12:02:00"), 0.99, 1L),
      ("id-b", ts("2024-08-28 09:00:00"), 0.90, -1L), // correction won
      ("id-b", ts("2024-08-29 10:00:00"), 0.20, -1L),
      ("id-b", ts("2024-08-29 10:01:00"), 0.30, -1L)))
    // MV drift: day 28 is the old half (id-a 4, id-b 2), day 29 the new
    // (id-b 2) — exact integer shares over t_old=6, t_new=2
    def driftMap() = Streams.mvMixDrift(spark, mv).collect()
      .map(r => r.getAs[String]("timeseries_id") ->
        (r.getAs[Long]("n_old"), r.getAs[Long]("n_new"),
         r.getAs[Long]("drift_num"), r.getAs[Long]("drift_den")))
      .toMap
    val drift = driftMap()
    assert(drift === Map(
      "id-a" -> ((4L, 0L, 8L, 24L)),
      "id-b" -> ((2L, 2L, 8L, 24L))), s"got $drift")
    // CM frequency MV: point estimates over the full landed range equal
    // the exact per-series landed-row counts (collision-free regime), and
    // a never-seen key reads its untouched cell as 0
    def cmMap() = Streams
      .cmEstimate(spark, cmMv, Seq("id-a", "id-b", "id-ghost"),
        "2024-08-28", "2024-08-29")
      .collect()
      .map(r => r.getAs[String]("timeseries_id") -> r.getAs[Long]("est"))
      .toMap
    val cmEst = cmMap()
    assert(cmEst === Map("id-a" -> 4L, "id-b" -> 4L, "id-ghost" -> 0L),
      s"got $cmEst")

    // replay: at-least-once redelivery of b2 through BOTH batch kernels
    // must leave every read model unchanged
    val b2Flagged = Streams.faultFlags(b2.toDF(), threshold = 0.95)
    Streams.upsertBatch(b2Flagged, store)
    assert(snapshot() === afterB2, "upsert replay must be a no-op")
    // precondition, not assumption (r10 advice): replaying ALL of b2 into
    // one batch_id is only a no-op if the stream really landed b2 in that
    // one batch — if the file source ever splits the commit across
    // triggers (maxFilesPerTrigger, an extra non-empty micro-batch), fail
    // with the real diagnosis instead of a spurious double-count mismatch
    val newMvBatches = mvBatchDirs() -- mvBatchesBeforeB2
    assert(newMvBatches.size === 1,
      s"replay precondition: b2 landed across ${newMvBatches.size} MV batch " +
        s"directories ($newMvBatches) — the whole-b2 replay below requires one")
    val lastMvBatch = newMvBatches.head.stripPrefix("batch_id=").toLong
    Streams.countMvBatch(b2Flagged, mv, lastMvBatch)
    assert(driftMap() === drift, "count-MV replay must be a no-op")
    // same precondition + replay through the CM kernel: identical cells
    val newCmBatches = batchDirs(cmMv) -- cmBatchesBeforeB2
    assert(newCmBatches.size === 1,
      s"replay precondition: b2 landed across ${newCmBatches.size} CM batch " +
        s"directories ($newCmBatches) — the whole-b2 replay below requires one")
    Streams.cmMvBatch(
      b2Flagged, cmMv, newCmBatches.head.stripPrefix("batch_id=").toLong)
    assert(cmMap() === cmEst, "CM-MV replay must be a no-op")

    // stage 3: the sensor-death detector joins the loop (the one streaming
    // kernel the e2e composition had not exercised). The ingest restarts on
    // its checkpoint (exactly-once resume), silentSeries reads the SAME
    // landed parquet: id-a stops reporting after b2 (last row 12:02), id-b
    // keeps reporting on day 3 — the watermark advancing past id-a's
    // last-seen + 60 min horizon must fire EXACTLY one alert, for id-a.
    val silentQ = Streams.silentSeries(
      landedStream
        .select("sensor_name", "timestamp", "value", "fc1_flag", "timeseries_id")
        .as[Telemetry],
      horizonMinutes = 60, watermark = "0 seconds")
      .writeStream.format("memory").queryName("e2e_silent").outputMode("append")
      .start()
    silentQ.processAllAvailable() // initial load: b1+b2, watermark arms
    val ingest2 = Streams
      .ingestFiles(spark, in, landed, iCkpt, Trigger.ProcessingTime("0 seconds"))
      .start()
    def t3(s: String, id: String) = Tele("S", ts(s), 0.10, None, id)
    writeJson("b3.json", Seq(t3("2024-08-30 10:00:00", "id-b")))
    ingest2.processAllAvailable(); silentQ.processAllAvailable()
    writeJson("b4.json", Seq(t3("2024-08-30 10:01:00", "id-b")))
    ingest2.processAllAvailable(); silentQ.processAllAvailable()
    ingest2.stop(); silentQ.stop()
    val silent = spark.table("e2e_silent").collect()
      .map(r => (r.getAs[String]("timeseries_id"),
        r.getAs[java.sql.Timestamp]("last_seen"), r.getAs[Long]("silent_for_ms")))
    assert(silent.map(x => (x._1, x._2)).toSeq ===
      Seq(("id-a", ts("2024-08-28 12:02:00"))),
      s"exactly one sensor-death alert for id-a expected, got ${silent.toSeq}")
    assert(silent.head._3 >= 60L * 60000L,
      "watermark-measured silence must be >= the horizon")
  }
}
