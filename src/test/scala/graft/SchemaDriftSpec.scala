package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-8 post-mortem regression suite: the driver regenerated the testdata
  * with `events.ts` as native timestamp[us] where rounds 1-7 shipped int64
  * TIMESTAMP(NANOS), and the encoding-pinned reader failed 63 queries at
  * analysis. This pins the fix: `U.events`/`U.tsRangeUs`/`U.tsUsCol` must
  * yield IDENTICAL results over the same instants in EITHER physical
  * encoding, and `U.probeTables` must name drifted columns loudly.
  *
  * (The nanos fixture stores a plain int64 column: Spark reads parquet
  * TIMESTAMP(NANOS) as LongType under `nanosAsLong=true`, so the observed
  * dtype — all the reader branches on — is identical.)
  */
class SchemaDriftSpec extends SparkSpec {

  private def fixtures(): (String, String) = {
    import spark.implicits._
    val base = new java.io.File("target/schema-drift-fixture").getAbsolutePath
    // Three rows spanning a day boundary; micros chosen non-round so the
    // nanos->micros floor path is exercised with sub-ms precision.
    val us = Seq(1704412800123456L, 1704499199999999L, 1704585600000001L)
    val rows = us.zipWithIndex.map { case (u, i) =>
      (i.toLong, u, 7L, s"e$i", i * 1.5, s"""{"k":$i}""")
    }
    val nanosDir = s"$base/nanos"
    rows.map { case (id, u, uid, et, v, p) => (id, u * 1000L, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    val microsDir = s"$base/micros"
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")
    (nanosDir, microsDir)
  }

  test("U.events yields identical TimestampType rows in either physical encoding") {
    val (nanosDir, microsDir) = fixtures()
    val a = U.events(spark, nanosDir)
    val b = U.events(spark, microsDir)
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val ra = a.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    val rb = b.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    assert(ra === rb)
  }

  test("U.tsRangeUs / U.tsUsCol agree across encodings, inclusive bounds") {
    val (nanosDir, microsDir) = fixtures()
    // Bounds chosen to include exactly the middle row (endUs inclusive at
    // the row's own micros value) in both encodings.
    val startUs = 1704412800123457L
    val endUs = 1704499199999999L
    def run(dir: String): Seq[Long] = {
      val raw = U.eventsRaw(spark, dir)
      raw.filter(U.tsRangeUs(raw, startUs, endUs))
        .select(U.tsUsCol(raw).as("us")).orderBy("us")
        .collect().map(_.getLong(0)).toSeq
    }
    assert(run(nanosDir) === Seq(1704499199999999L))
    assert(run(nanosDir) === run(microsDir))
  }

  test("tsUsCol is exact on nanos values that misround under double division") {
    // Regression (r9 advice, high): `(ts / 1000L).cast("long")` is DOUBLE
    // division in Spark; 2024-epoch nanos (~1.7e18) exceed double's 53-bit
    // exact range (ulp = 256 at this magnitude), so ~12% of values truncate
    // 1 µs low. Only integral `ts DIV 1000` is exact. 2000 consecutive
    // micros values guarantee many misrounding nanos representatives — the
    // single round-tripping fixture value above masked the bug.
    import spark.implicits._
    val base = new java.io.File("target/schema-drift-divfix").getAbsolutePath
    val us = (0L until 2000L).map(1704412800123456L + _)
    us.zipWithIndex
      .map { case (u, i) => (i.toLong, u * 1000L, 7L, "e", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val raw = U.eventsRaw(spark, base)
    assert(raw.schema("ts").dataType === LongType)
    val got = raw.select(U.tsUsCol(raw).as("us"))
      .orderBy("us").collect().map(_.getLong(0)).toSeq
    assert(got === us)
  }

  test("q_select_by_id_range is encoding-agnostic end-to-end") {
    val (nanosDir, microsDir) = fixtures()
    val fn = SparkEntry.queries("q_select_by_id_range")
    // Fixture instants are outside the query's fixed Jan-2024 window start,
    // so assert on schema + execution success across encodings plus equal
    // results (both empty or both matching).
    val a = fn(spark, nanosDir).collect().toSeq
    val b = fn(spark, microsDir).collect().toSeq
    assert(a === b)
  }

  test("probeTables passes on the real testdata and names a drifted column") {
    U.probeTables(spark, sfDir) // must not throw on current driver data

    import spark.implicits._
    val bad = new java.io.File("target/schema-drift-bad").getAbsolutePath
    Seq(("x", 1)).toDF("event_id", "nonsense")
      .write.mode("overwrite").parquet(s"$bad/events.parquet")
    Seq(
      "region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      val src = s"$sfDir/$t.parquet"
      spark.read.parquet(src).write.mode("overwrite").parquet(s"$bad/$t.parquet")
    }
    val e = intercept[IllegalStateException](U.probeTables(spark, bad))
    assert(e.getMessage.contains("events.event_id"), e.getMessage)
    assert(e.getMessage.contains("events.ts"), e.getMessage)
  }
}
