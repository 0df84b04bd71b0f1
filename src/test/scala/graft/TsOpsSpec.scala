package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand-computed semantics for the trickiest TS operators (the DuckDB oracle
  * proves cross-engine agreement; these prove the intended meaning on frames
  * where the right answer is visible by inspection).
  */
class TsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("EWMA equals a driver-side fold over the same rows in the same order") {
    val got = SparkEntry.queries("q_ts_ewma")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("n"), r.getAs[Double]("ewma"))))
      .toMap
    val rows = U.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = rows.groupBy(_._1).map { case (uid, rs) =>
      var e = Double.NaN
      rs.sortBy(r => (r._2, r._3)).zipWithIndex.foreach { case (r, i) =>
        e = if (i == 0) r._4 else 0.25 * r._4 + 0.75 * e
      }
      uid -> ((rs.length.toLong, math.floor(e * 1e6 + 0.5) / 1e6))
    }
    assert(got === want)
  }

  test("Holt level/trend equal a driver-side two-variable fold in the same order") {
    val got = SparkEntry.queries("q_ts_holt")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("level"), r.getAs[Double]("trend"))))
      .toMap
    val rows = U.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = rows.groupBy(_._1).map { case (uid, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      var l = sorted.head._4
      var b = 0.0
      sorted.tail.foreach { r =>
        val ln = 0.5 * r._4 + 0.5 * (l + b)
        b = 0.25 * (ln - l) + 0.75 * b
        l = ln
      }
      uid -> ((rs.length.toLong,
        math.floor(l * 1e6 + 0.5) / 1e6,
        math.floor(b * 1e6 + 0.5) / 1e6))
    }
    assert(got === want)
  }

  test("Holt-Winters level/trend/seasonals equal a driver-side fold in the same order") {
    val got = SparkEntry.queries("q_ts_holtwinters")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("level"), r.getAs[Double]("trend"),
          (0 until 6).map(i => r.getAs[Double](s"s$i")).toList)))
      .toMap
    val rows = U.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = rows.groupBy(_._1).map { case (uid, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      var l = sorted.head._4
      var b = 0.0
      val sArr = new Array[Double](6)
      sorted.tail.zipWithIndex.foreach { case (r, i) =>
        val idx = (i + 1) % 6
        val sOld = sArr(idx)
        val ln = 0.5 * (r._4 - sOld) + 0.5 * (l + b)
        val bn = 0.25 * (ln - l) + 0.75 * b
        sArr(idx) = 0.25 * (r._4 - ln) + 0.75 * sOld
        l = ln; b = bn
      }
      uid -> ((rs.length.toLong, r6(l), r6(b), sArr.map(r6).toList))
    }
    assert(got === want)
  }

  test("LTTB selections equal an exact driver-side replay; first/last/bucket structure holds") {
    val m = 12
    val got = SparkEntry.queries("q_ts_downsample_lttb")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sel_rank")) ->
        ((r.getAs[Long]("ts_us"), r.getAs[Double]("value"))))
      .toMap
    val rows = U.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want: Map[(Long, Long), (Long, Double)] = rows.groupBy(_._1).toSeq.flatMap { case (uid, rs) =>
      val pts = rs.sortBy(r => (r._2, r._3)).map(r => (r._2, r._4))
      if (pts.length <= m)
        pts.zipWithIndex.toSeq.map { case (p, i) => (uid, i.toLong) -> ((p._1, p._2)) }
      else {
        val buckets = m - 2
        val ni = pts.length - 2L
        val interior = pts.slice(1, pts.length - 1)
        val lastPt = pts.last
        val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Double)]
        out((uid, 0L)) = pts.head
        var prev = pts.head
        for (k <- 0 until buckets) {
          val s0 = (k.toLong * ni / buckets).toInt
          val e0 = ((k + 1).toLong * ni / buckets).toInt
          val cur = interior.slice(s0, e0)
          val nxt =
            if (k < buckets - 1)
              interior.slice(e0, (((k + 2).toLong * ni) / buckets).toInt)
            else Array(lastPt)
          // identical IEEE sequence to the engine: left-to-right sums,
          // same cross-product form, strict > keeps the earliest
          var sx = 0.0; var sy = 0.0
          nxt.foreach { p => sx += p._1.toDouble; sy += p._2 }
          val ax = sx / nxt.length; val ay = sy / nxt.length
          var best = cur(0); var bestArea = -1.0
          cur.foreach { p =>
            val area = math.abs(
              (prev._1.toDouble - ax) * (p._2 - prev._2) -
                (prev._1.toDouble - p._1.toDouble) * (ay - prev._2))
            if (area > bestArea) { bestArea = area; best = p }
          }
          out((uid, k + 1L)) = best
          prev = best
        }
        out((uid, (m - 1).toLong)) = lastPt
        out.toSeq
      }
    }.toMap
    assert(got === want, "distributed LTTB diverged from the exact replay")
    // structure: every full-length series emits exactly m ranks 0..m-1
    got.keys.groupBy(_._1).foreach { case (uid, ks) =>
      val n = rows.count(_._1 == uid)
      val expect = math.min(n, m)
      assert(ks.size === expect, s"series $uid emitted ${ks.size} of $expect")
      assert(ks.map(_._2).toSeq.sorted === (0L until expect.toLong).toSeq)
    }
  }

  test("SAX: zero-variance series pins z=0 ('c' segments); a step series hits the a/d extremes") {
    // constant series: the var>0 guard must pin z=0 (NOT divide 0/0 —
    // Spark would null it while DuckDB errors casting NaN) -> all
    // segments sum to 0 -> symbol 'c'; n=3 occupies segs {0,2,5} -> "ccc".
    // step series 0,0,0,0,10,10,10,10: mean 5, std 5 exactly (decimal
    // sums), z = ∓1 -> beyond ±0.6745 -> "aaaadddd".
    val dir = java.nio.file.Files.createTempDirectory("graft_sax").toString
    val rows = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 5.0)) ++
      (1 to 8).map(i => (2L, (10 + i).toLong, if (i <= 4) 0.0 else 10.0))
    rows.map { case (u, i, v) => (i, i * 1000000000L, u, "t", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_ts_sax")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("sax")).toMap
    assert(got === Map(1L -> "ccc", 2L -> "aaaadddd"))
  }

  test("MAD rank-median: hand-checked odd, even, and single-row series") {
    // the rank-selected median (r11's replacement for the engines'
    // median() builtins) on frames where the middle rows are visible by
    // inspection: odd count takes the one middle row, even count averages
    // the two middle rows as sum/2, a single row is its own median.
    //   user 1 [1,2,100]: med 2; devs {1,0,98} -> mad 1; 98 > 3*1.4826 -> 1 outlier
    //   user 2 [1,2,3,4]: med (2+3)/2 = 2.5; devs {1.5,.5,.5,1.5} -> mad (0.5+1.5)/2 = 1
    //   user 3 [7]:       med 7; dev {0} -> mad 0; 0 > 0 is false -> 0 outliers
    val dir = java.nio.file.Files.createTempDirectory("graft_mad").toString
    val vals = Seq((1L, 1.0), (1L, 2.0), (1L, 100.0),
      (2L, 1.0), (2L, 2.0), (2L, 3.0), (2L, 4.0), (3L, 7.0))
    vals.zipWithIndex.map { case ((u, v), i) =>
      ((i + 1).toLong, (i + 1) * 1000000000L, u, "t", v, "{}")
    }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_ts_outlier_mad")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_outliers"),
          r.getAs[Long]("med_e6"), r.getAs[Long]("mad_e6"))))
      .toMap
    assert(got === Map(
      1L -> ((3L, 1L, 2000000L, 1000000L)),
      2L -> ((4L, 0L, 2500000L, 1000000L)),
      3L -> ((1L, 0L, 7000000L, 0L))))
  }

  test("gap-fill: dense spine, forward fill carries last value, leading gaps stay null") {
    // series 1: hours 0,3 present -> spine 0..3, hours 1-2 filled from hour 0
    val hourly = Seq(
      (1L, 0L, 10.0),
      (1L, 10800L, 40.0),
      (2L, 3600L, 7.0))
      .toDF("user_id", "bkt", "avg_v")
    val spine = hourly
      .groupBy($"user_id")
      .agg(min($"bkt").as("b0"), max($"bkt").as("b1"))
      .select($"user_id", explode(sequence($"b0", $"b1", lit(3600L))).as("bkt"))
    val filled = spine
      .join(hourly, Seq("user_id", "bkt"), "left")
      .withColumn(
        "filled",
        last($"avg_v", ignoreNulls = true).over(
          Window.partitionBy($"user_id").orderBy($"bkt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("user_id", "bkt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(filled.toSeq === Seq(
      (1L, 0L, 10.0), (1L, 3600L, 10.0), (1L, 7200L, 10.0), (1L, 10800L, 40.0),
      (2L, 3600L, 7.0)))
  }

  test("sessionization: gap strictly greater than threshold starts a new session") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L), // exactly 1800s gap -> SAME session
      (1L, ts("2024-01-01 11:00:01"), 3L), // 1801s gap -> NEW session
      (2L, ts("2024-01-01 10:00:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val out = rows
      .withColumn("gap", unix_timestamp($"ts") - lag(unix_timestamp($"ts"), 1).over(w))
      .withColumn("new_s", when($"gap".isNull || $"gap" > 1800, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"event_id", $"session_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L)
    assert(out(2L) === 1L, "boundary gap of exactly 1800s must NOT split")
    assert(out(3L) === 2L)
    assert(out(4L) === 1L)
  }

  test("as-of semantics: signup at the same timestamp as a purchase is visible to it") {
    val sameTs = ts("2024-01-01 10:00:00")
    val rows = Seq(
      (10L, 1L, sameTs, "signup"),
      (11L, 1L, sameTs, "purchase"),
      (12L, 1L, ts("2024-01-01 09:00:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val kindOrder = when($"event_type" === "signup", 0).otherwise(1)
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", kindOrder, $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = rows
      .withColumn("signup_event_id",
        last(when($"event_type" === "signup", $"event_id"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("signup_event_id")))
      .toMap
    assert(out(11L) === Some(10L), "equal-ts signup must be at-or-before the purchase")
    assert(out(12L) === None, "earlier purchase has no signup yet")
  }

  test("windowed Theil-Sen with cap >= series length equals the exact all-pairs form") {
    // The contract query (q_ts_theilsen, cap = TheilSenCap) is the windowed
    // estimator; this pins its machinery to the exact O(n^2) reference:
    // identical pair set (strict ts order, equal-ts pairs excluded) and
    // identical IEEE slope sequence, so the results are bit-equal.
    import graft.ops.TsOps
    val maxLen = U.events(spark, sfDir)
      .groupBy($"user_id").count()
      .agg(org.apache.spark.sql.functions.max($"count")).collect()(0).getLong(0)
    val capped = TsOps.theilsen(spark, sfDir, maxLen.toInt).collect().toSeq
    val exact = TsOps.theilsenExact(spark, sfDir).collect().toSeq
    assert(capped === exact)
  }

  test("windowed Theil-Sen (contract cap) pairs each point with at most cap successors") {
    import graft.ops.TsOps
    val out = TsOps.theilsen(spark, sfDir, TsOps.TheilSenCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = U.events(spark, sfDir)
      .groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (uid, nPairs) =>
      val n = counts(uid)
      val cap = TsOps.TheilSenCap.toLong
      // upper bound: each of the n points contributes at most cap pairs
      assert(nPairs <= n * cap, s"user $uid: $nPairs pairs for n=$n")
      assert(nPairs > 0, s"user $uid: no pairs")
    }
  }
}
