package graft.ops

import graft.{Q, U}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — the 100 TB replacement for the indexes the
  * reference does not have (its only access path is the deserialize-
  * everything scan loop, `rusty_timeseries/src/main.rs:126-137`). At
  * warehouse scale the access-path question is not "which index" but
  * "which FILES can the scan skip": parquet footers carry per-file
  * min/max stats, so the write-time ORDER of the data decides how many
  * files a two-dimensional predicate has to open. A single-column sort
  * prunes on that column only; a Z-order (Morton) interleave keeps BOTH
  * dimensions' value ranges tight per file, so a conjunctive predicate
  * skips ~all but the files whose 2-D tile it touches (the technique
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * `q_layout_zorder` measures exactly that trade, deterministically: it
  * quantizes (l_partkey, ship-day) to 16 bits each, interleaves them into
  * a 32-bit Morton code, and assigns each row to one of 256 z-range
  * buckets — the files a `repartitionByRange(z)` writer would emit — and,
  * beside it, to one of 256 single-column ship-day-range buckets (the
  * files a date-sorted writer would emit). Per (layout, bucket) it emits
  * the parquet-footer stats (min/max of each quantized dim, row count)
  * and the skipping decision `scan_needed` for a fixed probe predicate
  * (the middle 1/8 of each dimension). The z layout must open ~4 of its
  * 256 files; the date-sorted layout ~32 — the measured z-against-linear
  * win every bit of this math exists for. All arithmetic is integer
  * (trunc-div on a non-negative domain, bit shifts), so DuckDB reproduces
  * it bit-for-bit.
  *
  * The WRITE-side twin is `sources/Layout.writeTelemetryZOrdered` (same
  * [[zValue]] interleave, `repartitionByRange(z)`), whose pruning
  * LayoutSpec proves on real parquet files; this key is the layout
  * planner's view — the per-file stats table itself, oracle-checkable.
  */
object LayoutOps {

  /** Morton/Z-order interleave of two 16-bit quantized coordinates into a
    * 32-bit code: bit 2i of the result is bit i of `xq`, bit 2i+1 is bit i
    * of `yq`. Pure shift/and/or column expression — stays inside
    * whole-stage codegen, no UDF.
    */
  def zValue(xq: Column, yq: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xq, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yq, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The probe predicate both layouts are graded against: the middle 1/8
    * of each quantized dimension ([3.5/8, 4.5/8) of the 16-bit domain).
    */
  val ProbeLo = 28672L
  val ProbeHi = 36863L

  /** Core of `q_layout_zorder` on a prepared two-integer-column frame —
    * factored out so the spec can drive crafted coordinates through it.
    * Output grain: (layout, bucket_id) with footer stats and the skipping
    * decision. Scale shape: a column-pruned min/max pass fixes the
    * quantization bounds (1-row broadcast — grouping cannot start before
    * the domain is known), then ONE bucketing scan computes xq/yq/z and
    * fans each row into its two layouts via a stateless `stack` (rows × 2
    * map-side, collapsed by the partial agg to ≤ 512 rows per task before
    * the only exchange). Nothing wider than two longs ever shuffles.
    */
  def zorderStats(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val base = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
    val bounds = base.agg(
      min(col("x")).as("min_x_g"), max(col("x")).as("max_x_g"),
      min(col("y")).as("min_y_g"), max(col("y")).as("max_y_g"))
    base.crossJoin(broadcast(bounds))
      .select(
        expr("(x - min_x_g) * 65535 div greatest(1, max_x_g - min_x_g)").as("xq"),
        expr("(y - min_y_g) * 65535 div greatest(1, max_y_g - min_y_g)").as("yq"))
      .withColumn("z", zValue(col("xq"), col("yq")))
      .selectExpr(
        // 256 buckets per layout: z's top 8 bits = a 16×16 (y,x)-octant
        // grid; the single-column layout keys on yq's top 8 bits alone
        "stack(2, 'zorder', shiftright(z, 24), 'linear', shiftright(yq, 8)) AS (layout, bucket_id)",
        "xq", "yq")
      .groupBy(col("layout"), col("bucket_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("xq")).as("min_x"), max(col("xq")).as("max_x"),
        min(col("yq")).as("min_y"), max(col("yq")).as("max_y"))
      .withColumn(
        "scan_needed",
        col("max_x") >= ProbeLo && col("min_x") <= ProbeHi &&
          col("max_y") >= ProbeLo && col("min_y") <= ProbeHi)
      .orderBy("layout", "bucket_id")
  }

  // the 32-term Morton interleave, spelled once for the DuckDB oracle
  private val zSql: String = (0 until 16)
    .map(i => s"(((xq >> $i) & 1) << ${2 * i}) | (((yq >> $i) & 1) << ${2 * i + 1})")
    .mkString(" | ")

  val qs: Seq[Q] = Seq(
    Q(
      "q_layout_zorder",
      s"""WITH src AS (SELECT CAST(l_partkey AS BIGINT) AS x,
         |    epoch_us(l_shipdate) // 86400000000 AS y FROM lineitem),
         |  b AS (SELECT min(x) AS min_x_g, max(x) AS max_x_g,
         |    min(y) AS min_y_g, max(y) AS max_y_g FROM src),
         |  q AS (SELECT
         |    (x - min_x_g) * 65535 // greatest(1, max_x_g - min_x_g) AS xq,
         |    (y - min_y_g) * 65535 // greatest(1, max_y_g - min_y_g) AS yq
         |    FROM src, b),
         |  zq AS (SELECT xq, yq, ($zSql) AS z FROM q),
         |  f AS (SELECT 'zorder' AS layout, z >> 24 AS bucket_id, xq, yq FROM zq
         |    UNION ALL SELECT 'linear', yq >> 8, xq, yq FROM zq)
         |SELECT layout, bucket_id, count(*) AS n_rows,
         |  min(xq) AS min_x, max(xq) AS max_x,
         |  min(yq) AS min_y, max(yq) AS max_y,
         |  (max(xq) >= 28672 AND min(xq) <= 36863
         |   AND max(yq) >= 28672 AND min(yq) <= 36863) AS scan_needed
         |FROM f GROUP BY 1, 2 ORDER BY layout, bucket_id""".stripMargin) { (s, d) =>
      zorderStats(
        U.lineitem(s, d),
        col("l_partkey"),
        expr("unix_micros(l_shipdate) div 86400000000"))
    }
  )
}
