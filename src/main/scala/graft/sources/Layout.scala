package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for telemetry at 100 TB (SURVEY.md §1.3): replaces the
  * reference's single flat file with full rewrite per insert
  * (`rusty_timeseries/src/main.rs:230,81-90`) with a partitioned, optionally
  * bucketed Parquet dataset that the reference's two access patterns prune:
  *
  *   - **time-range scans** (R2, `main.rs:119-139`) prune on the
  *     `event_date` partition directory — a 7-day query over 10 years of
  *     telemetry touches 7/3650 of the files before any row is read;
  *   - **per-series access** (R2's equality, R5's per-series fault scan)
  *     prunes with parquet row-group stats on the sorted-within-file series
  *     key, or hash-bucket files when written as a bucketed table.
  *
  * Appends are new files in the partition dir (no rewrite); compaction is a
  * per-partition rewrite, embarrassingly parallel across dates.
  */
object Layout {

  /** Day-partitioned parquet, rows within each file sorted by
    * (series, time) so min/max row-group stats make series predicates
    * selective. The standard time-series layout: time prunes directories,
    * series prunes row groups.
    */
  def writeTelemetry(
      df: DataFrame,
      outDir: String,
      tsCol: String = "ts",
      seriesCol: String = "user_id",
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .repartition(col("event_date"))
      .sortWithinPartitions(col("event_date"), col(seriesCol), col(tsCol))
      .write
      .mode(mode)
      .partitionBy("event_date")
      .parquet(outDir)

  /** Same layout as a bucketed table (hash buckets on the series key) for
    * shuffle-free series joins/aggregations; requires the session catalog
    * (bucketing metadata lives in the metastore, not the files).
    */
  def writeTelemetryBucketed(
      df: DataFrame,
      table: String,
      nBuckets: Int,
      tsCol: String = "ts",
      seriesCol: String = "user_id"): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .bucketBy(nBuckets, seriesCol)
      .sortBy(seriesCol, tsCol)
      .saveAsTable(table)

  /** R2 over the partitioned layout: the date bounds prune partition
    * directories (PartitionFilters), the series equality + exact time range
    * prune row groups (PushedFilters). */
  def rangeQuery(
      spark: SparkSession,
      dir: String,
      seriesKey: Long,
      startTs: String,
      endTs: String): DataFrame =
    spark.read
      .parquet(dir)
      .filter(
        col("event_date").between(to_date(lit(startTs)), to_date(lit(endTs))) &&
          col("user_id") === seriesKey &&
          col("ts").between(
            lit(startTs).cast("timestamp"), lit(endTs).cast("timestamp")))
}
