package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE SparkEntry query by key and print its rows (or its
  * formatted plan with --explain) — the fast inner loop for checking a new
  * operator against the DuckDB oracle before the driver's full Verify pass.
  *
  *   sbt "runMain graft.RunOne q_ts_drift /root/testdata/sf0.01"
  *   sbt "runMain graft.RunOne q_ts_drift /root/testdata/sf0.01 --explain"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = args(1)
    val explain = args.contains("--explain")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(key)(spark, sfDir)
    if (explain) df.explain("formatted")
    else {
      val rows = df.collect()
      println(s"== $key: ${rows.length} rows ==")
      rows.take(50).foreach(println)
      if (rows.length > 50) println(s"... (${rows.length - 50} more)")
    }
    spark.stop()
  }
}
