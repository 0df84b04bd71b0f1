package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time (or explain) a subset of queries without the full
  * Bench sweep. Usage: runMain graft.QTime <sfDir> <name>[,<name>...]
  * [--explain]. Warm pass then 2 timed passes per query, min reported.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      val r0 = fn(spark, sfDir).count() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $n rows=$r0 min=${ts.min}%.3f s (passes: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
