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
    // SPARK_GRAFT_QTIME_PASSES (default 2): big-SF probes whose shuffle
    // spill approaches the disk budget run 1 timed pass. The GC between
    // passes releases the previous pass's ShuffleDependencies so the
    // ContextCleaner deletes their spill files — without it, 3 passes of a
    // ~30 GB-spill query accumulate until the disk fills (observed:
    // q_sim_knn_graph at sf100).
    val passes = math.max(
      1, sys.env.getOrElse("SPARK_GRAFT_QTIME_PASSES", "2").trim.toInt)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      val r0 = fn(spark, sfDir).count() // warm
      val ts = (1 to passes).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $n rows=$r0 min=${ts.min}%.3f s (passes: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
