package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-query top-k RECALL witness for the three ANN retrieval paths
  * (r17, the top-k twin of [[AnnRecallProbe]]): `q_sim_ann_lsh` /
  * `q_sim_ann_ivf` / `q_sim_ann_ivfpq` had sf100 PRECISION evidence
  * (every returned cosine equals the exact recompute — the sf100 gate)
  * and planted recall only at fixture scale (DedupSimSpec). This probe
  * plants the query itself at full corpus occupancy: vec_id 0's
  * embedding is REPLACED by a jittered copy of a real corpus vector
  * (true cosine ~0.98 — the regime top-k retrieval is specified for),
  * and each registry ANN key — which queries vec_id 0 by contract —
  * must surface the planted source in its top-10 with its exact cosine.
  *
  * Pass = for every variant: the source id is in the returned top-10,
  * every returned cosine equals the exact driver-side recompute (the
  * same round-to-4 the operators emit), and the rank-1 cosine is >= the
  * planted pair's (a genuine-duplicate tie may outrank the source; a
  * WORSE rank-1 would mean the index missed the neighborhood).
  *
  * Run: runMain graft.AnnTopkProbe <sfDir> [outJson]
  */
object AnnTopkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("testdata_sf100")
    val out = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = U.embeddings(spark, sfDir)
    def vecOfRow(r: org.apache.spark.sql.Row, i: Int): Array[Double] =
      r.getSeq[Any](i).map {
        case f: Float  => f.toDouble
        case d: Double => d
      }.toArray
    // a deterministic mid-corpus source, away from vec_id 0: the first
    // id at or past the id-range midpoint (exists at every corpus scale)
    val maxId = base.agg(max(col("vec_id"))).collect()(0)
      .getAs[Number](0).longValue()
    val srcRow = base
      .filter(col("vec_id") >= maxId / 2)
      .orderBy(col("vec_id"))
      .select(col("vec_id").cast("long"), col("embedding"))
      .limit(1).collect()(0)
    val srcId = srcRow.getLong(0)
    val src = vecOfRow(srcRow, 1)
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / math.sqrt(nx * ny)
    }
    def round4(x: Double): Double = math.rint(x * 1e4) / 1e4
    val rnd = new scala.util.Random(23)
    val scale = 0.2 * math.sqrt(src.map(x => x * x).sum / src.length)
    val query = src.map(x => x + scale * rnd.nextGaussian())
    val plantedCos = round4(cos(src, query))
    require(plantedCos >= 0.95, s"fixture drift: planted cosine $plantedCos")

    // scratch corpus = the real corpus with vec_id 0's embedding replaced
    val scratch = java.nio.file.Files.createTempDirectory("graft_anntopk").toString
    val elemT = base.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val qLit = typedlit(query.toSeq)
      .cast(org.apache.spark.sql.types.ArrayType(elemT))
    base.withColumn(
        "embedding",
        when(col("vec_id") === 0, qLit).otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var allOk = true
    for (key <- Seq("q_sim_ann_lsh", "q_sim_ann_ivf", "q_sim_ann_ivfpq")) {
      val t0 = System.nanoTime()
      val rows = Registry.byName(key).fn(spark, scratch)
        .select(col("vec_id").cast("long"), col("cos_sim")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val wall = (System.nanoTime() - t0) / 1e9
      val ids = rows.map(_._1)
      val exact = base
        .filter(col("vec_id").isin(ids.map(Long.box).toIndexedSeq: _*))
        .select(col("vec_id").cast("long"), col("embedding")).collect()
        .map(r => r.getLong(0) -> vecOfRow(r, 1)).toMap
      val cosExact = rows.forall { case (id, c) => round4(cos(exact(id), query)) == c }
      val found = ids.contains(srcId)
      val rank1Ok = rows.nonEmpty && rows.map(_._2).max >= plantedCos - 1e-9
      val ok = found && cosExact && rank1Ok
      allOk &= ok
      results(key) =
        f"""{"ok":$ok,"source_found":$found,"returned":${rows.length},"cosines_exact":$cosExact,"rank1_cos":${if (rows.nonEmpty) rows.map(_._2).max else -1.0},"wall_sec":$wall%.1f}"""
      println(s"[anntopk] $key: found=$found exact=$cosExact " +
        s"rank1=${rows.map(_._2).maxOption.getOrElse(-1.0)} (${wall.round}s)")
    }
    val json =
      s"""{"metric":"planted-query top-k recall at full corpus occupancy","sf":"$sfDir","planted_cos":$plantedCos,"source_id":$srcId,""" +
        results.map { case (k, v) => s""""$k":$v""" }.mkString("", ",", "") +
        s""","ok":$allOk}"""
    println(json)
    println(if (allOk) "PASS: all three ANN paths retrieve the planted source"
      else "FAIL")
    out.foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p), (json + "\n").getBytes("UTF-8"))
    }
    scala.reflect.io.Path(new java.io.File(scratch)).deleteRecursively()
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
