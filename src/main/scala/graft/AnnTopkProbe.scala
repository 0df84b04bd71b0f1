package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-query top-k recall DISTRIBUTION for the three ANN retrieval
  * paths (r18; VERDICT r17 item 4 — the r17 probe planted a single query,
  * an existence proof, not a recall estimate). `nQueries` (default 100)
  * evenly-strided real corpus vectors are each copied with per-query
  * jitter (true cosine ~0.98 — the regime top-k retrieval is specified
  * for) into a scratch corpus at FULL real occupancy; the persistent ANN
  * index (r18, [[ops.SimOps.buildAnnIndex]]) is built ONCE over it —
  * timed separately as the offline build wall — and each serving path
  * (LSH / IVF / IVF-PQ, the exact registry plans, parameterized by query
  * id) retrieves top-10 for every planted query. Reported per path:
  *
  *   - recall@10 = fraction of planted queries whose SOURCE vector is in
  *     their top-10 (floor 0.8 per path — DedupSimSpec's planted-recall
  *     floor; the 8-plane hamming-1 LSH geometry's EXPECTED recall at
  *     cos ~0.98 is ~0.93 (p_bit = 1 - acos(0.98)/pi = 0.936;
  *     P[hamming<=1] = p^8 + 8p^7(1-p)), so a 0.9 floor would flake on
  *     binomial noise at n=100 while 0.8 is ~4 sigma below expectation);
  *   - cosines_exact = every returned cosine equals the exact driver-side
  *     recompute (round-to-4, the operators' own emission) — planted
  *     vectors are rounded through the STORAGE element type before truth
  *     computation (ADVICE r17: the operator only ever sees the float32
  *     copy);
  *   - query-time-only walls (total + mean per query), build excluded —
  *     the serving cost a deployment actually pays per query.
  *
  * Run: runMain graft.AnnTopkProbe <sfDir> [outJson] [nQueries]
  */
object AnnTopkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("testdata_sf100")
    val out = args.lift(1)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(100)
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
    val nBase = base.count()
    val maxId = base.agg(max(col("vec_id"))).collect()(0)
      .getAs[Number](0).longValue()
    require(nQueries > 0 && nBase > nQueries * 10, s"corpus too small: $nBase")

    def vecOfRow(r: org.apache.spark.sql.Row, i: Int): Array[Double] =
      r.getSeq[Any](i).map {
        case f: Float  => f.toDouble
        case d: Double => d
      }.toArray
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / math.sqrt(nx * ny)
    }
    def round4(x: Double): Double = math.rint(x * 1e4) / 1e4

    // evenly-strided sources (vec_id >= 1: 0 is the registry query slot).
    // Ids are SPARSE at scale (sf100 ids reach 5e11), so the residue
    // filter is sized for ~2x the needed matches and the first nQueries in
    // id order are taken — an exact-count stride would under-fill on an
    // unlucky residue distribution.
    val stride = math.max(1L, nBase / (2L * nQueries))
    val sources = base
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .filter(col("vec_id") >= 1 && pmod(col("vec_id"), lit(stride)) === 1)
      .orderBy(col("vec_id"))
      .limit(nQueries)
      .collect()
      .map(r => (r.getLong(0), vecOfRow(r, 1)))
    require(sources.length == nQueries, s"got ${sources.length} sources")

    // planted queries: per-source jitter scaled to the source's own norm,
    // rounded through the STORAGE element type (ADVICE r17)
    val elemT = base.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val storageRound: Double => Double =
      if (elemT == org.apache.spark.sql.types.FloatType) x => x.toFloat.toDouble
      else identity
    val rnd = new scala.util.Random(23)
    val planted = sources.zipWithIndex.map { case ((srcId, v), i) =>
      val scale = 0.2 * math.sqrt(v.map(x => x * x).sum / v.length)
      val q = v.map(x => storageRound(x + scale * rnd.nextGaussian()))
      (maxId + 1 + i, srcId, q, round4(cos(v, q)))
    }
    require(planted.count(_._4 >= 0.95) >= nQueries * 9 / 10,
      s"fixture drift: only ${planted.count(_._4 >= 0.95)}/$nQueries planted cosines >= 0.95")

    // scratch corpus at real occupancy + the planted queries as rows
    val scratch = java.nio.file.Files.createTempDirectory("graft_anntopk").toString
    import spark.implicits._
    val plantedDf = planted.toSeq
      .map { case (qid, _, q, _) => (qid, q.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .select(
        col("vec_id").cast(base.schema("vec_id").dataType).as("vec_id"),
        col("embedding").cast(
          org.apache.spark.sql.types.ArrayType(elemT)).as("embedding"),
        col("label").cast(base.schema("label").dataType).as("label"))
    base.select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(plantedDf)
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")

    // offline index build, timed separately from serving
    val tBuild0 = System.nanoTime()
    val indexDir = ops.SimOps.annIndexDir(spark, scratch)
    val buildWall = (System.nanoTime() - tBuild0) / 1e9
    println(f"[anntopk] index built at $indexDir in $buildWall%.1f s")

    // truth vectors for the exact-cosine check: planted (in memory) +
    // whatever ids the paths return (batched fetch below)
    val vecOf = scala.collection.mutable.Map.empty[Long, Array[Double]]
    planted.foreach { case (qid, _, q, _) => vecOf(qid) = q }
    sources.foreach { case (id, v) => vecOf(id) = v }

    val paths: Seq[(String, (Long) => org.apache.spark.sql.DataFrame)] = Seq(
      "q_sim_ann_lsh" -> ((qid: Long) =>
        ops.SimOps.lshTopKStored(spark, scratch, queryId = qid)),
      "q_sim_ann_ivf" -> ((qid: Long) =>
        ops.SimOps.ivfTopKStored(spark, scratch, queryId = qid)),
      "q_sim_ann_ivfpq" -> ((qid: Long) =>
        ops.SimOps.ivfpqTopKStored(spark, scratch, queryId = qid)))

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var allOk = true
    for ((key, fn) <- paths) {
      val t0 = System.nanoTime()
      val perQuery = planted.map { case (qid, srcId, _, pcos) =>
        val rows = fn(qid)
          .select(col("vec_id").cast("long"), col("cos_sim")).collect()
          .map(r => (r.getLong(0), r.getDouble(1)))
        (qid, srcId, pcos, rows)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // batched vector fetch for every id any query returned
      val missing = perQuery.flatMap(_._4.map(_._1)).distinct
        .filterNot(vecOf.contains)
      if (missing.nonEmpty)
        base.filter(col("vec_id").isin(missing.map(Long.box).toIndexedSeq: _*))
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect()
          .foreach(r => vecOf(r.getLong(0)) = vecOfRow(r, 1))
      val found = perQuery.count { case (_, srcId, _, rows) =>
        rows.exists(_._1 == srcId)
      }
      val badCos = perQuery.flatMap { case (qid, _, _, rows) =>
        rows.filter { case (id, c) => round4(cos(vecOf(id), vecOf(qid))) != c }
      }
      val recall = found.toDouble / nQueries
      val ok = recall >= 0.8 && badCos.isEmpty
      allOk &= ok
      results(key) =
        f"""{"ok":$ok,"recall_at_10":$recall%.4f,"found":$found,"n_queries":$nQueries,"cosines_exact":${badCos.isEmpty},"bad_cosines":${badCos.length},"serve_wall_sec":$wall%.1f,"mean_query_sec":${wall / nQueries}%.3f}"""
      println(f"[anntopk] $key: recall@10 $found/$nQueries = $recall%.4f, " +
        f"exact=${badCos.isEmpty}, serve $wall%.1f s (${wall / nQueries}%.3f s/query)")
    }
    val json =
      f"""{"metric":"planted-query top-k recall@10 distribution at full corpus occupancy","sf":"$sfDir","n_queries":$nQueries,"corpus_vectors":${nBase + nQueries},"mean_planted_cos":${planted.map(_._4).sum / nQueries}%.4f,"index_build_wall_sec":$buildWall%.1f,""" +
        results.map { case (k, v) => s""""$k":$v""" }.mkString("", ",", "") +
        s""","floor":0.8,"ok":$allOk}"""
    println(json)
    println(if (allOk) "PASS: recall@10 >= 0.8 on every ANN path, all cosines exact"
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
