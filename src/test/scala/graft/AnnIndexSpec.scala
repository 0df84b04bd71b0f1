package graft

import org.apache.spark.sql.functions._

/** Persistent ANN index (r18; VERDICT r17 item 1): the stored parquet
  * artifacts must equal a retrain bit for bit (training is deterministic —
  * DedupSimSpec replays both k-means loops driver-side), and the stored
  * serving plans must return bit-identical rows to the pre-r18 in-session
  * plans they replaced. Also pins the pinned-root discipline: a stale
  * index under a user-pinned dir is an ERROR, never a silent rebuild.
  */
class AnnIndexSpec extends SparkSpec {

  private def annRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue(),
        r.getDouble(2)))
      .toSeq

  test("stored index artifacts equal a retrain bit-exact (codebook, pqbooks, assignments, codes)") {
    val dir = ops.SimOps.annIndexDir(spark, sfDir)
    // coarse codebook
    def cbSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cell").cast("long"), col("cv"), col("cnrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .toSet
    assert(cbSet(spark.read.parquet(s"$dir/codebook")) ===
      cbSet(ops.SimOps.trainCodebook(spark, sfDir, 16, 3)))
    // PQ codebooks
    def pqSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("sub").cast("long"), col("cell").cast("long"), col("cv"), col("cvv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2), r.getDouble(3)))
      .toSet
    assert(pqSet(spark.read.parquet(s"$dir/pqbooks")) ===
      pqSet(ops.SimOps.trainPqCodebooks(spark, sfDir)))
    // cell assignments + norms (the inverted lists' keys)
    val e = U.embeddings(spark, sfDir)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"),
        sqrt(graft.functions.VecDot.vecDot(col("embedding"), col("embedding")))
          .as("nrm"))
    val fresh = ops.SimOps
      .assignCells(e, ops.SimOps.trainCodebook(spark, sfDir, 16, 3))
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("nrm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val stored = spark.read.parquet(s"$dir/ivf")
      .select(col("vec_id").cast("long"), col("cell").cast("long"), col("nrm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stored === fresh)
    // stored vectors round-trip losslessly (same element values)
    val vecFresh = e.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    spark.read.parquet(s"$dir/ivf")
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .foreach(r => assert(r.getSeq[Any](1) === vecFresh(r.getLong(0))))
    // PQ codes: the stored 2-byte codes equal q_embed_pq's (vec_id >= 1 —
    // the fixture has no negative ids, so the sets coincide)
    val codesFresh = SparkEntry.queries("q_embed_pq")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Number](0).longValue() ->
        (1 to 4).map(i => r.getAs[Number](i).longValue()))
      .toMap
    val codesStored = spark.read.parquet(s"$dir/pq")
      .select(col("vec_id").cast("long"), col("c0"), col("c1"), col("c2"), col("c3"))
      .collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getAs[Number](i).longValue()))
      .toMap
    assert(codesStored === codesFresh)
  }

  test("stored serving is bit-identical to the in-session plans (LSH, IVF, IVF-PQ)") {
    assert(annRows(SparkEntry.queries("q_sim_ann_lsh")(spark, sfDir)) ===
      annRows(ops.SimOps.lshTopKInSession(spark, sfDir)))
    assert(annRows(SparkEntry.queries("q_sim_ann_ivf")(spark, sfDir)) ===
      annRows(ops.SimOps.ivfTopK(spark, sfDir, codebookIters = 3)))
    assert(annRows(SparkEntry.queries("q_sim_ann_ivfpq")(spark, sfDir)) ===
      annRows(ops.SimOps.ivfpqTopK(spark, sfDir)))
  }

  test("serving scans partition-prune to the probed cells / buckets") {
    // AQE hides finished stages inside QueryStageExec leaves (SparkSpec
    // note), so plan-shape assertions run with it off
    withPlanShapeConf() {
      def scans(df: org.apache.spark.sql.DataFrame) =
        executedPlan(df).collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
      val ivfScans = scans(SparkEntry.queries("q_sim_ann_ivf")(spark, sfDir))
      assert(ivfScans.exists(f =>
        f.metadata.get("PartitionFilters").exists(_.contains("cell"))),
        s"no cell partition filter in: ${ivfScans.map(_.metadata.get("PartitionFilters"))}")
      val lshScans = scans(SparkEntry.queries("q_sim_ann_lsh")(spark, sfDir))
      assert(lshScans.exists(f =>
        f.metadata.get("PartitionFilters").exists(_.contains("bucket"))),
        s"no bucket partition filter in: ${lshScans.map(_.metadata.get("PartitionFilters"))}")
    }
  }

  test("incremental append: frozen-codebook ingest grows the index in place, new vectors are servable") {
    // corpus A = query slot + two thirds of the fixture; B = the rest
    val work = java.nio.file.Files.createTempDirectory("graft_annappend").toString
    val corpus = s"$work/corpus"
    val all = U.embeddings(spark, sfDir)
    val isB = pmod(col("vec_id").cast("long"), lit(3)) === 2 && col("vec_id") =!= 0
    all.filter(!isB).write.parquet(s"$corpus/embeddings.parquet")
    val root = s"$work/annroot"
    val dir = s"$root/${U.dirToken(corpus)}"
    ops.SimOps.buildAnnIndex(spark, corpus, dir)
    val nA = spark.read.parquet(s"$dir/ivf").count()
    // the corpus grows: B rows + one planted near-dup of an existing
    // vector (the retrieval witness for the freshly ingested slice)
    val srcRow = all.filter(col("vec_id").cast("long") === 7)
      .select(col("embedding")).collect()(0)
    val src = srcRow.getSeq[Any](0).map {
      case f: Float => f.toDouble; case d: Double => d
    }.toArray
    val rnd = new scala.util.Random(31)
    val scale = 0.1 * math.sqrt(src.map(x => x * x).sum / src.length)
    val elemT = all.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val plantedId = 990000007L
    import spark.implicits._
    val plantedDf = Seq((plantedId, src.map(x =>
        (x + scale * rnd.nextGaussian()).toFloat.toDouble).toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .select(
        col("vec_id").cast(all.schema("vec_id").dataType).as("vec_id"),
        col("embedding").cast(org.apache.spark.sql.types.ArrayType(elemT))
          .as("embedding"),
        col("label").cast(all.schema("label").dataType).as("label"))
    val delta = all.filter(isB)
      .select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(plantedDf)
    delta.write.mode("append").parquet(s"$corpus/embeddings.parquet")
    ops.SimOps.appendToAnnIndex(spark, corpus, dir, delta)
    val nDelta = delta.count()
    assert(spark.read.parquet(s"$dir/ivf").count() === nA + nDelta)
    // appended assignments == frozen-codebook assignment of the delta
    val cbA = spark.read.parquet(s"$dir/codebook")
    val want = ops.SimOps.assignCells(
        delta.select(col("vec_id"), col("embedding"),
          sqrt(graft.functions.VecDot.vecDot(col("embedding"), col("embedding")))
            .as("nrm")),
        cbA)
      .select(col("vec_id").cast("long"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotB = spark.read.parquet(s"$dir/ivf")
      .filter(col("vec_id").cast("long").isin(
        want.map(w => Long.box(w._1)).toSeq: _*))
      .select(col("vec_id").cast("long"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotB === want)
    // the grown index serves the appended slice: querying BY the planted
    // id must retrieve its source at rank 1 with the exact cosine on all
    // three paths
    spark.conf.set(ops.SimOps.AnnIndexDirConf, root)
    try {
      for ((name, res) <- Seq(
        "lsh" -> ops.SimOps.lshTopKStored(spark, corpus, queryId = plantedId),
        "ivf" -> ops.SimOps.ivfTopKStored(spark, corpus, queryId = plantedId),
        "ivfpq" -> ops.SimOps.ivfpqTopKStored(spark, corpus, queryId = plantedId))) {
        val rows = res.select(col("vec_id").cast("long"), col("cos_sim"))
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(rows.headOption.map(_._1) === Some(7L),
          s"$name: planted source not at rank 1: ${rows.toSeq}")
        assert(rows.head._2 >= 0.99, s"$name: cosine ${rows.head._2}")
      }
    } finally spark.conf.unset(ops.SimOps.AnnIndexDirConf)
  }

  test("pinned root: a stale index is an error naming the rebuild path, never a silent rebuild") {
    val root = java.nio.file.Files.createTempDirectory("graft_annroot").toString
    val dir = s"$root/${U.dirToken(sfDir)}"
    ops.SimOps.buildAnnIndex(spark, sfDir, dir)
    // tamper: pretend the index was built over a different corpus size
    val metaPath = java.nio.file.Paths.get(dir, "_ANN_INDEX_META.properties")
    val props = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(metaPath)
    try props.load(in) finally in.close()
    props.setProperty("n_vectors", "1")
    val outS = java.nio.file.Files.newOutputStream(metaPath)
    try props.store(outS, "tampered") finally outS.close()
    // the build wrote through ChecksumFileSystem: drop the now-stale crc
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._ANN_INDEX_META.properties.crc"))
    spark.conf.set(ops.SimOps.AnnIndexDirConf, root)
    try {
      val ex = intercept[IllegalStateException] {
        ops.SimOps.annIndexDir(spark, sfDir)
      }
      assert(ex.getMessage.contains("stale ANN index"))
      assert(ex.getMessage.contains("buildAnnIndex"))
    } finally spark.conf.unset(ops.SimOps.AnnIndexDirConf)
    // a VALID pinned index serves without rebuilding: restore the true
    // count and check the serving output matches the scratch-index run
    val fixed = new java.util.Properties()
    val in2 = java.nio.file.Files.newInputStream(metaPath)
    try fixed.load(in2) finally in2.close()
    fixed.setProperty("n_vectors", U.embeddings(spark, sfDir).count().toString)
    val outS2 = java.nio.file.Files.newOutputStream(metaPath)
    try fixed.store(outS2, "restored") finally outS2.close()
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._ANN_INDEX_META.properties.crc"))
    spark.conf.set(ops.SimOps.AnnIndexDirConf, root)
    try {
      val builtMarker = java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, "_ANN_INDEX_READY"))
      assert(annRows(SparkEntry.queries("q_sim_ann_ivf")(spark, sfDir)) ===
        annRows(ops.SimOps.ivfTopK(spark, sfDir, codebookIters = 3)))
      assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, "_ANN_INDEX_READY")) === builtMarker,
        "serving from a valid pinned index must not rebuild it")
    } finally spark.conf.unset(ops.SimOps.AnnIndexDirConf)
  }
}
