package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-pair RECALL witness at full corpus occupancy (r17; VERDICT r16
  * item 5): DedupSimSpec pins embedding-LSH recall >= 90% on planted
  * cosine-~0.97 near-duplicates at fixture scale, and the sf10 gate
  * re-measures it at 200 k vectors — but the sf100 run (2 M vectors,
  * BENCH_sf100.json) verified only PRECISION (returned cosines equal the
  * exact recompute); the adaptive geometry's recall floor was extrapolated
  * one decade past its last measurement. This probe measures it in-place:
  *
  *   1. copy the real corpus (testdata_sf100/embeddings.parquet) plus
  *      `NPlant` planted near-duplicates — each a jittered copy of an
  *      evenly-strided real vector, noise scaled to the vector's own norm
  *      so the planted cosine lands ~0.98 regardless of the corpus's
  *      scaling — into a scratch corpus;
  *   2. run the production operator ([[ops.SimOps.embedLshPairs]] at 0.9,
  *      exactly the q_dedup_embed_lsh path) over the combined corpus, so
  *      the adaptive LSH geometry sees the REAL 2 M-vector occupancy;
  *   3. recall = planted (src, dup) pairs recovered / planted pairs whose
  *      true rounded cosine clears the 0.9 cut (same round-to-4 semantics
  *      as the operator, so a boundary cosine can't count against recall);
  *   4. planted-slice precision: every returned pair touching a planted id
  *      is recomputed exactly driver-side and must clear the cut — zero
  *      planted false positives.
  *
  * The full-corpus pair set is NOT collected (11 M+ genuine pairs at
  * sf100); only the planted slice is, bounded by NPlant x the sources'
  * own near-dup cluster sizes. Emits one JSON line; optional args(1)
  * writes it to a file.
  *
  * Run: runMain graft.AnnRecallProbe <sfDir> [outJson] [nPlant]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("testdata_sf100")
    val out = args.lift(1)
    val nPlant = args.lift(2).map(_.toInt).getOrElse(200)
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
    val maxId = base.agg(max(col("vec_id"))).collect()(0).getAs[Number](0).longValue()
    require(nPlant > 0 && nBase > nPlant * 10, s"corpus too small: $nBase")

    // evenly-strided source vectors, fetched once (bounded: nPlant rows)
    val stride = nBase / nPlant
    val sources = base
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .filter(pmod(col("vec_id"), lit(stride)) === 0)
      .limit(nPlant)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).map {
        case f: Float  => f.toDouble
        case d: Double => d
      }.toArray))
    require(sources.length == nPlant, s"got ${sources.length} sources")

    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / math.sqrt(nx * ny)
    }
    def round4(x: Double): Double = math.rint(x * 1e4) / 1e4

    // jitter scaled to the source's own norm: cos ~ 1/sqrt(1 + 0.04) ~ 0.98
    // for any corpus scaling (the fixture's absolute 0.2 assumed unit-ish
    // gaussian coordinates). Planted vectors are rounded through the
    // STORAGE element type (array<float> at every gate scale) before the
    // truth cosines are computed — the operator only ever sees the
    // float32 copy, and a raw-double truth within ~1e-7 of a round4
    // boundary could otherwise flip cosines_exact / the 0.9 membership
    // (ADVICE r17).
    val elemT = base.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val storageRound: Double => Double =
      if (elemT == org.apache.spark.sql.types.FloatType) x => x.toFloat.toDouble
      else identity
    val rnd = new scala.util.Random(17)
    val planted = sources.zipWithIndex.map { case ((srcId, v), i) =>
      val scale = 0.2 * math.sqrt(v.map(x => x * x).sum / v.length)
      val dup = v.map(x => storageRound(x + scale * rnd.nextGaussian()))
      (maxId + 1 + i, srcId, dup)
    }
    // truth set under the operator's own round-to-4-then-threshold cut
    val want = planted
      .map { case (dupId, srcId, dup) =>
        val src = sources.find(_._1 == srcId).get._2
        (srcId, dupId, round4(cos(src, dup)))
      }
      .filter(_._3 >= 0.9)
    require(want.size >= nPlant * 9 / 10,
      s"fixture drift: only ${want.size}/$nPlant planted pairs clear 0.9")

    // combined scratch corpus, planted rows cast to the base schema
    val scratch = java.nio.file.Files.createTempDirectory("graft_annrecall").toString
    import spark.implicits._
    val plantedDf = planted.toSeq
      .map { case (dupId, _, dup) => (dupId, dup.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .select(
        col("vec_id").cast(base.schema("vec_id").dataType).as("vec_id"),
        col("embedding").cast(
          org.apache.spark.sql.types.ArrayType(elemT)).as("embedding"),
        col("label").cast(base.schema("label").dataType).as("label"))
    base.select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(plantedDf)
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")

    // the production operator over the combined corpus at real occupancy;
    // only the planted slice is collected
    val plantBase = maxId + 1
    val t0 = System.nanoTime()
    val slice = ops.SimOps.embedLshPairs(spark, scratch, 0.9)
      .filter(col("a") >= plantBase || col("b") >= plantBase)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("cos_sim")))
    val wallSec = (System.nanoTime() - t0) / 1e9

    // planted-slice precision: recompute every returned pair exactly.
    // Vectors needed: the planted ones (in memory) + their counterparts.
    val vecOf = scala.collection.mutable.Map.empty[Long, Array[Double]]
    planted.foreach { case (dupId, _, dup) => vecOf(dupId) = dup }
    sources.foreach { case (id, v) => vecOf(id) = v }
    val missing = slice.flatMap(p => Seq(p._1, p._2)).distinct
      .filterNot(vecOf.contains)
    if (missing.nonEmpty) {
      val fetched = base
        .filter(col("vec_id").isin(missing.map(Long.box).toIndexedSeq: _*))
        .select(col("vec_id").cast("long"), col("embedding"))
        .collect()
      fetched.foreach { r =>
        vecOf(r.getLong(0)) = r.getSeq[Any](1).map {
          case f: Float  => f.toDouble
          case d: Double => d
        }.toArray
      }
    }
    val falsePos = slice.filter { case (a, b, _) =>
      round4(cos(vecOf(a), vecOf(b))) < 0.9
    }
    val cosineExact = slice.forall { case (a, b, c) =>
      round4(cos(vecOf(a), vecOf(b))) == c
    }
    val got = slice.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val recovered = want.count { case (s0, d0, _) =>
      got.contains((math.min(s0, d0), math.max(s0, d0)))
    }
    val recall = recovered.toDouble / want.size

    val ok = falsePos.isEmpty && cosineExact && recall >= 0.9
    val json =
      f"""{"metric":"embedding-LSH planted recall at full corpus occupancy","sf":"$sfDir","corpus_vectors":${nBase + nPlant},"planted_pairs":${want.size},"recovered":$recovered,"recall":$recall%.4f,"planted_false_positives":${falsePos.length},"returned_cosines_exact":$cosineExact,"planted_slice_pairs":${slice.length},"operator":"SimOps.embedLshPairs@0.9 (q_dedup_embed_lsh path, adaptive geometry at real occupancy)","operator_wall_sec":$wallSec%.1f,"floor":0.9,"ok":$ok}"""
    println(json)
    println(if (ok) s"PASS: recall $recovered/${want.size} = " + f"$recall%.4f"
      else s"FAIL: recall=$recall fp=${falsePos.length} exact=$cosineExact")
    out.foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p), (json + "\n").getBytes("UTF-8"))
    }
    scala.reflect.io.Path(new java.io.File(scratch)).deleteRecursively()
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
