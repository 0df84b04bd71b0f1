package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Probe-scale measurement of the asymmetric containment candidate probe
  * (r14; VERDICT r13 item 1) on a NATURAL-vocabulary corpus.
  *
  * The ScaleGen replica corpora saturate the shingle space by
  * construction (every base shingle recurs in each replica), so there the
  * probe's candidate volume is quadratic and the gate refuses it — named
  * in the containment scale verdict. A real web corpus is the opposite
  * regime: shingle df ~ 1-3, so the probe's volume is ~linear in docs.
  * This utility builds that regime at a chosen scale — n docs of 40-400
  * words drawn deterministically from a 500k-word vocabulary, with
  * `nQuotes` planted 30-word contiguous excerpts (containment 1.0,
  * symmetric jaccard ~ 0.07-0.7 depending on the source doc's length) —
  * and measures, on the FORCED MinHash scale path:
  *
  *   - the probe's predicted candidate volume and whether the budget
  *     admits it;
  *   - quote-pair recall with the probe OFF (symmetric banding only —
  *     the pre-r14 behavior) vs ON, plus walls for both runs.
  *
  * Run: `runMain graft.QuoteProbe [nDocs] [nQuotes] [outJson]`.
  */
object QuoteProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(200000)
    val nQuotes = args.lift(1).map(_.toInt).getOrElse(500)
    val out = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Deterministic distributed generation: doc i's word j is
    // w<xxhash64(i, j) mod 500000>; lengths 40-400. Quotes are 30-word
    // contiguous slices of the first nQuotes docs, at a hashed offset.
    val base = spark.range(n).select(
      col("id").as("doc_id"),
      expr("transform(sequence(1, 40 + pmod(xxhash64(id), 361)), " +
        "j -> concat('w', pmod(xxhash64(id, j), 500000)))").as("w"))
    val quotes = base
      .filter(col("doc_id") < nQuotes)
      .select(
        (col("doc_id") + n).as("doc_id"),
        expr("slice(w, 1 + pmod(xxhash64(doc_id, 77L), size(w) - 30), 30)")
          .as("w"))
    val dir = java.nio.file.Files.createTempDirectory("graft_quoteprobe").toString
    base.unionByName(quotes)
      .select(
        col("doc_id"),
        array_join(col("w"), " ").as("text"),
        lit("en").as("lang"),
        lit("syn").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val volume = ops.DedupOps.containmentProbeVolume(spark, dir)
    val budget = spark.conf
      .get("spark.graft.jaccard.maxCandidates", "200000000").toLong
    println(s"[quoteprobe] n=$n quotes=$nQuotes probe volume=$volume " +
      s"budget=$budget admitted=${volume <= budget}")

    spark.conf.set("spark.graft.pairgraph.source", "minhash")
    def recovered(): (Long, Double) = {
      val t0 = System.nanoTime()
      val hits = SparkEntry.queries("q_dedup_containment")(spark, dir)
        .filter(col("b") >= n && col("a") === col("b") - n)
        .count()
      (hits, (System.nanoTime() - t0) / 1e9)
    }
    spark.conf.set("spark.graft.containment.probe", "off")
    val (hitsOff, wallOff) = recovered()
    spark.conf.set("spark.graft.containment.probe", "auto")
    val (hitsOn, wallOn) = recovered()
    println(f"[quoteprobe] banding-only: $hitsOff/$nQuotes quotes " +
      f"($wallOff%.1f s); with probe: $hitsOn/$nQuotes ($wallOn%.1f s)")

    val json =
      s"""{"metric":"asymmetric containment probe on a natural-vocabulary corpus",""" +
        s""""n_docs":${n + nQuotes},"planted_quotes":$nQuotes,""" +
        s""""probe_volume":$volume,"budget":$budget,"admitted":${volume <= budget},""" +
        f""""recovered_banding_only":$hitsOff,"recovered_with_probe":$hitsOn,""" +
        f""""wall_banding_only_sec":$wallOff%.1f,"wall_with_probe_sec":$wallOn%.1f,""" +
        s""""method":"forced minhash source (the past-the-gate scale path); quotes are 30-word contiguous excerpts, containment 1.0"}"""
    println(json)
    out.foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p), (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
