package graft

import org.apache.spark.sql.functions._

/** The decode stub's mapPartitions plumbing is the deliverable
  * (MultimodalOps.scala): binary column in, typed features out, one decoder
  * context per partition. These tests pin (a) the stub's arithmetic against
  * an exact per-row recomputation from the same UTF-8 bytes, and (b) that
  * the result is invariant to physical partitioning — the property a real
  * codec swap must preserve.
  */
class MultimodalSpec extends SparkSpec {

  test("decode stub equals exact per-row byte statistics") {
    val got = SparkEntry.queries("q_mm_decode_stub")(spark, sfDir)
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bytes"), r.getAs[Double]("mean_byte"),
            r.getAs[Int]("max_byte"), r.getAs[Int]("n_frames"))))
      .toMap

    val docs = U.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect()
    assert(docs.length === got.size)

    docs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bytes = r.getAs[String]("text").getBytes("UTF-8")
      val unsigned = bytes.map(_ & 0xff)
      val wantMean =
        if (bytes.isEmpty) 0.0
        else math.round(unsigned.map(_.toLong).sum.toDouble / bytes.length * 10000).toDouble / 10000
      val wantFrames = (r.getAs[Long]("n_chars") % 30 + 1).toInt
      val (nb, mean, mx, nf) = got(id)
      assert(nb === bytes.length.toLong, s"doc $id n_bytes")
      assert(mean === wantMean, s"doc $id mean_byte")
      assert(mx === (if (unsigned.isEmpty) 0 else unsigned.max), s"doc $id max_byte")
      assert(nf === wantFrames, s"doc $id n_frames")
    }
  }

  test("decode stub output is invariant to physical partitioning") {
    import spark.implicits._
    val base = U.documents(spark, sfDir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 30 + 1).cast("int").as("n_frames"))

    def run(numParts: Int) =
      base.repartition(numParts)
        .as[(Long, Array[Byte], Int)]
        .mapPartitions(_.map { case (id, p, nf) =>
          graft.ops.MultimodalOps.decodeStub(id, p, nf)
        })
        .collect()
        .sortBy(_.doc_id)
        .toSeq

    assert(run(1) === run(7))
  }
}
