package graft.ops

import graft.{Q, U}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star, `BASELINE.json:6`): image/audio/
  * video are opaque `binary` payload columns with typed metadata. The
  * container has no media codecs, so the DECODE step is a clearly-marked
  * deterministic STUB (byte statistics standing in for pixels/samples) — the
  * Spark-side plumbing (schema, binary columns, per-partition batch decode,
  * frame-sampling explode) is real and tested.
  *
  * Payloads here are derived from `documents.text` (UTF-8 bytes) since the
  * driver testdata has no binary column; at 100 TB the same plan reads
  * parquet binary columns directly, and the per-partition decode pattern
  * (one decoder instance per partition, streaming batches) is the shape a
  * real codec drops into.
  */
object MultimodalOps {

  /** One decoded media item (what a real decoder would emit per payload). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      mean_byte: Double,
      max_byte: Int,
      n_frames: Int)

  /** STUB decoder — stands in for an image/audio decode. Deterministic pure
    * function of the payload bytes; replace with a real codec at deploy.
    */
  def decodeStub(docId: Long, payload: Array[Byte], nFrames: Int): MediaFeatures = {
    var sum = 0L
    var mx = 0
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      if (b > mx) mx = b
      i += 1
    }
    val mean =
      if (payload.length == 0) 0.0
      else math.round(sum.toDouble / payload.length * 10000).toDouble / 10000
    MediaFeatures(docId, payload.length.toLong, mean, mx, nFrames)
  }

  /** n_frames metadata derived deterministically from doc length. */
  private val nFrames = (col("n_chars") % 30 + 1).cast("long")

  val qs: Seq[Q] = Seq(
    // Binary payload + typed metadata projection (oracle-checkable).
    Q(
      "q_mm_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS fake_height,
        |  CAST(n_chars % 30 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val payload = encode(col("text"), "UTF-8")
      val nBytes = length(payload).cast("long")
      U.documents(s, d)
        .select(
          col("doc_id"),
          nBytes.as("n_bytes"),
          (nBytes % 640).as("fake_width"),
          ((nBytes * 7) % 480).as("fake_height"),
          nFrames.as("n_frames"))
        .orderBy("doc_id")
    },

    // Frame sampling: every 5th frame index per item, exploded to rows.
    Q(
      "q_mm_frames",
      """SELECT doc_id, unnest(generate_series(0, CAST(n_chars % 30 AS BIGINT), 5)) AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      U.documents(s, d)
        .select(
          col("doc_id"),
          explode(sequence(lit(0L), nFrames - 1, lit(5L))).as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    },

    // STUB resize: stride-k byte subsampling — the shape of an image/audio
    // downsample (every k-th sample), with the payload staying a binary
    // column end to end. Real resize drops into the same mapPartitions slot
    // as the decode stub; this one is expressible as pure column ops so the
    // oracle covers the plumbing (lengths + head bytes of the resized
    // payload).
    Q(
      "q_mm_resize_stub",
      """WITH p AS (SELECT doc_id, encode(text) AS payload FROM documents)
        |SELECT doc_id,
        |  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        |  CAST((octet_length(payload) + 3) // 4 AS BIGINT) AS resized_bytes,
        |  substr(text, 1, 1) AS b0,
        |  substr(text, 5, 1) AS b1,
        |  substr(text, 9, 1) AS b2
        |FROM p JOIN documents USING (doc_id) ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val payload = encode(col("text"), "UTF-8")
        val nBytes = length(payload).cast("long")
        U.documents(s, d)
          .select(
            col("doc_id"),
            nBytes.as("n_bytes"),
            // ceil(n/4) in integer arithmetic, identical both engines
            ((nBytes + 3) / 4).cast("long").as("resized_bytes"),
            substring(col("text"), 1, 1).as("b0"),
            substring(col("text"), 5, 1).as("b1"),
            substring(col("text"), 9, 1).as("b2"))
          .orderBy("doc_id")
    },

    // Per-partition batch decode through the STUB codec: the real pattern —
    // binary column in, typed features out, one decoder per partition.
    // Deterministic but not SQL-expressible => ScalaTest-verified.
    Q.noOracle("q_mm_decode_stub") { (s, d) =>
      import s.implicits._
      val items = U
        .documents(s, d)
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          nFrames.cast("int").as("n_frames"))
        .as[(Long, Array[Byte], Int)]
      items
        .mapPartitions { it =>
          // one decoder context per partition would be initialized here
          it.map { case (id, payload, nf) => decodeStub(id, payload, nf) }
        }
        .toDF()
        .orderBy("doc_id")
    }
  )
}
