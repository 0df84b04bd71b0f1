package graft

import graft.multimodal.{Ppm, Wav, Y4m}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The decode path's mapPartitions plumbing AND the codec itself are the
  * deliverable (MultimodalOps.scala + multimodal/Ppm.scala): binary column
  * in, header-parsed pixel matrix out, one decoder context per partition.
  * These tests pin (a) the codec as a codec — encode/decode round-trip,
  * spec-legal header variants, loud failure on malformed input — and
  * (b) that the distributed result is invariant to physical partitioning,
  * the property any codec swap must preserve. The pixel-statistics VALUES
  * are oracle-checked by the driver (q_mm_decode has DuckDB SQL).
  */
class MultimodalSpec extends SparkSpec {

  /** Deterministic sampling driver (same pattern as FunctionsSpec: the
    * scalatestplus bridge isn't on the offline classpath).
    */
  private def forAllSamples[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    while (produced < n) {
      gen(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
    }
  }

  private val imageGen: Gen[Ppm.Image] = for {
    w <- Gen.choose(1, 32)
    h <- Gen.choose(1, 32)
    maxVal <- Gen.choose(1, 255)
    px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
  } yield Ppm.Image(w, h, maxVal, px.map(_.toByte).toArray)

  test("property: encode/decode round-trips arbitrary images bit-exactly") {
    forAllSamples(imageGen) { img =>
      val back = Ppm.decode(Ppm.encode(img))
      assert(back.width === img.width)
      assert(back.height === img.height)
      assert(back.maxVal === img.maxVal)
      assert(back.pixels.toSeq === img.pixels.toSeq)
    }
  }

  test("property: any single-byte header corruption either fails or decodes different dims") {
    // Raster bytes are payload (any value is legal); header bytes are
    // structure. Corrupting each HEADER byte must never silently yield the
    // same image back — either the parse fails or the parsed shape/pixels
    // differ. (Guards against a parser that ignores what it claims to read.)
    val img = Ppm.Image(3, 2, 255, Array.tabulate(18)(i => (i * 11 % 256).toByte))
    val enc = Ppm.encode(img)
    val headerLen = enc.length - img.pixels.length
    for (pos <- 0 until headerLen; delta <- Seq(1, 128)) {
      val mut = enc.clone()
      mut(pos) = (mut(pos) + delta).toByte
      val same =
        try {
          val b = Ppm.decode(mut)
          b.width == img.width && b.height == img.height &&
          b.maxVal == img.maxVal && b.pixels.sameElements(img.pixels)
        } catch { case _: IllegalArgumentException => false }
      assert(!same, s"header byte $pos +$delta: decoder ignored the corruption")
    }
  }

  test("resizeNN samples exact top-left-anchored coordinates; dims are ceil(d/f)") {
    // 3x3 image with pixel value = flat index: factor 2 keeps rows {0,2} x
    // cols {0,2} => sampled source pixel starts 0,6,18,24 (x3 bytes each).
    val img = Ppm.Image(3, 3, 255, Array.tabulate(27)(_.toByte))
    val r = Ppm.resizeNN(img, 2)
    assert(r.width === 2 && r.height === 2)
    assert(r.pixels.toSeq === Seq(0, 1, 2, 6, 7, 8, 18, 19, 20, 24, 25, 26).map(_.toByte))
    // factor 1 is identity; factor >= dim collapses to the single anchor pixel
    assert(Ppm.resizeNN(img, 1).pixels.toSeq === img.pixels.toSeq)
    val one = Ppm.resizeNN(img, 3)
    assert(one.width === 1 && one.height === 1 && one.pixels.toSeq === Seq[Byte](0, 1, 2))
  }

  test("property: resizeNN dims and samples match the closed-form mapping") {
    forAllSamples(imageGen, n = 40) { img =>
      val f = 1 + (img.width + img.height) % 3 // deterministic factor 1..3
      val r = Ppm.resizeNN(img, f)
      assert(r.width === (img.width + f - 1) / f)
      assert(r.height === (img.height + f - 1) / f)
      for (y <- 0 until r.height; x <- 0 until r.width; c <- 0 until 3)
        assert(
          r.pixels((y * r.width + x) * 3 + c) ===
            img.pixels((y * f * img.width + x * f) * 3 + c))
    }
  }

  test("PPM encode/decode round-trips bit-exactly") {
    for (id <- Seq(0L, 7L, 123L); nChars <- Seq(0L, 3L, 7L, 1000L)) {
      val img = graft.ops.MultimodalOps.syntheticImage(id, nChars)
      val back = Ppm.decode(Ppm.encode(img))
      assert(back.width === img.width)
      assert(back.height === img.height)
      assert(back.maxVal === img.maxVal)
      assert(back.pixels.toSeq === img.pixels.toSeq)
    }
  }

  test("PPM decoder accepts spec-legal header variants (comments, whitespace)") {
    val img = Ppm.Image(2, 1, 255, Array[Byte](1, 2, 3, 4, 5, 6))
    val variant =
      "P6 # a comment\n# another line\n\t 2   1 \r\n255\n".getBytes("US-ASCII") ++
        img.pixels
    val back = Ppm.decode(variant)
    assert(back.width === 2 && back.height === 1)
    assert(back.pixels.toSeq === img.pixels.toSeq)
  }

  test("PPM decoder fails loudly on malformed input") {
    val good = Ppm.encode(Ppm.Image(2, 1, 255, Array[Byte](1, 2, 3, 4, 5, 6)))
    // wrong magic
    intercept[IllegalArgumentException](Ppm.decode("P5\n2 1\n255\n??".getBytes))
    // truncated raster
    intercept[IllegalArgumentException](Ppm.decode(good.dropRight(1)))
    // trailing garbage
    intercept[IllegalArgumentException](Ppm.decode(good :+ 0.toByte))
    // 16-bit maxval unsupported
    intercept[IllegalArgumentException](Ppm.decode("P6\n1 1\n65535\n??????".getBytes))
  }

  private val audioGen: Gen[Wav.Audio] = for {
    rate <- Gen.choose(8000, 48000)
    n <- Gen.choose(0, 200)
    s <- Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
  } yield Wav.Audio(rate, s.map(_.toShort).toArray)

  test("property: WAV encode/decode round-trips arbitrary PCM16 clips bit-exactly") {
    forAllSamples(audioGen, n = 60) { a =>
      val back = Wav.decode(Wav.encode(a))
      assert(back.sampleRate === a.sampleRate)
      assert(back.samples.toSeq === a.samples.toSeq)
    }
  }

  test("WAV decoder walks chunk lists: unknown chunks (incl. odd-length) are skipped") {
    val a = Wav.Audio(16000, Array[Short](5, -5, 300, -32768, 32767))
    val enc = Wav.encode(a)
    // splice a LIST chunk (odd body length 7 => 1 pad byte per RIFF spec)
    // between fmt and data: header stops at byte 36 in the canonical layout
    val listChunk =
      "LIST".getBytes("US-ASCII") ++ Array[Byte](7, 0, 0, 0) ++
        new Array[Byte](7) ++ Array[Byte](0)
    val spliced = enc.take(36) ++ listChunk ++ enc.drop(36)
    // fix the RIFF size field (bytes 4..7, LE)
    val total = spliced.length - 8
    for (k <- 0 until 4) spliced(4 + k) = ((total >> (8 * k)) & 0xff).toByte
    val back = Wav.decode(spliced)
    assert(back.sampleRate === a.sampleRate)
    assert(back.samples.toSeq === a.samples.toSeq)
  }

  test("WAV decoder fails loudly on malformed input") {
    val good = Wav.encode(Wav.Audio(16000, Array[Short](1, 2, 3)))
    intercept[IllegalArgumentException](Wav.decode("RIFX".getBytes ++ good.drop(4)))
    // stereo declared in fmt
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Wav.decode(stereo))
    // 8-bit declared in fmt
    val bits8 = good.clone(); bits8(34) = 8
    intercept[IllegalArgumentException](Wav.decode(bits8))
    // non-PCM codec id
    val ulaw = good.clone(); ulaw(20) = 7
    intercept[IllegalArgumentException](Wav.decode(ulaw))
    // data chunk overrunning the file
    intercept[IllegalArgumentException](Wav.decode(good.dropRight(2)))
  }

  private val videoGen: Gen[Y4m.Video] = for {
    w <- Gen.choose(1, 8)
    h <- Gen.choose(1, 8)
    nf <- Gen.choose(1, 6)
    frames <- Gen.listOfN(
      nf, Gen.listOfN(w * h * 3, Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
  } yield Y4m.Video(w, h, 25, 1, frames.toVector)

  test("property: Y4M encode/decode round-trips arbitrary C444 clips bit-exactly") {
    forAllSamples(videoGen, n = 50) { v =>
      val back = Y4m.decode(Y4m.encode(v))
      assert(back.width === v.width && back.height === v.height)
      assert(back.fpsNum === v.fpsNum && back.fpsDen === v.fpsDen)
      assert(back.frames.length === v.frames.length)
      back.frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.toSeq === b.toSeq)
      }
    }
  }

  test("Y4M decoder handles real-world header shapes; fails loudly on malformed input") {
    val v = Y4m.Video(2, 1, 30, 1, Vector(Array[Byte](1, 2, 3, 4, 5, 6)))
    // order-free tags + unknown X metadata tag, per the spec
    val reordered =
      ("YUV4MPEG2 C444 XCOLORRANGE=FULL H1 F30:1 W2 Ip A1:1\nFRAME\n"
        .getBytes("US-ASCII")) ++ v.frames(0)
    val back = Y4m.decode(reordered)
    assert(back.width === 2 && back.height === 1)
    assert(back.frames(0).toSeq === v.frames(0).toSeq)

    val good = Y4m.encode(v)
    intercept[IllegalArgumentException](Y4m.decode("JPEG".getBytes))
    // unsupported chroma subsampling must refuse, not mis-slice planes
    intercept[IllegalArgumentException](
      Y4m.decode(("YUV4MPEG2 W2 H1 F30:1 C420\nFRAME\n".getBytes("US-ASCII")
        ++ Array[Byte](1, 2, 3))))
    // truncated frame body
    intercept[IllegalArgumentException](Y4m.decode(good.dropRight(1)))
    // garbage where the FRAME marker must be
    intercept[IllegalArgumentException](
      Y4m.decode(good.take(good.length - v.frames(0).length - 6)
        ++ "FRAMX\n".getBytes ++ v.frames(0)))
    // missing dims
    intercept[IllegalArgumentException](
      Y4m.decode("YUV4MPEG2 F30:1\nFRAME\n".getBytes ++ v.frames(0)))
  }

  test("video decode stats equal an exact per-row recomputation from the frame formula") {
    val got = SparkEntry.queries("q_mm_video_decode")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("y_sum"),
          r.getAs[Long]("u_sum"), r.getAs[Long]("v_sum"),
          r.getAs[Long]("motion"))))
      .toMap
    val docs = U.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
    assert(docs.length === got.size)
    docs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nf = (1 + r.getAs[Long]("n_chars") % 5).toInt
      def px(f: Int, i: Int) = (id * 37 + f * 101 + i * 13) % 256
      val all = for (f <- 0 until nf; i <- 0 until 48) yield (f, i, px(f, i))
      val motion = all.collect { case (f, i, v) if f > 0 => math.abs(v - px(f - 1, i)) }.sum
      val (gn, gy, gu, gv, gm) = got(id)
      assert(gn === nf.toLong, s"doc $id n_frames")
      assert(gy === all.collect { case (_, i, v) if i < 16 => v }.sum, s"doc $id y_sum")
      assert(gu === all.collect { case (_, i, v) if i >= 16 && i < 32 => v }.sum, s"doc $id u_sum")
      assert(gv === all.collect { case (_, i, v) if i >= 32 => v }.sum, s"doc $id v_sum")
      assert(gm === motion, s"doc $id motion")
    }
  }

  test("audio decode stats equal an exact per-row recomputation from the sample formula") {
    val got = SparkEntry.queries("q_mm_audio_decode")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("sum_s"),
          r.getAs[Long]("energy"), r.getAs[Long]("zero_cross"))))
      .toMap
    val docs = U.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
    assert(docs.length === got.size)
    docs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = (64 + r.getAs[Long]("n_chars") % 64).toInt
      val s = (0 until n).map(i => (id * 131 + i * 7919L) % 65536 - 32768)
      val zc = s.sliding(2).count(p => p.size == 2 && (p(0) < 0) != (p(1) < 0))
      val (gn, gsum, ge, gzc) = got(id)
      assert(gn === n.toLong, s"doc $id n_samples")
      assert(gsum === s.sum, s"doc $id sum")
      assert(ge === s.map(v => v * v).sum, s"doc $id energy")
      assert(gzc === zc.toLong, s"doc $id zero_cross")
    }
  }

  test("q_mm_meta size formulas equal the real encoders' output lengths") {
    // metadata is computed as a pure column scan (payloads unread); these
    // checks are what license that shortcut — the formulas must equal the
    // actual encoded sizes for every reachable n_chars residue
    import graft.ops.MultimodalOps.{syntheticAudio, syntheticImage, syntheticVideo}
    for (id <- Seq(0L, 7L, 999L); nChars <- 0L to 70L) {
      val imgBytes = Ppm.encode(syntheticImage(id, nChars)).length.toLong
      val audioBytes = Wav.encode(syntheticAudio(id, nChars)).length.toLong
      val videoBytes = Y4m.encode(syntheticVideo(id, nChars)).length.toLong
      assert(imgBytes === 11 + 24 * (1 + nChars % 8), s"img n_chars=$nChars")
      assert(audioBytes === 44 + 2 * (64 + nChars % 64), s"audio n_chars=$nChars")
      assert(videoBytes === 35 + 54 * (1 + nChars % 5), s"video n_chars=$nChars")
    }
  }

  test("decode stats equal an exact per-row recomputation from the pixel formula") {
    val got = SparkEntry.queries("q_mm_decode")(spark, sfDir)
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("width"), r.getAs[Long]("height"),
            r.getAs[Long]("r_sum"), r.getAs[Long]("g_sum"),
            r.getAs[Long]("b_sum"), r.getAs[Long]("max_px"),
            r.getAs[Long]("min_px"))))
      .toMap

    val docs = U.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .collect()
    assert(docs.length === got.size)

    docs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = 8 * (1 + (r.getAs[Long]("n_chars") % 8).toInt) * 3
      val pix = (0 until n).map(i => (id * 31 + i * 7) % 256)
      def chan(c: Int) = pix.zipWithIndex.collect { case (v, i) if i % 3 == c => v }.sum
      val (w, h, rs, gs, bs, mx, mn) = got(id)
      assert(w === 8L && h === (n / 24).toLong, s"doc $id dims")
      assert((rs, gs, bs) === ((chan(0), chan(1), chan(2))), s"doc $id channel sums")
      assert(mx === pix.max && mn === pix.min, s"doc $id extremes")
    }
  }

  test("MediaStore: payloads round-trip through a parquet BinaryType column") {
    import org.apache.spark.sql.types._
    val store = graft.ops.MultimodalOps.MediaStore.payloads(spark, sfDir)
    // the store IS a parquet file with genuine binary columns
    assert(store.schema("img").dataType === BinaryType)
    assert(store.schema("wav").dataType === BinaryType)
    assert(store.schema("y4m").dataType === BinaryType)
    // bytes read back from parquet decode identically to a direct encode —
    // the storage hop is lossless for all three codecs
    val docs = U.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).orderBy("doc_id").limit(5)
      .collect().map(r => (r.getAs[Number]("doc_id").longValue,
        r.getAs[Number]("n_chars").longValue))
    val byId = store.orderBy("doc_id").limit(5).collect()
      .map(r => r.getAs[Number]("doc_id").longValue ->
        ((r.getAs[Array[Byte]]("img"), r.getAs[Array[Byte]]("wav"),
          r.getAs[Array[Byte]]("y4m")))).toMap
    docs.foreach { case (id, n) =>
      val (img, wav, y4m) = byId(id)
      assert(Ppm.stats(id, Ppm.decode(img)) ===
        Ppm.stats(id, graft.ops.MultimodalOps.syntheticImage(id, n)))
      assert(Wav.stats(id, Wav.decode(wav)) ===
        Wav.stats(id, graft.ops.MultimodalOps.syntheticAudio(id, n)))
      assert(Y4m.stats(id, Y4m.decode(y4m)) ===
        Y4m.stats(id, graft.ops.MultimodalOps.syntheticVideo(id, n)))
    }
    // session-scoped: a second call reuses the materialized store (same
    // underlying files, no rewrite)
    val again = graft.ops.MultimodalOps.MediaStore.payloads(spark, sfDir)
    assert(again.inputFiles.sorted.toSeq === store.inputFiles.sorted.toSeq)
  }

  test("q_mm_audio_decode scans ONLY (doc_id, wav) from the media store") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = withPlanShapeConf()(
      executedPlan(SparkEntry.queries("q_mm_audio_decode")(spark, sfDir)))
    val scan = plan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    // img and y4m payloads must NOT be read for an audio job — at 100 TB
    // the pruned columns are most of the bytes in the store
    assert(scan.requiredSchema.fieldNames.toSet === Set("doc_id", "wav"),
      s"scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("decode output is invariant to physical partitioning") {
    import spark.implicits._
    val base = U.documents(spark, sfDir).select(col("doc_id"), col("n_chars"))

    def run(numParts: Int) =
      base.repartition(numParts)
        .as[(Long, Long)]
        .map { case (id, nc) =>
          (id, Ppm.encode(graft.ops.MultimodalOps.syntheticImage(id, nc)))
        }
        .mapPartitions(_.map { case (id, p) => Ppm.stats(id, Ppm.decode(p)) })
        .collect()
        .sortBy(_.doc_id)
        .toSeq

    assert(run(1) === run(7))
  }
}
