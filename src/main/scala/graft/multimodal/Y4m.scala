package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** The video counterpart of [[Ppm]]/[[Wav]]: a real (bounded) codec for
  * YUV4MPEG2 (.y4m) — the uncompressed video interchange format ffmpeg and
  * mplayer read/write. Stream layout: one ASCII header line
  * `YUV4MPEG2 W<w> H<h> F<n>:<d> ...\n` (space-separated tagged params,
  * order-free per spec), then per frame a `FRAME...\n` marker followed by
  * raw planes. We support C444 (full-resolution Y, U, V planes — w*h bytes
  * each); other chroma taggings fail loudly rather than mis-decode.
  *
  * Same deployment contract as the image/audio codecs: pure functions of
  * the bytes, per-row state only, bounded payloads — safe inside
  * `mapPartitions` at any parallelism.
  */
object Y4m {

  /** A decoded clip: every frame is w*h*3 bytes (Y then U then V planes). */
  final case class Video(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Vector[Array[Byte]]) {
    def planeLen: Int = width * height
  }

  /** Encode as C444 YUV4MPEG2. */
  def encode(v: Video): Array[Byte] = {
    require(v.width > 0 && v.height > 0, s"dims ${v.width}x${v.height}")
    require(v.fpsNum > 0 && v.fpsDen > 0, s"fps ${v.fpsNum}:${v.fpsDen}")
    val n = v.planeLen * 3
    v.frames.foreach(f => require(f.length == n, s"frame ${f.length} != $n"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(
      s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C444\n"
        .getBytes("US-ASCII"))
    v.frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(f)
    }
    out.toByteArray
  }

  /** Decode a C444 YUV4MPEG2 stream. Parses the tagged header params in
    * any order (W/H/F required; C must be 444 if present; unknown tags —
    * X metadata etc. — are ignored like a real reader), then walks FRAME
    * markers, tolerating per-frame parameters after the marker. Throws on
    * malformed input.
    */
  def decode(bytes: Array[Byte]): Video = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Y4M: $msg")
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      if (i >= bytes.length) fail("unterminated header line")
      i
    }
    val magic = "YUV4MPEG2"
    if (bytes.length < magic.length ||
      new String(bytes, 0, magic.length, "US-ASCII") != magic)
      fail("bad magic")
    val hEnd = lineEnd(magic.length)
    val params = new String(bytes, magic.length, hEnd - magic.length, "US-ASCII")
      .trim.split("\\s+").filter(_.nonEmpty)
    var w = -1
    var h = -1
    var fn = -1
    var fd = -1
    params.foreach { p =>
      p.head match {
        case 'W' => w = p.tail.toIntOption.getOrElse(fail(s"bad W: $p"))
        case 'H' => h = p.tail.toIntOption.getOrElse(fail(s"bad H: $p"))
        case 'F' =>
          p.tail.split(":") match {
            case Array(a, b) =>
              fn = a.toIntOption.getOrElse(fail(s"bad F: $p"))
              fd = b.toIntOption.getOrElse(fail(s"bad F: $p"))
            case _ => fail(s"bad F: $p")
          }
        case 'C' => if (p.tail != "444") fail(s"unsupported chroma C${p.tail} (C444 only)")
        case _   => () // I (interlace), A (aspect), X (metadata): ignored
      }
    }
    if (w <= 0 || h <= 0) fail(s"missing/bad dims W$w H$h")
    if (fn <= 0 || fd <= 0) fail(s"missing/bad frame rate F$fn:$fd")
    // Long product first: crafted dims can wrap Int and alias a negative
    // or small frame length
    val frameLenL = w.toLong * h * 3L
    if (frameLenL > bytes.length) fail(s"frame size $frameLenL exceeds stream")
    val frameLen = frameLenL.toInt
    val frames = ArrayBuffer.empty[Array[Byte]]
    var pos = hEnd + 1
    while (pos < bytes.length) {
      if (pos + 5 > bytes.length ||
        new String(bytes, pos, 5, "US-ASCII") != "FRAME")
        fail(s"expected FRAME marker at byte $pos")
      val mEnd = lineEnd(pos + 5) // per-frame params (rare) run to the newline
      val body = mEnd + 1
      if (body + frameLen > bytes.length)
        fail(s"truncated frame ${frames.length}")
      val f = new Array[Byte](frameLen)
      System.arraycopy(bytes, body, f, 0, frameLen)
      frames += f
      pos = body + frameLen
    }
    if (frames.isEmpty) fail("no frames")
    Video(w, h, fn, fd, frames.toVector)
  }

  /** Integer statistics of a decoded clip — all closed-form recomputable:
    * frame count and dims, per-plane byte sums, global extremes, and
    * `motion` = Σ_f Σ_i |frame_f[i] - frame_{f-1}[i]| (frame differencing,
    * the basic temporal activity measure).
    */
  final case class VideoStats(
      doc_id: Long,
      n_frames: Long,
      width: Long,
      height: Long,
      y_sum: Long,
      u_sum: Long,
      v_sum: Long,
      max_b: Long,
      min_b: Long,
      motion: Long)

  def stats(docId: Long, v: Video): VideoStats = {
    val pl = v.planeLen
    var y, u, vv = 0L
    var mx = 0L
    var mn = 255L
    var motion = 0L
    var fi = 0
    while (fi < v.frames.length) {
      val f = v.frames(fi)
      val prev = if (fi > 0) v.frames(fi - 1) else null
      var i = 0
      while (i < f.length) {
        val b = (f(i) & 0xff).toLong
        if (i < pl) y += b else if (i < 2 * pl) u += b else vv += b
        if (b > mx) mx = b
        if (b < mn) mn = b
        if (prev != null) motion += math.abs(b - (prev(i) & 0xff).toLong)
        i += 1
      }
      fi += 1
    }
    VideoStats(docId, v.frames.length.toLong, v.width.toLong, v.height.toLong,
      y, u, vv, mx, mn, motion)
  }
}
