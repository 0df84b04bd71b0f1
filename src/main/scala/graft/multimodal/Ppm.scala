package graft.multimodal

/** A real (if deliberately minimal) image codec: binary PPM, format P6
  * (netpbm). P6 is an actual interchange format — `magic "P6"`, then
  * whitespace-separated ASCII width/height/maxval with `#` comments allowed
  * in the header, then `width*height` raw RGB byte triplets — so the decoder
  * below parses genuine image files, not a synthetic container. It replaces
  * the round-1..8 byte-statistics stub: the container still ships no
  * JPEG/PNG codecs, but a bounded real format exercises the same contract a
  * production codec drops into (binary column in → parse header → typed
  * pixel matrix out), and its pixel statistics are integer-exact, so the
  * DuckDB oracle can verify the whole decode path end to end.
  *
  * Scale note: payloads stay bounded (the caller fixes width/height), the
  * codec allocates only per-row state, and both directions are pure
  * functions of the bytes — safe inside `mapPartitions` at any parallelism.
  */
object Ppm {

  final case class Image(width: Int, height: Int, maxVal: Int, pixels: Array[Byte]) {
    def nPixels: Int = width * height
  }

  /** Encode an 8-bit RGB image as binary PPM (P6). */
  def encode(img: Image): Array[Byte] = {
    require(img.pixels.length == img.nPixels * 3,
      s"pixel buffer ${img.pixels.length} != ${img.nPixels * 3}")
    require(img.maxVal > 0 && img.maxVal < 256, s"P6 8-bit maxval: ${img.maxVal}")
    val header =
      s"P6\n${img.width} ${img.height}\n${img.maxVal}\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Decode binary PPM (P6). Accepts any legal header: arbitrary whitespace
    * between tokens and `#`-to-end-of-line comments (the netpbm spec), then
    * exactly one whitespace byte before the raster. Throws on malformed
    * input — a decoder that silently "succeeds" on garbage would make the
    * oracle meaningless.
    */
  def decode(bytes: Array[Byte]): Image = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PPM: $msg (at byte $pos)")
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("bad magic")
    pos = 2
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
    def skipWsAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < bytes.length && isWs(bytes(pos))) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moved = true
        }
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      if (pos >= bytes.length || bytes(pos) < '0' || bytes(pos) > '9')
        fail("expected ASCII integer")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > (1 << 24)) fail("header integer out of range")
        pos += 1
      }
      v
    }
    val width = readInt()
    val height = readInt()
    val maxVal = readInt()
    if (width <= 0 || height <= 0) fail(s"bad dimensions ${width}x$height")
    if (maxVal <= 0 || maxVal > 255) fail(s"unsupported maxval $maxVal")
    // exactly ONE whitespace byte separates the header from the raster
    if (pos >= bytes.length || !isWs(bytes(pos))) fail("missing raster separator")
    pos += 1
    // Long arithmetic: header dims are individually capped at 2^24 but the
    // product can wrap Int, and a crafted wrap-around must not alias a
    // "consistent" raster length
    val nL = width.toLong * height * 3L
    if ((bytes.length - pos).toLong != nL)
      fail(s"raster length ${bytes.length - pos} != $nL")
    val n = nL.toInt
    val px = new Array[Byte](n)
    System.arraycopy(bytes, pos, px, 0, n)
    Image(width, height, maxVal, px)
  }

  /** Nearest-neighbor downsample by an integer factor: output dims are
    * ceil(w/f) x ceil(h/f), output pixel (y, x) samples input
    * (y*f, x*f) — top-left anchoring, the standard NN convention. Exact
    * integer geometry, so an oracle can recompute the resized raster in
    * closed form.
    */
  def resizeNN(img: Image, factor: Int): Image = {
    require(factor >= 1, s"resize factor: $factor")
    val w2 = (img.width + factor - 1) / factor
    val h2 = (img.height + factor - 1) / factor
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = (y * factor * img.width + x * factor) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, img.maxVal, out)
  }

  /** Integer pixel statistics of a decoded image: per-channel sums plus
    * global max/min — everything a DuckDB oracle can recompute exactly.
    */
  final case class PixelStats(
      doc_id: Long,
      width: Long,
      height: Long,
      r_sum: Long,
      g_sum: Long,
      b_sum: Long,
      max_px: Long,
      min_px: Long)

  def stats(docId: Long, img: Image): PixelStats = {
    var r, g, b = 0L
    var mx = 0L
    var mn = 255L
    var i = 0
    while (i < img.pixels.length) {
      val v = (img.pixels(i) & 0xff).toLong
      (i % 3: @annotation.switch) match {
        case 0 => r += v
        case 1 => g += v
        case 2 => b += v
      }
      if (v > mx) mx = v
      if (v < mn) mn = v
      i += 1
    }
    PixelStats(docId, img.width.toLong, img.height.toLong, r, g, b, mx, mn)
  }
}
