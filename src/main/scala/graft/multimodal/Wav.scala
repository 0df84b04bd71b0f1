package graft.multimodal

/** The audio counterpart of [[Ppm]]: a real (bounded) codec for RIFF/WAVE
  * PCM — the uncompressed interchange format actual audio tooling reads.
  * Encoder emits a spec-correct mono 16-bit PCM file (RIFF header, `fmt `
  * chunk, `data` chunk); decoder WALKS THE CHUNK LIST like a real WAV
  * reader (unknown chunks — `LIST`, `cue `, etc. — are skipped by their
  * declared size; `fmt ` is validated before `data` is interpreted), so it
  * decodes files produced by other writers too, not just its own. Loud
  * failures on malformed input keep the oracle meaningful.
  *
  * Same deployment contract as the image codec: pure functions of the
  * bytes, per-row state only — safe inside `mapPartitions` at any
  * parallelism; payloads stay bounded by the caller.
  */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Encode mono 16-bit little-endian PCM as a canonical 44-byte-header
    * WAV file.
    */
  def encode(a: Audio): Array[Byte] = {
    require(a.sampleRate > 0, s"sample rate: ${a.sampleRate}")
    val dataLen = a.samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1))                 // PCM
    out.write(le16(1))                 // mono
    out.write(le32(a.sampleRate))
    out.write(le32(a.sampleRate * 2))  // byte rate
    out.write(le16(2))                 // block align
    out.write(le16(16))                // bits per sample
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    a.samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Decode a RIFF/WAVE file: validate the RIFF/WAVE magic, walk chunks
    * (2-byte-aligned per spec), require a PCM mono 16-bit `fmt ` before
    * `data`, skip unknown chunks by declared size. Throws on malformed
    * input.
    */
  def decode(bytes: Array[Byte]): Audio = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WAV: $msg")
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    def tag(p: Int): String =
      if (p + 4 > bytes.length) fail("truncated chunk id")
      else new String(bytes, p, 4, "US-ASCII")

    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      fail("bad RIFF/WAVE magic")
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(4))
    var pos = 12L
    var rate = -1
    var fmtSeen = false
    var samples: Array[Short] = null
    while (pos + 8 <= riffEnd) {
      val id = tag(pos.toInt)
      val size = u32(pos.toInt + 4)
      val body = pos + 8
      if (body + size > riffEnd) fail(s"chunk '$id' overruns file")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too small")
          val audioFormat = u16(body.toInt)
          val channels = u16(body.toInt + 2)
          val bits = u16(body.toInt + 14)
          if (audioFormat != 1) fail(s"unsupported codec $audioFormat (PCM only)")
          if (channels != 1) fail(s"unsupported channel count $channels (mono only)")
          if (bits != 16) fail(s"unsupported bit depth $bits (16-bit only)")
          rate = u32(body.toInt + 4).toInt
          if (rate <= 0) fail(s"bad sample rate $rate")
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt")
          if (size % 2 != 0) fail("odd data length for 16-bit samples")
          val n = (size / 2).toInt
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = u16(body.toInt + 2 * i).toShort; i += 1 }
        case _ => () // unknown chunk: skip by declared size (LIST, cue , ...)
      }
      pos = body + size + (size & 1) // chunks are 2-byte aligned
    }
    if (!fmtSeen) fail("missing fmt chunk")
    if (samples == null) fail("missing data chunk")
    Audio(rate, samples)
  }

  /** Integer statistics of decoded audio — all closed-form recomputable:
    * sample count/rate, sum, extremes, energy (sum of squares), and
    * zero-crossing count (sign changes between consecutive samples, zeros
    * counted as non-negative).
    */
  final case class AudioStats(
      doc_id: Long,
      n_samples: Long,
      sample_rate: Long,
      sum_s: Long,
      max_s: Long,
      min_s: Long,
      energy: Long,
      zero_cross: Long)

  def stats(docId: Long, a: Audio): AudioStats = {
    // A zero-sample data chunk is spec-legal; without this guard the
    // Long.MinValue/MaxValue scan sentinels would leak out as real extremes.
    if (a.samples.isEmpty)
      return AudioStats(docId, 0L, a.sampleRate.toLong, 0L, 0L, 0L, 0L, 0L)
    var sum = 0L
    var mx = Long.MinValue
    var mn = Long.MaxValue
    var energy = 0L
    var zc = 0L
    var i = 0
    while (i < a.samples.length) {
      val v = a.samples(i).toLong
      sum += v
      if (v > mx) mx = v
      if (v < mn) mn = v
      energy += v * v
      if (i > 0 && ((a.samples(i - 1) < 0) != (v < 0))) zc += 1
      i += 1
    }
    AudioStats(docId, a.samples.length.toLong, a.sampleRate.toLong,
      sum, mx, mn, energy, zc)
  }
}
