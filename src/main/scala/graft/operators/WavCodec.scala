package graft.operators

/** Pure-JVM codec for PCM16 RIFF/WAVE — the AUDIO member of the
  * multimodal codec family, alongside [[BmpCodec]] (uncompressed image)
  * and [[PngCodec]] (compressed image): no external libraries, just the
  * published container format (RIFF header + `fmt ` chunk + `data`
  * chunk, all little-endian).
  *
  * Decode is a real CHUNK WALK, not a fixed-offset read: RIFF files
  * may carry LIST/INFO/fact chunks between `fmt ` and `data`, and every
  * chunk is word-aligned (an odd-sized chunk is followed by one pad
  * byte that its size field does not count). Both quirks are handled
  * and spec-pinned. Supported content is integer PCM (`audioFormat` 1),
  * 16-bit, 1 or 2 channels — anything else returns `None` under the
  * family's tolerant contract (a corrupt or unsupported payload is
  * counted by callers, never thrown; all size arithmetic runs in Long
  * BEFORE any allocation, the [[BmpCodec]] crafted-header lesson).
  *
  * Everything downstream of decode is exact integer arithmetic
  * ([[features]]), so the DuckDB oracle re-decodes the same bytes
  * independently (hex-string byte math over `read_blob`) and the two
  * decoders must agree bit-for-bit.
  */
object WavCodec {

  /** Decoded audio: interleaved PCM16 frames
    * (`samples(f * channels + c)` = frame f, channel c). */
  final case class Wav(sampleRate: Int, channels: Int,
                       samples: Array[Short])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Cap on decoded sample count (2^26 samples = 128 MiB of PCM16) —
    * rejects crafted size fields before allocation, same rationale as
    * [[BmpCodec]]'s 2^15 dimension cap. */
  val MaxSamples: Long = 1L << 26

  /** Parse a PCM16 RIFF/WAVE; `None` when the bytes are not one (wrong
    * magic, truncated chunk, non-PCM format, bits ≠ 16, channels ∉
    * {1, 2}, crafted sizes). A `data` chunk whose byte count is not a
    * whole number of frames is truncated to whole frames (trailing
    * partial frame ignored — tolerated, like trailing garbage after
    * the pixel array in a BMP). */
  def decode(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "WAVE")
      return None
    var off = 12L
    var sampleRate = -1
    var channels = -1
    var dataOff = -1L
    var dataSize = -1L
    // Chunk walk: [4-byte id][4-byte LE size][size bytes][pad to even].
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
      val id = tag(bytes, off.toInt)
      val size = le32(bytes, off.toInt + 4)
      val body = off + 8
      if (body + size > bytes.length) return None // truncated chunk
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = le16(bytes, body.toInt)
        val ch = le16(bytes, body.toInt + 2)
        val rate = le32(bytes, body.toInt + 4)
        val bits = le16(bytes, body.toInt + 14)
        if (audioFormat != 1 || bits != 16 || (ch != 1 && ch != 2) ||
            rate <= 0 || rate > 1000000L)
          return None
        channels = ch
        sampleRate = rate.toInt
      } else if (id == "data") {
        dataOff = body
        dataSize = size
      }
      off = body + size + (size & 1) // word-aligned: odd size pads 1
    }
    if (sampleRate < 0 || dataOff < 0) return None
    val nSamples = (dataSize / 2 / channels) * channels // whole frames
    if (nSamples > MaxSamples) return None
    val out = new Array[Short](nSamples.toInt)
    var i = 0
    while (i < out.length) {
      out(i) = le16(bytes, (dataOff + 2L * i).toInt).toShort
      i += 1
    }
    Some(Wav(sampleRate, channels, out))
  }

  /** Encode interleaved PCM16 as a canonical 44-byte-header WAV (the
    * exact layout [[decode]] parses back — round-trip is identity,
    * spec-pinned; fixture generation and round-trip proof, like the
    * other family encoders). */
  def encode(sampleRate: Int, channels: Int,
             samples: Array[Short]): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not whole frames of $channels")
    val dataSize = 2 * samples.length
    val out = new Array[Byte](44 + dataSize)
    def putTag(off: Int, s: String): Unit =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .copyToArray(out, off)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putTag(0, "RIFF"); putLe32(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1)                       // PCM
    putLe16(22, channels)
    putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2) // byte rate
    putLe16(32, channels * 2)            // block align
    putLe16(34, 16)                      // bits per sample
    putTag(36, "data"); putLe32(40, dataSize)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Exact-integer audio features — the quantities a corpus-curation
    * pass filters on (silence/clipping detection, duration caps),
    * each replayable bit-for-bit in SQL:
    *
    *  - `nFrames`    = samples / channels;
    *  - `durationMs` = nFrames · 1000 div sampleRate (floor);
    *  - `energy`     = Σ s² over ALL interleaved samples (≤ 2^31·2^26,
    *                   exact in BIGINT);
    *  - `peak`       = max |s| (32768 reachable at Short.MinValue);
    *  - `zeroCross`  = sign boundaries of the CHANNEL-0 sequence:
    *                   consecutive frames where (s < 0) flips.
    */
  def features(w: Wav): (Long, Long, Long, Long, Long) = {
    val nFrames = w.samples.length.toLong / w.channels
    val durationMs = nFrames * 1000L / w.sampleRate
    var energy = 0L
    var peak = 0L
    var i = 0
    while (i < w.samples.length) {
      val s = w.samples(i).toLong
      energy += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    var zc = 0L
    var f = 1
    while (f < nFrames) {
      val prev = w.samples((f - 1) * w.channels) < 0
      val cur = w.samples(f * w.channels) < 0
      if (prev != cur) zc += 1
      f += 1
    }
    (nFrames, durationMs, energy, peak, zc)
  }
}
