package graft.operators

/** PNG member of the codec family behind the multimodal seam — same
  * bytes-in/[[BmpCodec.Bmp]]-out contract as [[BmpCodec.decode]], built
  * on the JDK's own `javax.imageio` PNG reader (pure JDK, no external
  * libraries, works headless). PNG is a lossless format, so the decoded
  * RGB pixel array is deterministic for fixed input bytes even though
  * PNG *encoders* may emit different (equally valid) byte streams —
  * which is why the parity convention for PNG queries judges PIXELS
  * (the closed-form content the fixture encodes), never payload bytes.
  *
  * Tolerant-decode contract: `None` for anything that is not a
  * readable PNG (wrong magic, truncated, corrupt chunks, absurd
  * dimensions) — a corrupt crawl payload is counted, never thrown,
  * same as [[BmpCodec.decode]].
  */
object PngCodec {

  // ImageIO's DEFAULT stream cache is DISK-backed: every read/write
  // call creates (and deletes) a temp file in java.io.tmpdir. On the
  // hot multimodal path that is two filesystem metadata round-trips
  // per 8x8 image — pure overhead for byte-array-backed streams that
  // fit in memory by construction (payloads are dimension-capped
  // before decode). The memory cache is byte-identical in output. The
  // JVM-wide flag is set in THREE places: Sessions.get (deterministic
  // driver-side bootstrap, covers pre-codec ImageIO use) and class
  // init of both imageio codecs (the executor-side guarantee — decode
  // tasks run in executor JVMs that never execute Sessions.get).
  javax.imageio.ImageIO.setUseCache(false)

  private val MaxSide = 1 << 15 // same dimension cap as BmpCodec

  /** IHDR width/height read straight off the byte stream — the IHDR
    * chunk is mandated to be first, so after the 8-byte signature and
    * the 8-byte chunk header the big-endian int32 width sits at offset
    * 16 and height at offset 20. Checking these BEFORE `ImageIO.read`
    * matters: a crafted PNG declaring absurd dimensions would otherwise
    * allocate the full raster inside the JDK reader, and the resulting
    * `OutOfMemoryError` is an `Error` that escapes `NonFatal` — the
    * same alloc-before-check hole [[BmpCodec.decode]] closes for BMP. */
  private def ihdrDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.length < 24) None
    else {
      def be32(o: Int): Int =
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      // bytes 12..15 must spell "IHDR" for the offsets to be meaningful
      if (bytes(12) == 'I' && bytes(13) == 'H' &&
          bytes(14) == 'D' && bytes(15) == 'R')
        Some((be32(16), be32(20)))
      else None
    }

  /** True iff the first 8 bytes are the PNG signature
    * (89 50 4E 47 0D 0A 1A 0A). */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G' &&
      (bytes(4) & 0xff) == 0x0d && (bytes(5) & 0xff) == 0x0a &&
      (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0x0a

  /** Parse PNG bytes into the codec family's normalized form:
    * row-major top-down 0xRRGGBB pixels (alpha dropped — the feature
    * extractors downstream are RGB-only, matching the BMP member). */
  def decode(bytes: Array[Byte]): Option[BmpCodec.Bmp] = {
    if (!isPng(bytes)) return None
    // Pre-allocation guard: reject declared dimensions outside
    // (0, MaxSide] before the JDK reader gets a chance to allocate.
    ihdrDims(bytes) match {
      case Some((w, h))
          if w > 0 && h > 0 && w <= MaxSide && h <= MaxSide => // ok
      case _ => return None
    }
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0 ||
          img.getWidth > MaxSide || img.getHeight > MaxSide) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, px, 0, w) // ARGB, row-major top-down
        var i = 0
        while (i < px.length) { px(i) &= 0xffffff; i += 1 }
        Some(BmpCodec.Bmp(w, h, px))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode a row-major top-down 0xRRGGBB pixel array as PNG (fixture
    * generation and the mixed-corpus payload builder; the byte stream
    * is whatever the JDK encoder emits — [[decode]] recovers the exact
    * pixels, which is the only contract). */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixels ${pixels.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, pixels, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}

/** Checked-in PNG fixture generator (dev-time; the output is checked
  * in at `src/main/resources/mmpng/img_0.png`): the SAME pixel content
  * as [[BmpFixture.images]] head, in the PNG container — so the spec
  * can assert the known file decodes to the known formula. PNG encoder
  * output is JDK-specific, so unlike the BMP fixture the spec verifies
  * DECODED PIXELS against the formula, not bytes against a re-encode. */
object PngFixture {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(
      args.headOption.getOrElse("src/main/resources/mmpng"))
    java.nio.file.Files.createDirectories(dir)
    val img = BmpFixture.images.head._2
    java.nio.file.Files.write(dir.resolve("img_0.png"),
      PngCodec.encode(img.width, img.height, img.pixels))
    println(s"[pngfixture] wrote img_0.png (${img.width}x${img.height})")
  }
}

/** Magic-sniffing dispatch over the codec family — the decode seam a
  * mixed-format crawl actually needs: BMP ("BM") → [[BmpCodec]], PNG
  * signature → [[PngCodec]], JPEG SOI (FF D8 FF) → [[JpegCodec]],
  * anything else `None`. All members share the
  * bytes-in/[[BmpCodec.Bmp]]-out contract, so every downstream
  * feature extractor ([[BmpCodec.ahash64]], channel stats) is
  * format-blind: identical pixel content hashes identically whichever
  * LOSSLESS container carried it (JPEG pixels carry the format's lossy
  * boundary — see [[JpegCodec]]). */
object ImageCodecs {
  def decodeAny(bytes: Array[Byte]): Option[BmpCodec.Bmp] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      BmpCodec.decode(bytes)
    else if (JpegCodec.isJpeg(bytes)) JpegCodec.decode(bytes)
    else PngCodec.decode(bytes)
}
