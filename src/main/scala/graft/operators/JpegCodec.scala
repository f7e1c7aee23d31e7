package graft.operators

/** JPEG member of the codec family behind the multimodal seam — same
  * bytes-in/[[BmpCodec.Bmp]]-out contract as [[BmpCodec.decode]] /
  * [[PngCodec.decode]], built on the JDK's own `javax.imageio` JPEG
  * reader (pure JDK, headless). This completes the crawl-image trio:
  * BMP (raw), PNG (lossless compressed), JPEG (LOSSY compressed).
  *
  * THE PIXEL-EXACTNESS BOUNDARY (the honest oracle convention): JPEG
  * decoding is DECODER-DEPENDENT — the standard fixes the bitstream,
  * not the inverse-DCT rounding, so two conformant decoders may differ
  * by ±1 per sample (and different chroma upsampling kernels by more).
  * Pixel values and pixel-derived stats therefore CANNOT be
  * cross-engine oracle facts the way BMP/PNG pixels are. What IS
  * deterministic from the container alone: the SOF frame header's
  * width/height. The `mm_jpeg_files` oracle re-parses the SAME
  * checked-in files' marker stream in SQL (an independent JPEG
  * container parser — two parsers, one file) and judges dimensions /
  * pixel counts; pixel-level behavior is covered Scala-side by
  * batch-vs-streaming decode parity and bounded-error specs against
  * the encoded content (MultimodalSpec).
  *
  * Tolerant-decode contract: `None` for anything that is not a
  * readable JPEG (wrong magic, truncated, corrupt segments, absurd
  * SOF dimensions) — a corrupt crawl payload is counted, never thrown.
  */
object JpegCodec {

  // Memory-backed ImageIO streams, not the default temp-file cache —
  // see the PngCodec init note. Set in both imageio codecs (executor
  // JVMs) and Sessions.get (driver bootstrap) so no load order leaves
  // the JVM-wide flag unset.
  javax.imageio.ImageIO.setUseCache(false)

  private val MaxSide = 1 << 15 // same dimension cap as BmpCodec/PngCodec

  /** True iff the bytes start with the JPEG SOI + marker prefix
    * (FF D8 FF). */
  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  /** (width, height) straight off the marker stream: walk the segment
    * chain from SOI to the first SOF0/1/2 frame header (big-endian
    * height at marker offset +5, width at +7). Checking dimensions
    * BEFORE `ImageIO.read` matters: a crafted SOF declaring absurd
    * dimensions would otherwise allocate the full raster inside the
    * JDK reader, and the resulting `OutOfMemoryError` escapes
    * `NonFatal` — the same alloc-before-check hole BmpCodec/PngCodec
    * close. Walking (not pattern-searching) is also what makes the
    * parse exact: an FF Cx byte pair inside a quantization table can
    * never be mistaken for a marker. */
  def sofDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (!isJpeg(bytes)) return None
    var p = 2
    var steps = 0
    while (p + 1 < bytes.length && steps < 4096) {
      steps += 1
      if ((bytes(p) & 0xff) != 0xff) return None
      val typ = bytes(p + 1) & 0xff
      if (typ == 0xff) p += 1 // fill byte
      else if (typ == 0x01 || (typ >= 0xd0 && typ <= 0xd7)) p += 2 // standalone
      else if (typ == 0xc0 || typ == 0xc1 || typ == 0xc2) {
        // SOF segment: len(2) precision(1) height(2) width(2) ...
        if (p + 8 >= bytes.length) return None
        val h = ((bytes(p + 5) & 0xff) << 8) | (bytes(p + 6) & 0xff)
        val w = ((bytes(p + 7) & 0xff) << 8) | (bytes(p + 8) & 0xff)
        return Some((w, h))
      }
      else if (typ == 0xda || typ == 0xd9) return None // SOS/EOI before SOF
      else {
        if (p + 3 >= bytes.length) return None
        val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        if (len < 2) return None
        p += 2 + len
      }
    }
    None
  }

  /** Parse JPEG bytes into the codec family's normalized form:
    * row-major top-down 0xRRGGBB pixels. Values are THIS decoder's
    * inverse-DCT output — see the pixel-exactness boundary above. */
  def decode(bytes: Array[Byte]): Option[BmpCodec.Bmp] = {
    // Pre-allocation guard: reject declared dimensions outside
    // (0, MaxSide] before the JDK reader gets a chance to allocate.
    sofDims(bytes) match {
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
        img.getRGB(0, 0, w, h, px, 0, w)
        var i = 0
        while (i < px.length) { px(i) &= 0xffffff; i += 1 }
        Some(BmpCodec.Bmp(w, h, px))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode a row-major top-down 0xRRGGBB pixel array as baseline JPEG
    * at the given quality (fixture generation; the byte stream is
    * whatever the JDK encoder emits — [[sofDims]] recovers the exact
    * dimensions, which is the oracle-checkable contract; pixels come
    * back only approximately, by design of the format). */
  def encode(width: Int, height: Int, pixels: Array[Int],
             quality: Float = 0.92f): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixels ${pixels.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, pixels, 0, width)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }
}

/** Checked-in JPEG fixture generator (dev-time; outputs checked in at
  * `src/main/resources/mmjpeg/`): three baseline JPEGs over the
  * [[BmpFixture]] pixel formula at dimensions that exercise MCU
  * geometry — 8×8 (one MCU), 9×7 (partial-MCU edges), 16×16. The spec
  * asserts the checked-in BYTES are stable (self-verifying against
  * bit-rot) and that decoded pixels sit within the documented lossy
  * tolerance of the encoded content; the registry oracle re-parses the
  * files' SOF headers in SQL. */
object JpegFixture {
  val sizes: Seq[(Int, Int)] = Seq((8, 8), (9, 7), (16, 16))

  /** name → the EXACT pixel content that was encoded (decode recovers
    * it only approximately — the JPEG boundary). Deliberately SMOOTH
    * gradients (no modular wrap: every channel stays < 256 across the
    * fixture dimensions), so the lossy round-trip error the spec
    * bounds is the codec's DCT quantization, not ringing at artificial
    * 255→0 content discontinuities a crawl image wouldn't have. */
  lazy val sources: Seq[(String, BmpCodec.Bmp)] =
    sizes.zipWithIndex.map { case ((w, h), k) =>
      s"img_$k.jpg" -> BmpCodec.Bmp(w, h,
        Array.tabulate(w * h) { i =>
          val (x, y) = (i % w, i / w)
          val r = k * 37 + x * 6 + y * 3
          val g = k * 19 + x * 4 + y * 5
          val b = k * 11 + x * 7 + y * 2
          (r << 16) | (g << 8) | b
        })
    }

  val fileNames: Seq[String] = sizes.indices.map(k => s"img_$k.jpg")

  /** Fixture root as a `file:`-readable directory — classpath copy on
    * disk, or a one-time temp extraction when packaged in a jar. */
  lazy val root: String = {
    val url = getClass.getResource("/mmjpeg")
    if (url != null && url.getProtocol == "file") url.toString
    else {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mmjpeg")
      fileNames.foreach { name =>
        val in = getClass.getResourceAsStream(s"/mmjpeg/$name")
        require(in != null, s"missing resource /mmjpeg/$name")
        try java.nio.file.Files.copy(in, tmp.resolve(name))
        finally in.close()
      }
      tmp.toUri.toString
    }
  }

  /** Fixture generator: `runMain graft.operators.JpegFixture <dir>`. */
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(
      args.headOption.getOrElse("src/main/resources/mmjpeg"))
    java.nio.file.Files.createDirectories(dir)
    sources.foreach { case (name, img) =>
      java.nio.file.Files.write(dir.resolve(name),
        JpegCodec.encode(img.width, img.height, img.pixels))
      println(s"[jpegfixture] wrote $name (${img.width}x${img.height})")
    }
  }
}
