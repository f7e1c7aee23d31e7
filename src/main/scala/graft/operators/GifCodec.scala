package graft.operators

/** MULTI-FRAME image member of the pure-JVM codec family
  * ([[BmpCodec]]/[[PngCodec]] cover still images, [[WavCodec]] audio):
  * animated GIF decode through `javax.imageio`'s native GIF reader,
  * with the container walked INDEPENDENTLY first — the frame-sampling
  * seam (bytes in, per-frame features out) over a real multi-frame
  * container.
  *
  * Honest oracle boundary (the [[JpegCodec]] convention, adapted):
  * GIF's LZW pixel stream is not reasonably re-decodable in SQL, so
  * the oracle-checked columns are the CONTAINER facts — logical-screen
  * dimensions, frame count, per-frame delays — re-parsed from the same
  * checked-in files by an independent SQL block walker (recursive CTE
  * over the sub-block chain). Pixel-level behavior is spec-covered
  * Scala-side, and UNLIKE JPEG it is exact: the fixture frames are
  * palette-indexed, GIF stores palettes losslessly, so decoded pixels
  * must equal the encoded formula bit-for-bit (MultimodalSpec).
  *
  * Frame semantics: frames are decoded as STORED rasters (each image
  * descriptor's own rectangle), not composited through disposal
  * methods — the right contract for frame-level feature extraction
  * (hashing a stored frame is deterministic; compositing policy is a
  * renderer concern). The fixture writes full-screen frames, where the
  * two notions coincide.
  *
  * Corrupt-tolerance contract (crawl posture, as the sibling codecs):
  * `decode` returns None on anything that is not a well-formed GIF —
  * wrong magic, truncated block chain, absurd declared dimensions or
  * frame counts (checked BEFORE `ImageIO` gets a chance to allocate),
  * reader errors — counted, never thrown.
  */
object GifCodec {

  // Memory-backed ImageIO streams — see the PngCodec init note (also
  // set in Sessions.get; class-load here is the executor-side cover).
  javax.imageio.ImageIO.setUseCache(false)

  private val MaxSide = 1 << 15 // dimension cap shared with the family
  /** Frame-count cap: a crafted block chain declaring millions of
    * frames must be rejected before the reader loops over them. */
  val MaxFrames = 1024

  final case class GifFacts(width: Int, height: Int, nFrames: Int,
                            delaysCs: Vector[Int])
  final case class Gif(width: Int, height: Int,
                       frames: Vector[BmpCodec.Bmp],
                       delaysCs: Vector[Int])

  /** True iff the bytes start with the GIF87a/GIF89a signature. */
  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Walk the container WITHOUT decoding pixels: logical-screen
    * dimensions off the descriptor, then the block chain (extensions
    * with their sub-block chains, image descriptors with their local
    * color tables and LZW sub-block chains) to the trailer — frame
    * count = image descriptors seen, delays = the Graphic Control
    * Extension preceding each descriptor (0 when a frame has none).
    * None on any structural violation: this is both the corrupt-page
    * gate and the pre-allocation guard ([[BmpCodec]]'s
    * dims-before-alloc discipline, lifted to a block chain). */
  def containerFacts(bytes: Array[Byte]): Option[GifFacts] = {
    if (!isGif(bytes) || bytes.length < 13) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    val w = u8(6) | (u8(7) << 8)
    val h = u8(8) | (u8(9) << 8)
    if (w <= 0 || h <= 0 || w > MaxSide || h > MaxSide) return None
    val gctSize = if ((u8(10) & 0x80) != 0) 3 * (1 << ((u8(10) & 7) + 1))
                  else 0
    var p = 13 + gctSize
    var frames = 0
    var pendingDelay = 0
    val delays = Vector.newBuilder[Int]
    // Sub-block chain: length-prefixed runs ending at a 0 terminator.
    def skipSubBlocks(start: Int): Int = {
      var q = start
      while (q < bytes.length && u8(q) != 0) q += 1 + u8(q)
      if (q >= bytes.length) -1 else q + 1
    }
    while (p < bytes.length) {
      u8(p) match {
        case 0x3b => // trailer
          return Some(GifFacts(w, h, frames, delays.result()))
        case 0x21 => // extension: label byte, then sub-blocks
          if (p + 2 >= bytes.length) return None
          if (u8(p + 1) == 0xf9 && u8(p + 2) == 4 && p + 6 < bytes.length)
            pendingDelay = u8(p + 4) | (u8(p + 5) << 8)
          p = skipSubBlocks(p + 2)
          if (p < 0) return None
        case 0x2c => // image descriptor
          if (p + 10 >= bytes.length) return None
          frames += 1
          if (frames > MaxFrames) return None
          delays += pendingDelay
          pendingDelay = 0
          val fw = u8(p + 5) | (u8(p + 6) << 8)
          val fh = u8(p + 7) | (u8(p + 8) << 8)
          if (fw <= 0 || fh <= 0 || fw > MaxSide || fh > MaxSide)
            return None
          val lct = if ((u8(p + 9) & 0x80) != 0)
            3 * (1 << ((u8(p + 9) & 7) + 1)) else 0
          // + descriptor(10) + LCT + LZW min-code byte, then sub-blocks
          p = skipSubBlocks(p + 10 + lct + 1)
          if (p < 0) return None
        case _ => return None
      }
    }
    None // ran past the end without a trailer
  }

  /** Decode every frame through the JDK GIF reader, container-walked
    * first (facts double as the pre-allocation guard). Frames are
    * normalized to the family's row-major 0xRRGGBB form. */
  def decode(bytes: Array[Byte]): Option[Gif] =
    containerFacts(bytes).flatMap { facts =>
      var iis: javax.imageio.stream.ImageInputStream = null
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n != facts.nFrames) None // two parsers must agree
        else {
          val frames = (0 until n).map { i =>
            val img = reader.read(i)
            val (fw, fh) = (img.getWidth, img.getHeight)
            val px = new Array[Int](fw * fh)
            img.getRGB(0, 0, fw, fh, px, 0, fw)
            var j = 0
            while (j < px.length) { px(j) &= 0xffffff; j += 1 }
            BmpCodec.Bmp(fw, fh, px)
          }.toVector
          Some(Gif(facts.width, facts.height, frames, facts.delaysCs))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally {
        reader.dispose()
        if (iis != null) iis.close()
      }
    }

  /** Encode an animated GIF (fixture generation): one indexed frame
    * per pixel array, all sharing `palette` (GIF stores palettes
    * losslessly — the exact-pixel round-trip the spec asserts), each
    * with its Graphic Control Extension delay in hundredths. */
  def encode(width: Int, height: Int, frames: Seq[Array[Int]],
             delaysCs: Seq[Int], palette: Array[Int]): Array[Byte] = {
    require(frames.nonEmpty && frames.size == delaysCs.size)
    require(palette.length <= 256)
    val bits = math.max(1,
      32 - Integer.numberOfLeadingZeros(palette.length - 1))
    val cm = new java.awt.image.IndexColorModel(bits, palette.length,
      palette.map(c => ((c >> 16) & 0xff).toByte),
      palette.map(c => ((c >> 8) & 0xff).toByte),
      palette.map(c => (c & 0xff).toByte))
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.zip(delaysCs).foreach { case (px, delay) =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        img.setRGB(0, 0, width, height,
          px.map(i => palette(i) | 0xff000000), 0, width)
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), null)
        val fmt = meta.getNativeMetadataFormatName
        val tree = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = {
          val kids = tree.getElementsByTagName("GraphicControlExtension")
          if (kids.getLength > 0)
            kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val n = new javax.imageio.metadata.IIOMetadataNode(
              "GraphicControlExtension")
            tree.appendChild(n); n
          }
        }
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", delay.toString)
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }
}

/** Checked-in animated-GIF fixture generator (dev-time; outputs checked
  * in at `src/main/resources/mmgif/`): three animations over a shared
  * deterministic 256-color palette — 8×8×3 frames, 10×6×4, 16×16×2 —
  * with per-frame delays from a closed formula. Palette-indexed frames
  * make the pixel round-trip EXACT (the spec asserts decoded pixels ==
  * the index formula through the palette); the registry oracle walks
  * the files' block structure in SQL for screen dims / frame count /
  * delays. */
object GifFixture {
  /** (width, height, frames) per file. */
  val shapes: Seq[(Int, Int, Int)] = Seq((8, 8, 3), (10, 6, 4), (16, 16, 2))

  /** Deterministic shared palette — arbitrary but fixed. */
  lazy val palette: Array[Int] = Array.tabulate(256)(j =>
    (((j * 37) % 256) << 16) | (((j * 59) % 256) << 8) | ((j * 83) % 256))

  /** Palette index at (file k, frame f, x, y) — arbitrary but fixed. */
  def index(k: Int, f: Int, x: Int, y: Int): Int =
    (k * 31 + f * 17 + x * 5 + y * 13) % 256

  /** Per-frame delay in hundredths (file k, frame f). */
  def delayCs(k: Int, f: Int): Int = 10 * (k + 1) + f

  /** name → (dims, per-frame palette-index arrays, delays). */
  lazy val sources: Seq[(String, (Int, Int, Seq[Array[Int]], Seq[Int]))] =
    shapes.zipWithIndex.map { case ((w, h, nf), k) =>
      val frames = (0 until nf).map(f =>
        Array.tabulate(w * h)(i => index(k, f, i % w, i / w)))
      val delays = (0 until nf).map(f => delayCs(k, f))
      s"anim_$k.gif" -> ((w, h, frames: Seq[Array[Int]],
        delays: Seq[Int]))
    }

  val fileNames: Seq[String] = shapes.indices.map(k => s"anim_$k.gif")

  /** Fixture root as a `file:`-readable directory — classpath copy on
    * disk, or a one-time temp extraction when packaged in a jar. */
  lazy val root: String = {
    val url = getClass.getResource("/mmgif")
    if (url != null && url.getProtocol == "file") url.toString
    else {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mmgif")
      fileNames.foreach { name =>
        val in = getClass.getResourceAsStream(s"/mmgif/$name")
        require(in != null, s"missing resource /mmgif/$name")
        try java.nio.file.Files.copy(in, tmp.resolve(name))
        finally in.close()
      }
      tmp.toUri.toString
    }
  }

  /** Fixture generator: `runMain graft.operators.GifFixture <dir>`. */
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(
      args.headOption.getOrElse("src/main/resources/mmgif"))
    java.nio.file.Files.createDirectories(dir)
    sources.foreach { case (name, (w, h, frames, delays)) =>
      java.nio.file.Files.write(dir.resolve(name),
        GifCodec.encode(w, h, frames, delays, palette))
      println(s"[giffixture] wrote $name (${w}x$h, ${frames.size} frames)")
    }
  }
}
