package graft.operators

/** Pure-JVM codec for uncompressed 24-bit BMP (BITMAPINFOHEADER,
  * BI_RGB) — the REAL decoder behind the multimodal codec seam
  * ([[Multimodal.phashBuckets]]'s bytes-in/features-out contract): no
  * external libraries, just the published file format (BITMAPFILEHEADER
  * 14 bytes + BITMAPINFOHEADER 40 bytes + padded BGR pixel rows).
  *
  * Decode handles the format's real quirks:
  *  - rows padded to 4-byte boundaries (stride = ceil(3·w / 4) · 4);
  *  - BOTTOM-UP row order for positive `height` (the common case) and
  *    TOP-DOWN for negative height — both normalized to row-major
  *    top-down pixel output;
  *  - the pixel array located by the header's data-offset field (extra
  *    header blocks between header and pixels are skipped correctly).
  *
  * Everything is exact integer arithmetic, so the DuckDB oracle can
  * independently re-decode the same bytes (hex-string byte math over
  * `read_blob`) and the two decoders must agree bit-for-bit.
  *
  * The encoder exists for fixture generation and round-trip proof; a
  * production ingest decodes whatever the crawl provides and this
  * object is the uncompressed-format member of the codec family.
  */
object BmpCodec {

  /** Decoded image: `pixels(y*width + x)` = 0xRRGGBB, row-major,
    * top-down (orientation normalized at decode). */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Row stride: 3·width padded up to a 4-byte boundary. */
  def stride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Parse a 24bpp uncompressed BMP; `None` when the bytes are not one
    * (wrong magic, truncated, unsupported bpp/compression) — the
    * tolerant-decode convention (a corrupt payload is counted, not
    * thrown, by the callers that audit). */
  def decode(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return None
    val dataOff = le32(bytes, 10)
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || rawHeight == 0 ||
        rawHeight == Int.MinValue)
      return None
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    // Dimension sanity BEFORE any size arithmetic or allocation: a
    // crafted width near 2^30 overflows 3*width in Int, making the
    // bounds check below pass on a tiny/negative stride and the pixel
    // alloc throw — the tolerant contract is None, never throw. 2^15
    // per side (1 GiB of pixels) is far beyond any payload the byte
    // length below could admit anyway.
    if (width > (1 << 15) || height > (1 << 15))
      return None
    val rowBytes = stride(width)
    if (dataOff < 54 || dataOff.toLong + rowBytes.toLong * height
        > bytes.length)
      return None
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      // normalize to top-down: bottom-up files store row (height-1-y)
      // of the image at file row y
      val srcRow = if (topDown) y else height - 1 - y
      var x = 0
      val base = dataOff + srcRow * rowBytes
      while (x < width) {
        val b = bytes(base + 3 * x) & 0xff
        val g = bytes(base + 3 * x + 1) & 0xff
        val r = bytes(base + 3 * x + 2) & 0xff
        px(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Some(Bmp(width, height, px))
  }

  /** Encode a row-major top-down 0xRRGGBB pixel array as a standard
    * bottom-up 24bpp BMP (the exact layout [[decode]] parses back —
    * round-trip is identity, spec-pinned). */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixels ${pixels.length} != $width x $height")
    val rowBytes = stride(width)
    val dataSize = rowBytes * height
    val out = new Array[Byte](54 + dataSize)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize)    // file size
    putLe32(10, 54)              // pixel data offset
    putLe32(14, 40)              // BITMAPINFOHEADER size
    putLe32(18, width)
    putLe32(22, height)          // positive => bottom-up
    out(26) = 1                  // planes
    out(28) = 24                 // bpp
    putLe32(30, 0)               // BI_RGB
    putLe32(34, dataSize)
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y // bottom-up: file row y = image row h-1-y
      var x = 0
      val base = 54 + y * rowBytes
      while (x < width) {
        val p = pixels(srcRow * width + x)
        out(base + 3 * x) = (p & 0xff).toByte          // B
        out(base + 3 * x + 1) = ((p >> 8) & 0xff).toByte  // G
        out(base + 3 * x + 2) = ((p >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** AVERAGE perceptual hash (aHash — the mean-threshold member of the
    * pHash family) over DECODED pixels, as a 64-char bit string (the
    * same bucket-key representation as the LSH sign buckets; a packed
    * BIGINT would overflow at bit 63 in any engine):
    *
    *   1. integer grayscale per pixel: (r + g + b) / 3 (floor);
    *   2. 8×8 block average: block (i, j) covers x ∈ [i·w/8, (i+1)·w/8)
    *      × y ∈ [j·h/8, (j+1)·h/8) (integer floor boundaries — exact in
    *      SQL too), value = floor(sum / count);
    *   3. mean = floor(Σ block values / 64);
    *   4. bit (j·8 + i) = '1' iff block value > mean.
    *
    * Pure integer arithmetic end-to-end, so the DuckDB oracle replays
    * the identical hash from the same pixel formula. Requires
    * width ≥ 8 and height ≥ 8 (smaller images have empty blocks —
    * callers skip or pad them). */
  def ahash64(img: Bmp): String = {
    require(img.width >= 8 && img.height >= 8,
      s"ahash64 needs >= 8x8, got ${img.width}x${img.height}")
    val vals = new Array[Long](64)
    var j = 0
    while (j < 8) {
      val y0 = j * img.height / 8
      val y1 = (j + 1) * img.height / 8
      var i = 0
      while (i < 8) {
        val x0 = i * img.width / 8
        val x1 = (i + 1) * img.width / 8
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.pixels(y * img.width + x)
            sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        vals(j * 8 + i) = sum / ((y1 - y0).toLong * (x1 - x0))
        i += 1
      }
      j += 1
    }
    val mean = vals.sum / 64
    val bits = new Array[Char](64)
    var k = 0
    while (k < 64) {
      bits(k) = if (vals(k) > mean) '1' else '0'
      k += 1
    }
    new String(bits)
  }
}
