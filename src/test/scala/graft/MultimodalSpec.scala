package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: payload/metadata schema, batched
  * stub decode, frame sampling — including true byte (not char)
  * semantics for multi-byte UTF-8. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("payload schema: binary + typed metadata struct") {
    val df = Multimodal.asBinaryPayload(docs(0L -> "abc", 5L -> "xyz"),
      "doc_id", "text")
    assert(df.schema("payload").dataType.typeName == "binary")
    val r = df.orderBy("doc_id").collect()
    assert(r(0).getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("format") == "png")
    assert(r(1).getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("format") == "webp") // 5 % 3 = 2 → third entry
    assert(r(1).getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Long]("width") == 64 + 5 * 16)
  }

  test("extractMeta counts BYTES, not chars (UTF-8 multi-byte)") {
    val df = Multimodal.extractMeta(
      Multimodal.asBinaryPayload(docs(1L -> "café"), "doc_id", "text"))
    val r = df.collect().head
    assert(r.getAs[Long]("n_bytes") == 5L) // é is 2 bytes
    // first 4 BYTES: 'c','a','f', then é's lead byte 0xc3
    assert(r.getAs[String]("magic_hex") == "636166c3")
  }

  test("FakeCodec decode: deterministic byte stats") {
    assert(Multimodal.FakeCodec.decode("abc".getBytes("UTF-8")) ==
      (3L, 97L + 98L + 99L, 97L, 99L))
    assert(Multimodal.FakeCodec.decode(Array.emptyByteArray) ==
      (0L, 0L, 0L, 0L))
  }

  test("decodeFeatures matches single-node decode over every row") {
    val data = docs(1L -> "hello", 2L -> "Spark!", 3L -> "café au lait")
    val got = Multimodal.decodeFeatures(
      Multimodal.asBinaryPayload(data, "doc_id", "text"))
      .orderBy("doc_id").collect()
    val want = Seq("hello", "Spark!", "café au lait")
      .map(s => Multimodal.FakeCodec.decode(s.getBytes("UTF-8")))
    got.zip(want).foreach { case (r, (n, s, mn, mx)) =>
      assert(r.getAs[Long]("n_bytes") == n)
      assert(r.getAs[Long]("byte_sum") == s)
      assert(r.getAs[Long]("byte_min") == mn)
      assert(r.getAs[Long]("byte_max") == mx)
    }
  }

  test("frameSample: stride boundaries and md5 stability") {
    val text = "x" * 130 // 130 bytes → frames at 0, 64, 128 → 3 frames
    val df = Multimodal.frameSample(
      Multimodal.asBinaryPayload(docs(1L -> text, 2L -> "short"),
        "doc_id", "text"))
    val r = df.orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_frames") == 3L)
    assert(r(1).getAs[Long]("n_frames") == 1L)
    val frames = r(0).getSeq[String](2)
    assert(frames.size == 3)
    // frame 0 and 1 are identical 16-x slices; frame 2 is the 2-byte tail
    assert(frames(0) == frames(1))
    assert(frames(2) != frames(0))
    // md5 of "x"*16 — fixed expected value guards the hash plumbing
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = md.digest(("x" * 16).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(frames(0) == exp)
  }

  test("frameSample: empty payload yields 0 frames, not sequence(0,-1)") {
    val r = Multimodal.frameSample(
      Multimodal.asBinaryPayload(docs(1L -> "", 2L -> "a"),
        "doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_frames") == 0L)
    assert(r(0).getSeq[String](2).isEmpty) // oracle range(0,0) parity
    assert(r(1).getAs[Long]("n_frames") == 1L)
    assert(r(1).getSeq[String](2).size == 1)
  }

  test("contentDedup keeps the lowest id per identical payload") {
    val r = Multimodal.contentDedup(
      Multimodal.asBinaryPayload(
        docs(1L -> "same", 2L -> "same", 3L -> "other"),
        "doc_id", "text"))
      .orderBy("doc_id")
      .select("doc_id", "n_copies", "keep")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 2L, 1L), (2L, 2L, 0L), (3L, 1L, 1L)))
  }

  test("phashBuckets co-buckets payloads with matching coarse bands; " +
      "empty payload is a valid bucket") {
    // "aaaa" and "aaab" share (len div 64 = 0, sum div 4096 = 0) with
    // every short string — all three docs land in one bucket; the
    // empty payload (sum 0, len 0) lands there too.
    val r = Multimodal.phashBuckets(
      Multimodal.asBinaryPayload(
        docs(1L -> "aaaa", 2L -> "aaab", 3L -> ""),
        "doc_id", "text"))
      .orderBy("doc_id")
      .select("doc_id", "n_bucket", "is_candidate")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 1L)),
      s"got ${r.toSeq}")
  }

  test("phashBuckets codec seam: a second codec over a DIFFERENT byte " +
      "layout swaps in and changes which docs co-bucket — banding and " +
      "bucket-join are codec-agnostic") {
    import spark.implicits._
    // Codec 2: payload is little-endian u16 values (a different byte
    // layout than FakeCodec's raw byte stream) — same
    // bytes-in/features-out contract: (doc_id, n_bytes, byte_sum).
    def u16Decode(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val vals = bytes.grouped(2).map(p =>
            (p(0) & 0xff) + (if (p.length > 1) (p(1) & 0xff) << 8 else 0))
          (id, (bytes.length / 2).toLong, vals.map(_.toLong).sum)
        })
        .toDF("doc_id", "n_bytes", "byte_sum")
    // A=[0x00,0x01] u16=256 bytesum=1; B=[0xFF,0x01] u16=511
    // bytesum=256; C=[0x07,0x07] u16=1799 bytesum=14. With
    // sizeBand=1, sumBand=256: FakeCodec co-buckets {A,C} (byte sums
    // 1,14 → band 0; B's 256 → band 1); the u16 codec co-buckets
    // {A,B} (sums 256,511 → band 1; C's 1799 → band 7).
    val payloads = Seq(
      1L -> Array[Byte](0x00, 0x01),
      2L -> Array[Byte](0xFF.toByte, 0x01),
      3L -> Array[Byte](0x07, 0x07)).toDF("doc_id", "payload")
    def candidates(decode: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Set[Long] =
      Multimodal.phashBuckets(payloads, sizeBand = 1, sumBand = 256,
          decode = decode)
        .where(col("is_candidate") === 1L)
        .select("doc_id").as[Long].collect().toSet
    assert(candidates(Multimodal.decodeFeatures) == Set(1L, 3L))
    assert(candidates(u16Decode) == Set(1L, 2L))
  }

  // ------------------------------------------------------------------
  // Real codec: BmpCodec (24bpp uncompressed BMP, pure JVM)
  // ------------------------------------------------------------------
  import graft.operators.{BmpCodec, BmpFixture}

  test("BmpCodec round-trip is identity across padding widths and " +
      "non-square shapes") {
    for ((w, h) <- Seq((8, 8), (5, 3), (6, 2), (7, 2), (16, 16), (1, 1))) {
      val px = Array.tabulate(w * h)(i => (i * 997 + 13) % (1 << 24))
      val back = BmpCodec.decode(BmpCodec.encode(w, h, px))
      assert(back.isDefined, s"${w}x$h must decode")
      assert(back.get.width == w && back.get.height == h)
      assert(back.get.pixels.toSeq == px.toSeq, s"${w}x$h pixels")
    }
  }

  test("BmpCodec decode: HAND-BUILT 2x2 bottom-up file with row " +
      "padding — known bytes to known pixels") {
    // 2x2, 24bpp: stride = ceil(6/4)*4 = 8 → 2 pad bytes per row.
    // File rows are BOTTOM-UP: file row 0 = image row 1.
    // image: (0,0)=red (1,0)=green / (0,1)=blue (1,1)=white
    val bytes = Array.concat(
      Array[Byte]('B', 'M'),
      le32(70), le32(0), le32(54),          // size, reserved, data offset
      le32(40), le32(2), le32(2),           // header size, w, h (+: bottom-up)
      Array[Byte](1, 0, 24, 0),             // planes, bpp
      le32(0), le32(16),                    // BI_RGB, data size
      le32(0), le32(0), le32(0), le32(0),   // dpi + palette fields
      // file row 0 (image row 1): blue(BGR FF 00 00), white, pad pad
      Array[Byte](-1, 0, 0, -1, -1, -1, 0, 0),
      // file row 1 (image row 0): red(00 00 FF), green(00 FF 00), pad
      Array[Byte](0, 0, -1, 0, -1, 0, 0, 0))
    val img = BmpCodec.decode(bytes).get
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq ==
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
  }

  test("BmpCodec decode: TOP-DOWN (negative height) rows are not " +
      "mirrored") {
    val px = Array(0x111111, 0x222222, 0x333333, 0x444444)
    val bu = BmpCodec.encode(2, 2, px)
    // flip height to -2 and swap the two 8-byte rows → same image
    val td = bu.clone()
    val neg = le32(-2); System.arraycopy(neg, 0, td, 22, 4)
    val row = new Array[Byte](8)
    System.arraycopy(td, 54, row, 0, 8)
    System.arraycopy(td, 62, td, 54, 8)
    System.arraycopy(row, 0, td, 62, 8)
    assert(BmpCodec.decode(td).get.pixels.toSeq == px.toSeq)
  }

  test("BmpCodec.decode rejects non-BMP and truncated payloads " +
      "instead of throwing") {
    assert(BmpCodec.decode("not an image".getBytes).isEmpty)
    assert(BmpCodec.decode(Array.empty[Byte]).isEmpty)
    val good = BmpCodec.encode(4, 4, Array.fill(16)(0x123456))
    assert(BmpCodec.decode(good.take(40)).isEmpty)       // truncated header
    assert(BmpCodec.decode(good.dropRight(5)).isEmpty)   // truncated pixels
  }

  test("BmpCodec.decode rejects CRAFTED overflow headers (width near " +
      "2^30, huge height, Int.MinValue height) — None, never throw") {
    // width = 0x40000000: 3*width overflows Int to a tiny/negative
    // stride, which without the dimension cap passed the bounds check
    // and blew up in the pixel alloc. The tolerant contract is None.
    def craft(width: Int, height: Int): Array[Byte] = {
      val b = BmpCodec.encode(4, 4, Array.fill(16)(0))
      def putLe32(off: Int, v: Int): Unit = {
        b(off) = (v & 0xff).toByte
        b(off + 1) = ((v >> 8) & 0xff).toByte
        b(off + 2) = ((v >> 16) & 0xff).toByte
        b(off + 3) = ((v >> 24) & 0xff).toByte
      }
      putLe32(18, width); putLe32(22, height)
      b
    }
    assert(BmpCodec.decode(craft(0x40000000, 4)).isEmpty)
    assert(BmpCodec.decode(craft(0x55555557, 3)).isEmpty)
    assert(BmpCodec.decode(craft(4, 0x40000000)).isEmpty)
    assert(BmpCodec.decode(craft(4, Int.MinValue)).isEmpty)
    assert(BmpCodec.decode(craft(65536, 65536)).isEmpty)
  }

  test("ahash64: hand-computable 8x8 image — left half bright, right " +
      "half dark") {
    // gray: left 4 columns (r=g=b=200), right 4 (r=g=b=10).
    // mean = (32*200 + 32*10)/64 = 105 → bits: 1 for bright, 0 for dark.
    val px = Array.tabulate(64)(i =>
      if (i % 8 < 4) 0xc8c8c8 else 0x0a0a0a)
    val h = BmpCodec.ahash64(BmpCodec.Bmp(8, 8, px))
    assert(h == "1111000011110000111100001111000011110000111100001111000011110000")
  }

  test("ahash64: 16x16 block averages — each 2x2 block averages with " +
      "integer floor") {
    // Block (0,0)'s four pixels have grays 10,11,12,13 → avg floor 11;
    // all other pixels gray 100 → their blocks avg 100; mean =
    // (11 + 63*100)/64 = 98 (floor) → only block (0,0) is <= mean → 0,
    // others 1.
    val px = Array.fill(256)(0x646464) // gray 100
    def set(x: Int, y: Int, g: Int): Unit =
      px(y * 16 + x) = (g << 16) | (g << 8) | g
    set(0, 0, 10); set(1, 0, 11); set(0, 1, 12); set(1, 1, 13)
    val h = BmpCodec.ahash64(BmpCodec.Bmp(16, 16, px))
    assert(h == "0" + "1" * 63)
  }

  test("identical images share the ahash bucket; different images " +
      "do not (mod-500 payload collisions)") {
    import spark.implicits._
    // ids 1 and 501 carry the same image (1 % 500 == 501 % 500)
    val ids = Seq(1L, 2L, 501L).toDF("doc_id")
    val out = Multimodal.ahashBuckets(
      Multimodal.asBmpPayload(ids, "doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("phash"), r.getAs[Long]("is_candidate"))).toMap
    assert(out(1L)._1 == out(501L)._1)
    assert(out(1L)._2 == 1L && out(501L)._2 == 1L)
    assert(out(2L)._2 == 0L && out(2L)._1 != out(1L)._1)
    assert(out.values.forall(_._1.matches("[01]{64}")))
  }

  test("checked-in fixture files equal the re-encoded definition " +
      "(self-verifying against bit-rot) and decode to themselves") {
    for ((name, img) <- BmpFixture.images) {
      val onDisk = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(
          java.net.URI.create(s"${BmpFixture.root}/$name")))
      assert(onDisk.toSeq ==
        BmpCodec.encode(img.width, img.height, img.pixels).toSeq,
        s"$name bytes drifted from BmpFixture.images")
      assert(BmpCodec.decode(onDisk).get.pixels.toSeq ==
        img.pixels.toSeq, s"$name decode")
    }
  }

  // -----------------------------------------------------------------
  // PNG codec (javax.imageio member of the codec family)
  // -----------------------------------------------------------------

  import graft.operators.{ImageCodecs, PngCodec}

  test("PngCodec round-trip is identity (pixels, not bytes) across " +
      "sizes, and the KNOWN checked-in PNG decodes to the BMP " +
      "fixture's pixel formula") {
    for ((w, h) <- Seq((8, 8), (5, 3), (16, 16))) {
      val px = Array.tabulate(w * h)(i => (i * 2654435761L % 0x1000000L).toInt)
      val back = PngCodec.decode(PngCodec.encode(w, h, px))
      assert(back.isDefined, s"${w}x$h must decode")
      assert(back.get.width == w && back.get.height == h)
      assert(back.get.pixels.toSeq == px.toSeq, s"${w}x$h pixels")
    }
    // known file: img_0.png carries BmpFixture.images(0)'s exact pixels
    val in = getClass.getResourceAsStream("/mmpng/img_0.png")
    assert(in != null, "missing checked-in /mmpng/img_0.png")
    val bytes = try in.readAllBytes() finally in.close()
    val img = PngCodec.decode(bytes).get
    val ref = BmpFixture.images.head._2
    assert(img.width == ref.width && img.height == ref.height)
    assert(img.pixels.toSeq == ref.pixels.toSeq,
      "checked-in PNG pixels drifted from the fixture formula")
  }

  test("PngCodec.decode rejects non-PNG, truncated, and corrupt " +
      "payloads — None, never throw") {
    assert(PngCodec.decode("not an image".getBytes).isEmpty)
    assert(PngCodec.decode(Array.empty[Byte]).isEmpty)
    val good = PngCodec.encode(4, 4, Array.fill(16)(0x123456))
    assert(PngCodec.decode(good.take(10)).isEmpty)  // truncated chunks
    val corrupt = good.clone(); corrupt(20) = (corrupt(20) ^ 0xff).toByte
    // flipped IHDR height byte: the tolerant contract is "must not
    // throw" — not-throwing IS the assertion (the result may be None
    // via the dimension pre-check or CRC failure, or Some if the JDK
    // reader ignores the CRC; both honor the contract)
    val _ = PngCodec.decode(corrupt)
    // BMP bytes are not a PNG
    assert(PngCodec.decode(BmpCodec.encode(4, 4,
      Array.fill(16)(0))).isEmpty)
    // crafted absurd IHDR dims must be rejected BEFORE any raster
    // allocation (the alloc-before-check hole): declare 2^30 x 2^30
    val huge = good.clone()
    huge(16) = 0x40; huge(17) = 0; huge(18) = 0; huge(19) = 0  // width
    huge(20) = 0x40; huge(21) = 0; huge(22) = 0; huge(23) = 0  // height
    assert(PngCodec.decode(huge).isEmpty)
    // zero/negative declared dims likewise rejected by the pre-check
    val zero = good.clone()
    zero(16) = 0; zero(17) = 0; zero(18) = 0; zero(19) = 0
    assert(PngCodec.decode(zero).isEmpty)
  }

  test("ImageCodecs.decodeAny dispatches on magic: same pixels through " +
      "BMP and PNG containers hash identically (format-blind aHash)") {
    val px = Array.tabulate(64) { i =>
      val r = (31 + i * 7) % 256; val g = (17 + i * 13) % 256
      val b = (29 + i * 3) % 256; (r << 16) | (g << 8) | b
    }
    val viaBmp = ImageCodecs.decodeAny(BmpCodec.encode(8, 8, px)).get
    val viaPng = ImageCodecs.decodeAny(PngCodec.encode(8, 8, px)).get
    assert(viaBmp.pixels.toSeq == viaPng.pixels.toSeq)
    assert(BmpCodec.ahash64(viaBmp) == BmpCodec.ahash64(viaPng))
    assert(ImageCodecs.decodeAny("garbage".getBytes).isEmpty)
  }

  test("mixed BMP+PNG corpus through decodeAny == all-BMP corpus " +
      "through BmpCodec (the mm_phash_mixed contract)") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 501L, 502L).toDF("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("phash"), r.getAs[Long]("n_bucket"),
          r.getAs[Long]("is_candidate"))).toMap
    val bmpOnly = rows(Multimodal.ahashBuckets(
      Multimodal.asBmpPayload(ids, "doc_id")))
    val mixed = rows(Multimodal.ahashBuckets(
      Multimodal.asMixedImagePayload(ids, "doc_id"),
      decode = ImageCodecs.decodeAny))
    assert(mixed == bmpOnly)
    assert(mixed(1L)._1 == mixed(501L)._1 && mixed(1L)._3 == 1L)
  }

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  // -----------------------------------------------------------------
  // WAV codec (audio member of the codec family)
  // -----------------------------------------------------------------

  import graft.operators.{WavCodec, WavFixture}

  test("WavCodec round-trip is identity across mono/stereo and rates") {
    for ((rate, ch, frames) <- WavFixture.shapes) {
      val pcm = Array.tabulate(frames * ch)(i =>
        (((i * 8191 + 7) % 65536) - 32768).toShort)
      val back = WavCodec.decode(WavCodec.encode(rate, ch, pcm)).get
      assert(back.sampleRate == rate && back.channels == ch)
      assert(back.samples.toSeq == pcm.toSeq, s"$rate/$ch/$frames")
    }
  }

  test("WavCodec chunk walk: an extra ODD-sized chunk between fmt and " +
      "data is skipped with its word-align pad byte") {
    val pcm = Array.tabulate(16)(i => (i * 1000 - 8000).toShort)
    val canonical = WavCodec.encode(8000, 1, pcm)
    // splice a 5-byte LIST chunk (odd size → 1 pad byte) before data
    val extra = "LIST".getBytes ++ le32(5) ++
      Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = canonical.slice(0, 36) ++ extra ++
      canonical.drop(36)
    // RIFF size field now stale — decode must not depend on it
    val w = WavCodec.decode(spliced).get
    assert(w.sampleRate == 8000 && w.channels == 1)
    assert(w.samples.toSeq == pcm.toSeq)
    // WITHOUT the pad byte the data tag lands off-word → not found
    val unpadded = canonical.slice(0, 36) ++
      ("LIST".getBytes ++ le32(5) ++ Array[Byte](1, 2, 3, 4, 5)) ++
      canonical.drop(36)
    assert(WavCodec.decode(unpadded).isEmpty)
  }

  test("WavCodec.decode rejects non-WAV, truncated, non-PCM, 8-bit, " +
      "and crafted-size payloads (None, never throw)") {
    val pcm = Array.tabulate(8)(i => (i * 3).toShort)
    val good = WavCodec.encode(8000, 1, pcm)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(WavCodec.decode("not audio at all".getBytes).isEmpty)
    assert(WavCodec.decode(good.dropRight(3)).isEmpty) // truncated data
    val nonPcm = good.clone(); nonPcm(20) = 3          // IEEE float fmt
    assert(WavCodec.decode(nonPcm).isEmpty)
    val eightBit = good.clone(); eightBit(34) = 8
    assert(WavCodec.decode(eightBit).isEmpty)
    val threeCh = good.clone(); threeCh(22) = 3
    assert(WavCodec.decode(threeCh).isEmpty)
    // crafted data-size field far beyond the buffer: truncated-chunk
    // check must reject BEFORE any allocation
    val crafted = good.clone()
    le32(0x7fffffff).copyToArray(crafted, 40)
    assert(WavCodec.decode(crafted).isEmpty)
  }

  test("WavCodec.features: hand-computed frames/duration/energy/peak " +
      "and CHANNEL-0 zero crossings on a stereo signal") {
    // stereo: ch0 = [+1, -1, +2, -2], ch1 = all negative (must not
    // contribute crossings); 3 sign flips in ch0
    val pcm = Array[Short](1, -9, -1, -9, 2, -9, -2, -9)
    val w = WavCodec.Wav(1000, 2, pcm)
    val (frames, ms, energy, peak, zc) = WavCodec.features(w)
    assert(frames == 4L)
    assert(ms == 4L)                       // 4 frames / 1000 Hz
    assert(energy == (1 + 1 + 4 + 4 + 4 * 81).toLong)
    assert(peak == 9L)
    assert(zc == 3L)
  }

  test("checked-in WAV fixture files equal the re-encoded definition " +
      "(self-verifying against bit-rot) and decode to themselves") {
    for ((name, w) <- WavFixture.waves) {
      val onDisk = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(
          java.net.URI.create(s"${WavFixture.root}/$name")))
      assert(onDisk.toSeq ==
        WavCodec.encode(w.sampleRate, w.channels, w.samples).toSeq,
        s"$name bytes drifted from WavFixture.waves")
      val back = WavCodec.decode(onDisk).get
      assert(back.samples.toSeq == w.samples.toSeq, s"$name decode")
    }
  }

  test("decodeWavFeatures: distributed decode matches single-node " +
      "WavCodec.features row-for-row; corrupt payload yields the " +
      "(-1, ...) marker") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 500L).toDF("doc_id")
    val out = Multimodal.decodeWavFeatures(
      Multimodal.asWavPayload(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 500L)) {
      val s = (id % 500).toInt
      val n = (64 + (id % 5) * 16).toInt
      val pcm = Array.tabulate(n)(i =>
        (((s * 37 + i * 8191) % 65536) - 32768).toShort)
      val w = WavCodec.Wav(8000, 1, pcm)
      val (frames, ms, energy, peak, zc) = WavCodec.features(w)
      assert(out(id) == Seq(8000L, 1L, frames, ms, energy, peak, zc),
        s"id $id")
    }
    assert(out(0L) == out(500L), "seed collision mod 500")
    val corrupt = Seq((9L, "not audio".getBytes))
      .toDF("doc_id", "payload")
    val marker = Multimodal.decodeWavFeatures(corrupt).collect().head
    assert(marker.toSeq.drop(1) == Seq.fill(7)(-1L))
  }

  // -------------------------------------------------------------------
  // JPEG codec member (the lossy corner of the crawl-image trio)
  // -------------------------------------------------------------------
  import graft.operators.{JpegCodec, JpegFixture}

  test("JpegCodec: checked-in fixture files decode to the declared " +
      "dimensions, with lossy pixel error inside the documented bound") {
    for ((name, src) <- JpegFixture.sources) {
      val in = getClass.getResourceAsStream(s"/mmjpeg/$name")
      assert(in != null, s"missing checked-in /mmjpeg/$name")
      val bytes = try in.readAllBytes() finally in.close()
      // container facts are exact (the oracle-checkable surface)
      assert(JpegCodec.sofDims(bytes).contains((src.width, src.height)))
      val img = JpegCodec.decode(bytes).get
      assert(img.width == src.width && img.height == src.height)
      // pixels are the JPEG boundary: bounded error, never equality —
      // smooth-gradient content at q=0.92 stays well inside ±32/channel
      // (DCT quantization, no content discontinuities by construction)
      var maxErr = 0; var sumErr = 0L
      for (i <- src.pixels.indices; shift <- Seq(16, 8, 0)) {
        val e = math.abs(((img.pixels(i) >> shift) & 0xff) -
          ((src.pixels(i) >> shift) & 0xff))
        maxErr = math.max(maxErr, e); sumErr += e
      }
      val meanErr = sumErr.toDouble / (src.pixels.length * 3)
      info(f"$name: maxErr=$maxErr meanErr=$meanErr%.2f")
      assert(maxErr <= 32, s"$name lossy error $maxErr exceeds bound")
      assert(meanErr <= 8.0, s"$name mean error $meanErr exceeds bound")
    }
  }

  test("JpegCodec.decode rejects non-JPEG, truncated, and " +
      "absurd-SOF payloads — None, never throw; dims checked " +
      "BEFORE any raster allocation") {
    assert(JpegCodec.decode("not an image".getBytes).isEmpty)
    assert(JpegCodec.decode(Array.empty[Byte]).isEmpty)
    val good = JpegCodec.encode(8, 8, Array.fill(64)(0x406080))
    assert(JpegCodec.decode(good.take(20)).isEmpty) // truncated
    // not throwing IS the assertion for arbitrary mid-stream damage
    val corrupt = good.clone(); corrupt(good.length / 2) =
      (corrupt(good.length / 2) ^ 0xff).toByte
    val _ = JpegCodec.decode(corrupt)
    // patch the SOF height to 65535 (> MaxSide): the walker must find
    // the frame header and the pre-check must reject it without
    // reaching ImageIO's allocator
    val sofAt = good.indices.dropWhile(i =>
      !((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0)).head
    val huge = good.clone()
    huge(sofAt + 5) = 0xff.toByte; huge(sofAt + 6) = 0xff.toByte
    assert(JpegCodec.sofDims(huge).contains((8, 65535)))
    assert(JpegCodec.decode(huge).isEmpty)
    // BMP / PNG bytes are not a JPEG
    import graft.operators.{BmpCodec, PngCodec}
    assert(!JpegCodec.isJpeg(BmpCodec.encode(4, 4, Array.fill(16)(0))))
    assert(!JpegCodec.isJpeg(PngCodec.encode(4, 4, Array.fill(16)(0))))
  }

  test("ImageCodecs.decodeAny dispatches JPEG by SOI magic") {
    import graft.operators.ImageCodecs
    val px = Array.tabulate(64)(i => ((i * 3) << 16) | ((i * 2) << 8) | i)
    val viaJpeg = ImageCodecs.decodeAny(JpegCodec.encode(8, 8, px))
    assert(viaJpeg.exists(img => img.width == 8 && img.height == 8))
  }

  test("mm_jpeg_files: batch binaryFile read equals the streaming " +
      "file-ingest dual row-for-row (Scala-side decode parity — the " +
      "spec-covered half of the JPEG oracle convention)") {
    import org.apache.spark.sql.types._
    val batch = Registry.queries("mm_jpeg_files")(spark, "")
      .collect().map(_.toSeq)
    assert(batch.length == JpegFixture.fileNames.length)
    val streamed = graft.streaming.StreamOps.runToCompletion(
      spark,
      spark.readStream.format("binaryFile")
        .schema(StructType(Seq(
          StructField("path", StringType),
          StructField("modificationTime", TimestampType),
          StructField("length", LongType),
          StructField("content", BinaryType))))
        .option("pathGlobFilter", "*.jpg")
        .load(JpegFixture.root),
      df => Multimodal.decodeFileFeatures(
        df.select(
          element_at(split(col("path"), "/"), -1).as("file_name"),
          col("content").as("payload")),
        decode = JpegCodec.decode)
        .select("file_name", "width", "height", "n_pixels"),
      outputMode = "append") // stateless decode — no aggregation
      .orderBy("file_name").collect().map(_.toSeq)
    assert(batch.toSeq == streamed.toSeq)
  }

  // -----------------------------------------------------------------
  // GIF codec (multi-frame member of the codec family)
  // -----------------------------------------------------------------

  import graft.operators.{GifCodec, GifFixture}

  test("GifFixture: checked-in animated GIFs equal the re-encoded " +
      "definition (self-verifying against bit-rot) and decode to the " +
      "EXACT palette pixels, frame counts, and delay formula") {
    for (((name, (w, h, frames, delays)), k) <-
        GifFixture.sources.zipWithIndex) {
      val onDisk = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(
          java.net.URI.create(s"${GifFixture.root}/$name")))
      assert(onDisk.toSeq == GifCodec.encode(w, h, frames, delays,
        GifFixture.palette).toSeq,
        s"$name bytes drifted from GifFixture.sources")
      val g = GifCodec.decode(onDisk).get
      assert((g.width, g.height) == (w, h), s"$name dims")
      assert(g.frames.size == frames.size, s"$name frame count")
      assert(g.delaysCs == delays.toVector, s"$name delays")
      // Palette-indexed frames round-trip EXACTLY (the GIF pixel
      // contract — unlike JPEG's lossy boundary): every decoded pixel
      // equals the index formula through the shared palette.
      for ((frame, f) <- g.frames.zipWithIndex) {
        assert((frame.width, frame.height) == (w, h))
        val want = frames(f).map(GifFixture.palette)
        assert(frame.pixels.toSeq == want.toSeq,
          s"$name frame $f pixel drift")
      }
      // The container walk agrees with the full decode (two parsers).
      val facts = GifCodec.containerFacts(onDisk).get
      assert(facts == GifCodec.GifFacts(w, h, frames.size,
        delays.toVector))
    }
  }

  test("GifCodec.decode rejects non-GIF, truncated, and " +
      "absurd-declaration payloads instead of throwing") {
    assert(GifCodec.decode("not a gif at all".getBytes).isEmpty)
    assert(GifCodec.decode(Array.emptyByteArray).isEmpty)
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(java.net.URI.create(
        s"${GifFixture.root}/anim_0.gif")))
    // Truncation anywhere in the block chain must yield None, not an
    // index error: the walk runs off the end and reports it.
    for (cut <- Seq(4, 10, 14, good.length / 2, good.length - 1))
      assert(GifCodec.decode(good.take(cut)).isEmpty, s"cut at $cut")
    // Absurd logical-screen dims (0 and > MaxSide) rejected before any
    // decoder allocation.
    val zeroW = good.clone(); zeroW(6) = 0; zeroW(7) = 0
    assert(GifCodec.decode(zeroW).isEmpty, "zero width accepted")
    val hugeW = good.clone(); hugeW(6) = -1; hugeW(7) = -1 // 0xFFFF
    assert(GifCodec.decode(hugeW).isEmpty, "huge width accepted")
  }

  test("mm_gif_frames batch == st_gif_ingest streamed, and per-frame " +
      "aHashes are computed from real decoded frames") {
    val batch = Registry.queries("mm_gif_frames")(spark, "unused")
      .collect().map(_.toSeq)
    val streamed = Registry.queries("st_gif_ingest")(spark, "unused")
      .collect().map(_.toSeq)
    assert(batch.toSeq == streamed.toSeq)
    // The operator's aHash column (spec-covered half): one hash per
    // frame, equal to ahash64 over the decoded frame.
    val full = Multimodal.decodeGifFeatures(
      spark.read.format("binaryFile").option("pathGlobFilter", "*.gif")
        .load(GifFixture.root)
        .select(element_at(split(col("path"), "/"), -1).as("file_name"),
          col("content").as("payload")))
      .orderBy("file_name").collect()
    for ((row, (name, (w, h, frames, _))) <- full.zip(GifFixture.sources)) {
      val hashes = row.getAs[String]("frame_ahashes").split('|')
      assert(hashes.length == frames.size, s"$name hash count")
      val want = frames.map { ix =>
        if (w >= 8 && h >= 8) graft.operators.BmpCodec.ahash64(
          graft.operators.BmpCodec.Bmp(w, h, ix.map(GifFixture.palette)))
        else "small" // sub-grid frames take the marker, like ahashBuckets
      }
      assert(hashes.toSeq == want, s"$name frame hashes")
    }
  }
}
