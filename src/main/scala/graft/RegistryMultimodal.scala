package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType,
  StructField, StructType, TimestampType}

import graft.operators._

/** Multimodal family of the extension registry — binary payload
  * columns, typed metadata, batched stub decode, frame sampling. See
  * [[RegistryShared]]. */
private[graft] trait RegistryMultimodal extends RegistryShared {
  // ---------------------------------------------------------------------
  // Multimodal (graft.operators.Multimodal): binary payload columns +
  // typed metadata, batched stub decode, expression-only frame sampling.
  // The fixture text is pure ASCII, so the oracle derives identical byte
  // values from the text itself (payload = UTF-8 bytes of text).
  // ---------------------------------------------------------------------

  private def mmPayload(s: SparkSession, dir: String) =
    Multimodal.asBinaryPayload(t(s, dir, "documents"), "doc_id", "text")

  /** DuckDB-side path to the SAME BMP fixture files Spark reads —
    * derived from the one fixtureRoot resolution (classpath-on-disk or
    * temp extraction), the form700 oracle-path discipline. */
  private lazy val OracleBmpRoot: String =
    BmpFixture.root.replaceFirst("^file:/*", "/")

  /** The REAL-image payload: one deterministic 8×8 24bpp BMP per doc,
    * content keyed on `doc_id % 500` (collisions by construction). */
  private def mmBmpPayload(s: SparkSession, dir: String) =
    Multimodal.asBmpPayload(t(s, dir, "documents"), "doc_id")

  /** DuckDB-side path to the SAME WAV fixture files Spark reads. */
  private lazy val OracleWavRoot: String =
    WavFixture.root.replaceFirst("^file:/*", "/")

  /** DuckDB-side path to the SAME JPEG fixture files Spark reads. */
  private lazy val OracleJpegRoot: String =
    JpegFixture.root.replaceFirst("^file:/*", "/")

  /** DuckDB-side path to the SAME GIF fixture files Spark reads. */
  private lazy val OracleGifRoot: String =
    GifFixture.root.replaceFirst("^file:/*", "/")

  protected val multimodal: Map[String, Q] = Map(
    "mm_meta" -> ((s, dir) =>
      Multimodal.extractMeta(mmPayload(s, dir)).orderBy("doc_id")),
    // REAL codec: every payload is an actual 24bpp BMP and the decode
    // is a real header+pixel parse (operators.BmpCodec) — the oracle
    // derives the same channel stats from the closed-form pixel
    // content the encoder used.
    "mm_decode_features" -> ((s, dir) =>
      Multimodal.decodeBmpFeatures(mmBmpPayload(s, dir))
        .orderBy("doc_id")),
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(mmPayload(s, dir))
        .select(col("doc_id"), col("n_frames"),
          concat_ws("|", col("frame_md5s")).as("frames"))
        .orderBy("doc_id")),
    // Exact media dedup: digest-only — payload bytes never shuffle.
    "mm_content_dedup" -> ((s, dir) =>
      Multimodal.contentDedup(mmPayload(s, dir)).orderBy("doc_id")),
    // Perceptual-hash near-dup buckets over REAL decoded pixels:
    // BmpCodec.ahash64 (integer average-hash over the 8×8 block grid)
    // as the bucket key — docs congruent mod 500 carry identical
    // images and MUST co-bucket; the oracle replays the grayscale /
    // mean-threshold bit string in closed form.
    "mm_phash_buckets" -> ((s, dir) =>
      Multimodal.ahashBuckets(mmBmpPayload(s, dir)).orderBy("doc_id")),
    // MIXED-FORMAT corpus (even ids BMP, odd ids PNG — same pixel
    // content) through the magic-sniffing codec dispatch: the aHash is
    // computed over DECODED pixels, so the output must be IDENTICAL to
    // a single-format corpus — which is exactly how the oracle judges
    // it (the same closed-form pixel replay as mm_phash_buckets; PNG
    // encoder bytes are JDK-specific, decoded pixels are not).
    "mm_phash_mixed" -> ((s, dir) =>
      Multimodal.ahashBuckets(
        Multimodal.asMixedImagePayload(t(s, dir, "documents"), "doc_id"),
        decode = ImageCodecs.decodeAny)
        .orderBy("doc_id")),
    // Two independent decoders over ONE set of real files: Spark reads
    // the checked-in BMPs (binaryFile source) and decodes with
    // BmpCodec; the oracle read_blob's the same files and re-decodes
    // them in SQL (hex byte arithmetic: LE header fields, padded
    // bottom-up rows). Padding widths 5/6/7 prove the stride handling.
    "mm_bmp_files" -> ((s, _) =>
      Multimodal.decodeFileFeatures(
        s.read.format("binaryFile")
          .option("pathGlobFilter", "*.bmp")
          .load(BmpFixture.root)
          .select(element_at(split(col("path"), "/"), -1).as("file_name"),
            col("content").as("payload")))
        .orderBy("file_name")),
    // The multimodal STREAMING dual: the same fixture directory read as
    // a binaryFile FILE STREAM (the crawl-ingest shape — new image
    // files arrive, decode as they land), the same codec mapPartitions
    // inside the micro-batch, drained with AvailableNow. Stateless
    // (append mode, no state store); the drained result must equal the
    // batch read row-for-row, so the oracle IS mm_bmp_files' SQL
    // re-decode of the same files.
    "st_mm_ingest" -> ((s, _) =>
      graft.streaming.StreamOps.runToCompletion(
        s,
        s.readStream.format("binaryFile")
          // file-STREAM sources require an explicit schema; binaryFile's
          // is fixed by the format (path/modificationTime/length/content)
          .schema(StructType(Seq(
            StructField("path", StringType),
            StructField("modificationTime", TimestampType),
            StructField("length", LongType),
            StructField("content", BinaryType))))
          .option("pathGlobFilter", "*.bmp")
          .load(BmpFixture.root),
        df => Multimodal.decodeFileFeatures(
          df.select(
            element_at(split(col("path"), "/"), -1).as("file_name"),
            col("content").as("payload"))),
        outputMode = "append")
        .orderBy("file_name")),
    // AUDIO decode: every payload is an actual PCM16 WAV and the decode
    // is a real RIFF chunk walk (operators.WavCodec) — the audio member
    // of the codec family. Exact-integer features (frames, floor-ms
    // duration, Σs² energy, peak |s|, channel-0 zero crossings); the
    // oracle replays the encoder's sample formula in closed form.
    "mm_audio_features" -> ((s, dir) =>
      Multimodal.decodeWavFeatures(
        Multimodal.asWavPayload(t(s, dir, "documents"), "doc_id"))
        .orderBy("doc_id")),
    // Two independent decoders over ONE set of real audio files: Spark
    // reads the checked-in WAVs (binaryFile source) and decodes with
    // WavCodec; the oracle read_blob's the same files and re-decodes
    // them in SQL (LE header fields, signed int16 samples) — the
    // mm_bmp_files parity artifact for the audio modality. Mono AND
    // stereo files prove the channel-0 stride in both engines.
    "mm_wav_files" -> ((s, _) =>
      Multimodal.decodeWavFeatures(
        s.read.format("binaryFile")
          .option("pathGlobFilter", "*.wav")
          .load(WavFixture.root)
          .select(element_at(split(col("path"), "/"), -1).as("file_name"),
            col("content").as("payload")),
        keyCol = "file_name")
        .orderBy("file_name")),
    // The AUDIO streaming dual: the WAV fixture directory as a
    // binaryFile FILE STREAM, WavCodec decode inside the micro-batch,
    // drained with AvailableNow (stateless append — the st_mm_ingest
    // shape for the audio modality). Drained == batch == SQL re-decode.
    "st_audio_ingest" -> ((s, _) =>
      graft.streaming.StreamOps.runToCompletion(
        s,
        s.readStream.format("binaryFile")
          .schema(StructType(Seq(
            StructField("path", StringType),
            StructField("modificationTime", TimestampType),
            StructField("length", LongType),
            StructField("content", BinaryType))))
          .option("pathGlobFilter", "*.wav")
          .load(WavFixture.root),
        df => Multimodal.decodeWavFeatures(
          df.select(
            element_at(split(col("path"), "/"), -1).as("file_name"),
            col("content").as("payload")),
          keyCol = "file_name"),
        outputMode = "append")
        .orderBy("file_name")),
    // JPEG member of the crawl-image trio, at the format's honest
    // oracle boundary (JpegCodec scaladoc): JPEG pixel values are
    // decoder-dependent (inverse-DCT rounding is not standardized), so
    // the oracle-checked columns are the CONTAINER facts — SOF frame
    // dimensions and pixel count — re-parsed from the same checked-in
    // files by an independent SQL marker-stream walker (recursive CTE:
    // segment chain from SOI to the first SOF0/1/2). Pixel-level
    // behavior is spec-covered Scala-side: batch-vs-streaming decode
    // parity + bounded lossy error vs the encoded content.
    "mm_jpeg_files" -> ((s, _) =>
      Multimodal.decodeFileFeatures(
        s.read.format("binaryFile")
          .option("pathGlobFilter", "*.jpg")
          .load(JpegFixture.root)
          .select(element_at(split(col("path"), "/"), -1).as("file_name"),
            col("content").as("payload")),
        decode = JpegCodec.decode)
        .select("file_name", "width", "height", "n_pixels")
        .orderBy("file_name")),
    // The JPEG streaming dual: the fixture directory as a binaryFile
    // FILE STREAM, JpegCodec decode inside the micro-batch, drained
    // with AvailableNow (stateless append — the st_mm_ingest shape).
    // Output restricted to the container facts, like mm_jpeg_files;
    // drained == batch == SQL marker-walk: one oracle, three
    // independent paths over the same checked-in files.
    "st_jpeg_ingest" -> ((s, _) =>
      graft.streaming.StreamOps.runToCompletion(
        s,
        s.readStream.format("binaryFile")
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
        outputMode = "append")
        .orderBy("file_name")),
    // MULTI-FRAME member of the codec family: animated GIFs through
    // GifCodec (container walked independently BEFORE the JDK reader
    // decodes frames), at the format's honest oracle boundary (see
    // GifCodec scaladoc): the oracle-checked columns are the CONTAINER
    // facts — logical-screen dims, frame count, per-frame delays —
    // re-parsed from the same checked-in files by an independent SQL
    // block walker (recursive CTE over the sub-block chain). Per-frame
    // PIXELS are spec-covered and, unlike JPEG, EXACT (palette-indexed
    // frames round-trip bit-for-bit — MultimodalSpec).
    "mm_gif_frames" -> ((s, _) =>
      Multimodal.decodeGifFeatures(
        s.read.format("binaryFile")
          .option("pathGlobFilter", "*.gif")
          .load(GifFixture.root)
          .select(element_at(split(col("path"), "/"), -1).as("file_name"),
            col("content").as("payload")))
        .select("file_name", "width", "height", "n_frames", "delays_cs",
          "total_cs")
        .orderBy("file_name")),
    // The GIF streaming dual: the fixture directory as a binaryFile
    // FILE STREAM, GifCodec frame decode inside the micro-batch,
    // drained with AvailableNow (stateless append — the st_mm_ingest
    // shape). Drained == batch == SQL block-walk: one oracle, three
    // independent paths over the same checked-in files.
    "st_gif_ingest" -> ((s, _) =>
      graft.streaming.StreamOps.runToCompletion(
        s,
        s.readStream.format("binaryFile")
          .schema(StructType(Seq(
            StructField("path", StringType),
            StructField("modificationTime", TimestampType),
            StructField("length", LongType),
            StructField("content", BinaryType))))
          .option("pathGlobFilter", "*.gif")
          .load(GifFixture.root),
        df => Multimodal.decodeGifFeatures(
          df.select(
            element_at(split(col("path"), "/"), -1).as("file_name"),
            col("content").as("payload")))
          .select("file_name", "width", "height", "n_frames",
            "delays_cs", "total_cs"),
        outputMode = "append")
        .orderBy("file_name")),
    // Embedding-cosine near-dup: exact duplicates are synthesized under
    // shifted ids (the fixture's random vectors are near-orthogonal), so
    // the LSH-bucketed pair pass must recover exactly those pairs.
    // More planes than the top-k queries: pair work is O(n²/buckets), so
    // bucket granularity is the scale lever (identical vectors always
    // share a bucket regardless).
    "dd_embed_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val doubled = e.unionAll(e.select(
        (col("vec_id") + IdShift).as("vec_id"), col("embedding")))
      Similarity.embedNearDupPairs(doubled, 0.999, NeardupPlanes, Dim)
        .orderBy("vec_a", "vec_b")
    })
  )

  /** Closed-form aHash replay: per-pixel integer grayscale (r+g+b)//3
    * from the payload builders' shared channel formula, mean threshold,
    * 64 bits in block order — byte-identical to `BmpCodec.ahash64`
    * over the DECODED payload. Shared by mm_phash_buckets (all-BMP) and
    * mm_phash_mixed (BMP+PNG by id parity): the hash is over pixels,
    * so both corpora must produce THIS same result. */
  private lazy val ahashOracleSql: String =
    """WITH g AS (SELECT doc_id,
      |    list_transform(range(0, 64), i ->
      |      ( ((doc_id % 500) * 31 + i * 7) % 256
      |      + ((doc_id % 500) * 17 + i * 13) % 256
      |      + ((doc_id % 500) * 29 + i * 3) % 256 ) // 3) AS gray
      |  FROM documents),
      |p AS (SELECT doc_id,
      |    list_aggr(list_transform(range(0, 64), i ->
      |      CASE WHEN gray[i + 1] > (list_sum(gray) // 64)
      |        THEN '1' ELSE '0' END), 'string_agg', '') AS phash
      |  FROM g),
      |b AS (SELECT phash, CAST(count(*) AS BIGINT) AS n_bucket
      |  FROM p GROUP BY phash)
      |SELECT p.doc_id, p.phash, b.n_bucket,
      |  CAST(CASE WHEN b.n_bucket > 1 THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_candidate
      |FROM p JOIN b USING (phash) ORDER BY doc_id""".stripMargin

  /** Independent SQL re-decode of the SAME checked-in BMP files Spark
    * parses with BmpCodec: hex-string byte list, little-endian header
    * fields (data offset @10, width @18, height @22), padded bottom-up
    * rows (stride = ceil(3w/4)*4 — channel stats are
    * row-order-insensitive, so orientation needs no mirroring). Shared
    * by mm_bmp_files (batch binaryFile read) and st_mm_ingest (the
    * drained file-stream dual): one oracle, three independent paths
    * over the same files. */
  private lazy val bmpFilesOracleSql: String =
    s"""WITH b AS (SELECT regexp_extract(filename, '([^/]+)$$', 1)
       |      AS file_name, hex(content) AS hx
       |  FROM read_blob('$OracleBmpRoot/*.bmp')),
       |d AS (SELECT file_name,
       |    list_transform(range(0, length(hx) // 2), i ->
       |      (strpos('0123456789ABCDEF', substr(hx, CAST(2*i + 1 AS BIGINT), 1)) - 1) * 16 +
       |      (strpos('0123456789ABCDEF', substr(hx, CAST(2*i + 2 AS BIGINT), 1)) - 1)) AS bt
       |  FROM b),
       |h AS (SELECT file_name, bt,
       |    bt[11] + 256*bt[12] + 65536*bt[13] + 16777216*bt[14] AS data_off,
       |    bt[19] + 256*bt[20] + 65536*bt[21] + 16777216*bt[22] AS width,
       |    bt[23] + 256*bt[24] + 65536*bt[25] + 16777216*bt[26] AS height
       |  FROM d),
       |px AS (SELECT file_name, width, height,
       |    flatten(list_transform(range(0, height), y ->
       |      list_transform(range(0, 3 * width), k ->
       |        bt[CAST(data_off + y * (((3 * width + 3) // 4) * 4)
       |          + k + 1 AS BIGINT)]))) AS ch
       |  FROM h)
       |SELECT file_name, CAST(width AS BIGINT) AS width,
       |  CAST(height AS BIGINT) AS height,
       |  CAST(width * height AS BIGINT) AS n_pixels,
       |  CAST(list_sum(ch) AS BIGINT) AS px_sum,
       |  CAST(list_min(ch) AS BIGINT) AS px_min,
       |  CAST(list_max(ch) AS BIGINT) AS px_max
       |FROM px ORDER BY file_name""".stripMargin

  /** Independent SQL re-decode of the SAME checked-in WAV files Spark
    * parses with WavCodec: hex-string byte list, LE header fields
    * (channels @22, sample rate @24, data size @40 of the canonical
    * 44-byte header the fixture uses), signed int16 samples, channel-0
    * stride for zero crossings. Chunk-walk quirks (extra chunks, odd
    * word-align pad) are spec-covered with crafted buffers. Shared by
    * mm_wav_files (batch binaryFile read) and st_audio_ingest (the
    * drained file-stream dual).  */
  private lazy val wavFilesOracleSql: String =
    s"""WITH b AS (SELECT regexp_extract(filename, '([^/]+)$$', 1)
         |      AS file_name, hex(content) AS hx
         |  FROM read_blob('$OracleWavRoot/*.wav')),
         |d AS (SELECT file_name,
         |    list_transform(range(0, length(hx) // 2), i ->
         |      (strpos('0123456789ABCDEF', substr(hx, CAST(2*i + 1 AS BIGINT), 1)) - 1) * 16 +
         |      (strpos('0123456789ABCDEF', substr(hx, CAST(2*i + 2 AS BIGINT), 1)) - 1)) AS bt
         |  FROM b),
         |h AS (SELECT file_name, bt,
         |    bt[23] + 256 * bt[24] AS channels,
         |    bt[25] + 256 * bt[26] + 65536 * bt[27]
         |      + 16777216 * bt[28] AS sample_rate,
         |    bt[41] + 256 * bt[42] + 65536 * bt[43]
         |      + 16777216 * bt[44] AS data_size
         |  FROM d),
         |s AS (SELECT file_name, channels, sample_rate,
         |    (data_size // 2 // channels) * channels AS n_samples,
         |    list_transform(
         |      range(0, (data_size // 2 // channels) * channels), j ->
         |      CASE WHEN bt[CAST(46 + 2*j AS BIGINT)] >= 128
         |        THEN bt[CAST(45 + 2*j AS BIGINT)]
         |          + 256 * bt[CAST(46 + 2*j AS BIGINT)] - 65536
         |        ELSE bt[CAST(45 + 2*j AS BIGINT)]
         |          + 256 * bt[CAST(46 + 2*j AS BIGINT)] END) AS sm
         |  FROM h)
         |SELECT file_name,
         |  CAST(sample_rate AS BIGINT) AS sample_rate,
         |  CAST(channels AS BIGINT) AS channels,
         |  CAST(n_samples // channels AS BIGINT) AS n_frames,
         |  CAST((n_samples // channels) * 1000 // sample_rate AS BIGINT)
         |    AS duration_ms,
         |  CAST(list_sum(list_transform(sm, v -> v * v)) AS BIGINT)
         |    AS energy,
         |  CAST(list_max(list_transform(sm, v -> abs(v))) AS BIGINT)
         |    AS peak,
         |  CAST(coalesce(list_sum(list_transform(
         |      range(1, n_samples // channels), f ->
         |      CASE WHEN (sm[CAST((f - 1) * channels + 1 AS BIGINT)] < 0)
         |        <> (sm[CAST(f * channels + 1 AS BIGINT)] < 0)
         |      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings
         |FROM s ORDER BY file_name""".stripMargin

  /** Independent SQL re-parse of the SAME checked-in JPEG files Spark
    * decodes with JpegCodec: hex-string byte list, then a RECURSIVE
    * marker-stream walk (each segment: FF type len(2-byte BE); next
    * marker at pos+2+len) from SOI to the first SOF0/1/2 frame header,
    * whose big-endian height/width are the decoder-independent facts
    * JPEG's container guarantees (pixel values are NOT — the
    * JpegCodec pixel-exactness boundary). Two container parsers, one
    * file, matching dimensions. */
  private lazy val jpegFilesOracleSql: String =
    s"""WITH RECURSIVE b AS (SELECT regexp_extract(filename, '([^/]+)$$', 1)
       |      AS file_name, hex(content) AS hx
       |  FROM read_blob('$OracleJpegRoot/*.jpg')),
       |d AS MATERIALIZED (SELECT file_name,
       |    list_transform(range(0, length(hx) // 2), i ->
       |      (strpos('0123456789ABCDEF', substr(hx, CAST(2*i + 1 AS BIGINT), 1)) - 1) * 16 +
       |      (strpos('0123456789ABCDEF', substr(hx, CAST(2*i + 2 AS BIGINT), 1)) - 1)) AS bt
       |  FROM b),
       |seg(file_name, pos) AS (
       |  SELECT file_name, CAST(2 AS BIGINT) FROM d
       |  UNION ALL
       |  SELECT s.file_name,
       |    s.pos + 2 + d.bt[s.pos + 3] * 256 + d.bt[s.pos + 4]
       |  FROM seg s JOIN d USING (file_name)
       |  WHERE d.bt[s.pos + 1] = 255
       |    AND d.bt[s.pos + 2] NOT IN (192, 193, 194, 217, 218)),
       |sof AS (SELECT s.file_name, min(s.pos) AS pos
       |  FROM seg s JOIN d USING (file_name)
       |  WHERE d.bt[s.pos + 2] IN (192, 193, 194)
       |  GROUP BY s.file_name)
       |SELECT f.file_name,
       |  CAST(d.bt[f.pos + 8] * 256 + d.bt[f.pos + 9] AS BIGINT) AS width,
       |  CAST(d.bt[f.pos + 6] * 256 + d.bt[f.pos + 7] AS BIGINT) AS height,
       |  CAST((d.bt[f.pos + 8] * 256 + d.bt[f.pos + 9])
       |     * (d.bt[f.pos + 6] * 256 + d.bt[f.pos + 7]) AS BIGINT)
       |    AS n_pixels
       |FROM sof f JOIN d USING (file_name) ORDER BY file_name""".stripMargin

  /** Independent SQL re-parse of the SAME checked-in animated GIFs
    * Spark decodes with GifCodec: hex-string byte list, then a
    * RECURSIVE walk of the block structure as a two-state machine —
    * mode 'B' examines a block introducer (0x21 extension / 0x2C image
    * descriptor / 0x3B trailer, which ends the recursion), mode 'S'
    * hops length-prefixed sub-blocks to their 0 terminator; an image
    * descriptor also skips its local color table and LZW min-code
    * byte. Frame count = descriptors seen; delays = the Graphic
    * Control Extensions in stream order (little-endian hundredths at
    * GCE offset +4); screen dims = the little-endian logical screen
    * descriptor. Two container parsers, one file, matching facts —
    * the [[jpegFilesOracleSql]] convention on a sub-block chain. */
  private lazy val gifFilesOracleSql: String =
    s"""WITH RECURSIVE b AS (SELECT regexp_extract(filename, '([^/]+)$$', 1)
       |      AS file_name, hex(content) AS hx
       |  FROM read_blob('$OracleGifRoot/*.gif')),
       |d AS MATERIALIZED (SELECT file_name,
       |    list_transform(range(0, length(hx) // 2), i ->
       |      (strpos('0123456789ABCDEF', substr(hx, CAST(2*i + 1 AS BIGINT), 1)) - 1) * 16 +
       |      (strpos('0123456789ABCDEF', substr(hx, CAST(2*i + 2 AS BIGINT), 1)) - 1)) AS bt
       |  FROM b),
       |walk(file_name, pos, mode) AS (
       |  SELECT file_name,
       |    CAST(13 + CASE WHEN bt[11] >= 128
       |      THEN 3 * (1 << ((bt[11] % 8) + 1)) ELSE 0 END AS BIGINT),
       |    'B' FROM d
       |  UNION ALL
       |  SELECT w.file_name,
       |    CASE
       |      WHEN w.mode = 'B' AND d.bt[w.pos + 1] = 33 THEN w.pos + 2
       |      WHEN w.mode = 'B' AND d.bt[w.pos + 1] = 44 THEN w.pos + 11 +
       |        CASE WHEN d.bt[w.pos + 10] >= 128
       |          THEN 3 * (1 << ((d.bt[w.pos + 10] % 8) + 1)) ELSE 0 END
       |      WHEN w.mode = 'S' AND d.bt[w.pos + 1] = 0 THEN w.pos + 1
       |      ELSE w.pos + 1 + d.bt[w.pos + 1]
       |    END,
       |    CASE WHEN w.mode = 'S' AND d.bt[w.pos + 1] = 0 THEN 'B'
       |      ELSE 'S' END
       |  FROM walk w JOIN d USING (file_name)
       |  WHERE NOT (w.mode = 'B' AND d.bt[w.pos + 1] = 59)),
       |fr AS (SELECT w.file_name,
       |    CAST(count(*) FILTER (WHERE d.bt[w.pos + 1] = 44) AS BIGINT)
       |      AS n_frames,
       |    string_agg(CAST(d.bt[w.pos + 5] + 256 * d.bt[w.pos + 6]
       |        AS VARCHAR), '|' ORDER BY w.pos)
       |      FILTER (WHERE d.bt[w.pos + 1] = 33
       |        AND d.bt[w.pos + 2] = 249) AS delays_cs,
       |    CAST(sum(d.bt[w.pos + 5] + 256 * d.bt[w.pos + 6])
       |      FILTER (WHERE d.bt[w.pos + 1] = 33
       |        AND d.bt[w.pos + 2] = 249) AS BIGINT) AS total_cs
       |  FROM walk w JOIN d USING (file_name)
       |  WHERE w.mode = 'B' GROUP BY w.file_name)
       |SELECT f.file_name,
       |  CAST(d.bt[7] + 256 * d.bt[8] AS BIGINT) AS width,
       |  CAST(d.bt[9] + 256 * d.bt[10] AS BIGINT) AS height,
       |  f.n_frames, f.delays_cs, f.total_cs
       |FROM fr f JOIN d USING (file_name) ORDER BY file_name""".stripMargin

  protected val multimodalOracles: Map[String, String] = Map(
    "mm_gif_frames" -> gifFilesOracleSql,
    "st_gif_ingest" -> gifFilesOracleSql,
    "mm_meta" ->
      """SELECT doc_id,
        |  (LIST_VALUE('png', 'jpeg', 'webp'))[CAST(doc_id % 3 AS INT) + 1] AS format,
        |  64 + (doc_id % 32) * 16 AS width,
        |  64 + (doc_id % 24) * 16 AS height,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  lower(hex(encode(substr(text, 1, 4)))) AS magic_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Closed-form replay of the BMP pixel content: the encoder's
    // channel formula (r/g/b per pixel index), channel stats over all
    // 192 channel bytes — the Spark side must round-trip
    // encode→parse→stats to the same numbers.
    "mm_decode_features" ->
      """WITH c AS (SELECT doc_id,
        |    list_transform(range(0, 192), j ->
        |      CASE j % 3
        |        WHEN 0 THEN ((doc_id % 500) * 31 + (j // 3) * 7) % 256
        |        WHEN 1 THEN ((doc_id % 500) * 17 + (j // 3) * 13) % 256
        |        ELSE ((doc_id % 500) * 29 + (j // 3) * 3) % 256
        |      END) AS ch
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(64 AS BIGINT) AS n_pixels,
        |  CAST(list_sum(ch) AS BIGINT) AS px_sum,
        |  CAST(list_min(ch) AS BIGINT) AS px_min,
        |  CAST(list_max(ch) AS BIGINT) AS px_max
        |FROM c ORDER BY doc_id""".stripMargin,
    "mm_content_dedup" ->
      """WITH d AS (SELECT doc_id, md5(text) AS payload_md5 FROM documents),
        |g AS (SELECT payload_md5, CAST(count(*) AS BIGINT) AS n_copies,
        |    min(doc_id) AS first_id
        |  FROM d GROUP BY payload_md5)
        |SELECT d.doc_id, d.payload_md5, g.n_copies,
        |  CAST(CASE WHEN d.doc_id = g.first_id THEN 1 ELSE 0 END
        |    AS BIGINT) AS keep
        |FROM d JOIN g USING (payload_md5) ORDER BY doc_id""".stripMargin,
    // The aHash bit string in closed form: per-pixel integer grayscale
    // (r+g+b)//3 from the encoder's channel formula, mean threshold,
    // 64 bits in block order — byte-identical to BmpCodec.ahash64 over
    // the decoded payload.
    "mm_phash_buckets" -> ahashOracleSql,
    // The mixed BMP+PNG corpus carries the SAME pixel content (format
    // alternates by id parity), and the hash is over decoded pixels —
    // so the oracle IS the single-format replay: matching it proves the
    // two decoders and the dispatch are pixel-equivalent.
    "mm_phash_mixed" -> ahashOracleSql,
    // Independent SQL re-decode of the SAME checked-in files Spark
    // parses with BmpCodec: hex-string byte list, little-endian header
    // fields (data offset @10, width @18, height @22), padded
    // bottom-up rows (stride = ceil(3w/4)*4 — channel stats are
    // row-order-insensitive, so orientation needs no mirroring).
    "mm_bmp_files" -> bmpFilesOracleSql,
    // Closed-form replay of the WAV payload: the encoder's sample
    // formula (mono 8 kHz, n = 64 + (id%5)·16 frames, s_i =
    // ((seed·37 + i·8191) % 65536) − 32768), exact-integer features.
    "mm_audio_features" ->
      """WITH p AS (SELECT doc_id, doc_id % 500 AS s,
        |    64 + (doc_id % 5) * 16 AS n
        |  FROM documents),
        |w AS (SELECT doc_id, n,
        |    list_transform(range(0, n), i ->
        |      ((s * 37 + i * 8191) % 65536) - 32768) AS sm
        |  FROM p)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(n AS BIGINT) AS n_frames,
        |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(list_sum(list_transform(sm, v -> v * v)) AS BIGINT)
        |    AS energy,
        |  CAST(list_max(list_transform(sm, v -> abs(v))) AS BIGINT)
        |    AS peak,
        |  CAST(coalesce(list_sum(list_transform(range(1, n), f ->
        |      CASE WHEN (sm[CAST(f AS BIGINT)] < 0)
        |        <> (sm[CAST(f + 1 AS BIGINT)] < 0)
        |      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings
        |FROM w ORDER BY doc_id""".stripMargin,
    "mm_wav_files" -> wavFilesOracleSql,
    "mm_jpeg_files" -> jpegFilesOracleSql,
    // streaming dual drains to the identical rows (batch binaryFile +
    // file stream + SQL marker walk — three paths, one oracle)
    "st_jpeg_ingest" -> jpegFilesOracleSql,
    // The drained audio file-stream must equal the batch read
    // row-for-row, so its oracle IS the same SQL re-decode — one
    // oracle, three independent paths over the same files (batch
    // binaryFile + WavCodec, file stream + WavCodec, DuckDB read_blob
    // + SQL decoder), the st_mm_ingest convention for audio.
    "st_audio_ingest" -> wavFilesOracleSql,
    // Drained file-stream == batch read == the SQL re-decode: one
    // oracle, three independent paths over the same files.
    "st_mm_ingest" -> bmpFilesOracleSql,
    "mm_frame_sample" ->
      """SELECT doc_id,
        |  CAST(floor((length(text) - 1) / 64) + 1 AS BIGINT) AS n_frames,
        |  array_to_string(list_transform(
        |    range(0, CAST(floor((length(text) - 1) / 64) + 1 AS BIGINT)),
        |    i -> md5(substr(text, CAST(i * 64 + 1 AS BIGINT), 16))), '|') AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dd_embed_neardup" -> {
      val planes = Similarity.planes(NeardupPlanes, Dim)
      val bucket = planes.map(p =>
        s"(CASE WHEN ${planeDotSql("q", p)} >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + $IdShift, embedding FROM embeddings),
         |v AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |FROM e),
         |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq, $bucket AS bucket FROM v),
         |p AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
         |    ${dotSql("a.q", "b.q")} AS dot, a.nq AS na, b.nq AS nb
         |  FROM n a JOIN n b ON a.bucket = b.bucket
         |  WHERE a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, bucket, dot,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
         |FROM p
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= 0.999
         |ORDER BY vec_a, vec_b""".stripMargin
    }
  )

}
