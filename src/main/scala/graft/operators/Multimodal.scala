package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads carried as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / frame-sample operators a training-data
  * pipeline runs over them.
  *
  * The container has no image/audio codecs, so the codec itself is a
  * clearly-marked deterministic STUB ([[FakeCodec]]); everything
  * Spark-side is real and tested: the binary schema, the metadata
  * struct, the batched per-partition decode (the Scala analog of a
  * batched `mapInPandas` decode), and the codegen-friendly
  * expression-only paths (metadata, frame sampling).
  *
  * Scale notes: payload columns are large — every operator here prunes
  * to (id, payload) before touching bytes, keeps per-row work linear in
  * payload size, and never shuffles payloads (all transforms are
  * narrow; only the small feature/meta outputs flow onward).
  */
object Multimodal {

  /** Deterministic stand-in for a real media codec. A production build
    * replaces `decode` with an actual image/audio decoder (the
    * signature — bytes in, fixed-width feature vector out — is the
    * contract the pipeline tests). */
  object FakeCodec {
    /** STUB: "decodes" a payload into byte statistics
      * (n_bytes, sum, min, max) — deterministic, codec-shaped. */
    def decode(payload: Array[Byte]): (Long, Long, Long, Long) = {
      var i = 0; var sum = 0L; var mn = 256L; var mx = -1L
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b; if (b < mn) mn = b; if (b > mx) mx = b
        i += 1
      }
      (payload.length.toLong, sum, if (mn == 256L) 0L else mn,
        if (mx == -1L) 0L else mx)
    }
  }

  /** Ingest shape: attach a binary payload (UTF-8 bytes of `textCol` —
    * the fixture stand-in for real media bytes) and a typed metadata
    * struct derived deterministically from the id. */
  def asBinaryPayload(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val id = col(idCol)
    df.select(id,
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        expr(s"element_at(array('png','jpeg','webp'), " +
          s"CAST($idCol % 3 AS INT) + 1)").as("format"),
        (lit(64) + (id % 32) * 16).cast(LongType).as("width"),
        (lit(64) + (id % 24) * 16).cast(LongType).as("height"))
        .as("meta"))
  }

  /** Metadata / fingerprint extraction — pure codegen expressions over
    * the binary column: byte length, md5, magic-prefix hex. */
  def extractMeta(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      length(col("payload")).cast(LongType).as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      lower(hex(substring(col("payload"), 1, 4))).as("magic_hex"))

  /** Batched decode: one [[FakeCodec.decode]] call per payload, executed
    * per partition (the batch boundary a real vectorized decoder needs).
    * Output is the small feature frame; payloads do not flow past this
    * operator. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // the per-partition batch boundary: a real vectorized codec
        // would ship the whole iterator's payloads to native code here
        it.map { case (id, bytes) =>
          val (n, s, mn, mx) = FakeCodec.decode(bytes)
          (id, n, s, mn, mx)
        }
      }
      .toDF("doc_id", "n_bytes", "byte_sum", "byte_min", "byte_max")
  }

  /** Exact CONTENT dedup over binary payloads — the first pass every
    * image/audio corpus runs (identical bytes are the bulk of crawl
    * duplication): md5 the payload, keep the lowest id per digest.
    * Payloads never shuffle — only (id, digest) rows reach the
    * exchange, the [[graft.operators.Dedup]] digest-only convention
    * applied to media bytes. */
  def contentDedup(df: DataFrame): DataFrame = {
    val d = df.select(col("doc_id"), md5(col("payload")).as("payload_md5"))
    val g = d.groupBy("payload_md5")
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("first_id"))
    d.join(g, Seq("payload_md5"))
      .select(col("doc_id"), col("payload_md5"), col("n_copies"),
        when(col("doc_id") === col("first_id"), 1L).otherwise(0L)
          .as("keep"))
  }

  /** Perceptual-hash-style NEAR-dup bucketing: quantize the decoded
    * coarse features (here [[FakeCodec]] byte stats; a real build uses
    * a pHash/dHash over decoded pixels — same bytes-in, code-out
    * contract) into a band code, then bucket-join — media near-dup
    * candidates without any pairwise compare, the [[Dedup]] LSH shape
    * on the multimodal column. Payloads stop at the decode; only
    * (id, code) rows flow.
    *
    * `decode` is the codec seam: any bytes-in/features-out stage that
    * emits `(doc_id, n_bytes, byte_sum, …)` plugs in — the banding,
    * bucket-join, and candidate marking are codec-agnostic
    * (MultimodalSpec proves the swap with a second codec over a
    * different byte layout). */
  def phashBuckets(df: DataFrame, sizeBand: Int = 64,
                   sumBand: Int = 4096,
                   decode: DataFrame => DataFrame = decodeFeatures)
      : DataFrame = {
    val f = decode(df)
    val p = f.select(col("doc_id"),
      md5(concat_ws(":",
        expr(s"CAST(n_bytes div $sizeBand AS STRING)"),
        expr(s"CAST(byte_sum div $sumBand AS STRING)"))).as("phash"))
    val g = p.groupBy("phash").agg(count(lit(1)).as("n_bucket"))
    p.join(g, Seq("phash"))
      .select(col("doc_id"), col("phash"), col("n_bucket"),
        when(col("n_bucket") > 1, 1L).otherwise(0L).as("is_candidate"))
  }

  /** REAL-codec ingest shape: a deterministic 8×8 24bpp BMP per row —
    * actual image bytes (header + padded BGR rows), not a text
    * stand-in — encoded from the id so the DuckDB oracle can derive
    * the same pixel values in closed form. `doc_id % seeds` picks the
    * image content, so ids congruent mod `seeds` carry IDENTICAL
    * images — the collision structure the near-dup bucketing queries
    * need. Channel formula (pixel index i = y·8+x, seed s):
    * r = (s·31 + i·7) % 256, g = (s·17 + i·13) % 256,
    * b = (s·29 + i·3) % 256. */
  def asBmpPayload(df: DataFrame, idCol: String,
                   seeds: Int = 500): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val s = id % seeds
          val px = Array.tabulate(64) { i =>
            val r = ((s * 31 + i * 7) % 256).toInt
            val g = ((s * 17 + i * 13) % 256).toInt
            val b = ((s * 29 + i * 3) % 256).toInt
            (r << 16) | (g << 8) | b
          }
          (id, BmpCodec.encode(8, 8, px))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** MIXED-FORMAT ingest: the same deterministic pixel content as
    * [[asBmpPayload]] (seed = `doc_id % seeds`, identical channel
    * formula) but the CONTAINER alternates by id parity — even ids
    * carry 24bpp BMP bytes, odd ids carry PNG bytes (JDK `javax.imageio`
    * encoder). Content is format-invariant by construction, so any
    * pixel-level feature downstream (aHash, channel stats) must emit
    * identical values for both containers — the property a mixed-crawl
    * near-dup pass depends on, and what lets the DuckDB oracle keep
    * judging in closed form from the pixel formula alone (PNG encoder
    * bytes are JDK-specific; decoded pixels are not). */
  def asMixedImagePayload(df: DataFrame, idCol: String,
                          seeds: Int = 500): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val s = id % seeds
          val px = Array.tabulate(64) { i =>
            val r = ((s * 31 + i * 7) % 256).toInt
            val g = ((s * 17 + i * 13) % 256).toInt
            val b = ((s * 29 + i * 3) % 256).toInt
            (r << 16) | (g << 8) | b
          }
          val bytes =
            if (id % 2 == 0) BmpCodec.encode(8, 8, px)
            else PngCodec.encode(8, 8, px)
          (id, bytes)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** REAL decode: parse each payload as a 24bpp BMP ([[BmpCodec]]) and
    * emit per-image pixel statistics over the CHANNEL bytes of the
    * pixel region (padding excluded by the decoder) — width, height,
    * pixel count, channel-byte sum/min/max. Same batched
    * per-partition shape as [[decodeFeatures]]; payloads stop here.
    * Undecodable payloads yield a (-1, -1, …) marker row — counted,
    * not thrown, like the page-parse tolerance. */
  def decodeBmpFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          BmpCodec.decode(bytes) match {
            case Some(img) =>
              var sum = 0L; var mn = 256L; var mx = -1L
              var k = 0
              while (k < img.pixels.length) {
                val p = img.pixels(k)
                val (r, g, b) =
                  ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
                sum += r + g + b
                mn = math.min(mn, math.min(r, math.min(g, b)))
                mx = math.max(mx, math.max(r, math.max(g, b)))
                k += 1
              }
              (id, img.width.toLong, img.height.toLong,
                img.pixels.length.toLong, sum, mn, mx)
            case None => (id, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }
      }
      .toDF("doc_id", "width", "height", "n_pixels", "px_sum",
        "px_min", "px_max")
  }

  /** Shared decode for FILE relations `(file_name, payload)` — the
    * [[decodeBmpFeatures]] channel stats keyed by file name instead of
    * doc id. One code path serves the batch `binaryFile` read
    * (mm_bmp_files) and its file-STREAM dual (st_mm_ingest): the
    * mapPartitions decode is narrow, so it runs unchanged inside a
    * streaming micro-batch. Undecodable payloads yield the (-1, …)
    * marker row (counted, never thrown — crawl-tolerance), and the
    * `decode` parameter is the codec seam ([[ImageCodecs.decodeAny]]
    * for a mixed-format directory). */
  def decodeFileFeatures(files: DataFrame,
                         decode: Array[Byte] => Option[BmpCodec.Bmp] =
                           BmpCodec.decode): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file_name"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (name, bytes) =>
          decode(bytes) match {
            case Some(img) =>
              var sum = 0L; var mn = 256L; var mx = -1L
              img.pixels.foreach { p =>
                val (r, g, b) =
                  ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
                sum += r + g + b
                mn = math.min(mn, math.min(r, math.min(g, b)))
                mx = math.max(mx, math.max(r, math.max(g, b)))
              }
              (name, img.width.toLong, img.height.toLong,
                (img.width * img.height).toLong, sum, mn, mx)
            case None => (name, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }
      }
      .toDF("file_name", "width", "height", "n_pixels", "px_sum",
        "px_min", "px_max")
  }

  /** MULTI-FRAME decode for FILE relations `(file_name, payload)` —
    * the frame-sampling seam over a REAL multi-frame container
    * ([[GifCodec]]): container facts (screen dims, frame count,
    * per-frame delays, total duration) plus a per-frame aHash over the
    * DECODED pixels. The registry query projects the container facts
    * (the honest GIF oracle boundary — LZW is not SQL-replayable, the
    * block walk is); the aHash column is the spec-covered pixel half,
    * exact for palette content. One code path serves the batch
    * binaryFile read and its file-stream dual, like
    * [[decodeFileFeatures]]; undecodable payloads yield the (-1, …)
    * marker row (counted, never thrown). */
  def decodeGifFeatures(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file_name"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (name, bytes) =>
          GifCodec.decode(bytes) match {
            case Some(g) =>
              (name, g.width.toLong, g.height.toLong,
                g.frames.size.toLong,
                g.delaysCs.mkString("|"),
                g.delaysCs.map(_.toLong).sum,
                g.frames.map(f =>
                  if (f.width >= 8 && f.height >= 8) BmpCodec.ahash64(f)
                  else "small").mkString("|"))
            case None => (name, -1L, -1L, -1L, "", -1L, "")
          }
        }
      }
      .toDF("file_name", "width", "height", "n_frames", "delays_cs",
        "total_cs", "frame_ahashes")
  }

  /** Perceptual-hash near-dup bucketing over REAL pixels: decode, hash
    * with [[BmpCodec.ahash64]] (integer average-hash over the 8×8
    * block grid), bucket-join on the hash — the [[phashBuckets]] shape
    * with the stub byte stats replaced by an actual
    * decoded-pixel perceptual hash. The `decode` parameter remains
    * the codec seam (any bytes→image stage plugs in); payloads stop
    * at the decode, only (id, hash) rows shuffle. Images smaller than
    * the 8×8 grid land in a shared `"undecodable"` bucket (counted,
    * never dropped), like parse-failure pages. */
  def ahashBuckets(df: DataFrame,
                   decode: Array[Byte] => Option[BmpCodec.Bmp] =
                     BmpCodec.decode): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val h = decode(bytes)
            .filter(i => i.width >= 8 && i.height >= 8)
            .map(BmpCodec.ahash64)
            .getOrElse("undecodable")
          (id, h)
        }
      }
      .toDF("doc_id", "phash")
    val g = p.groupBy("phash").agg(count(lit(1)).as("n_bucket"))
    p.join(g, Seq("phash"))
      .select(col("doc_id"), col("phash"), col("n_bucket"),
        when(col("n_bucket") > 1, 1L).otherwise(0L).as("is_candidate"))
  }

  /** AUDIO ingest: deterministic PCM16 WAV payloads (seed =
    * `doc_id % seeds`, the [[WavFixture]] sample formula, mono 8 kHz,
    * frame count varying with id so durations differ) — the audio
    * analog of [[asBmpPayload]]. Sample formula (frame i, seed s):
    * ((s·37 + i·8191) % 65536) − 32768. */
  def asWavPayload(df: DataFrame, idCol: String,
                   seeds: Int = 500): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val s = (id % seeds).toInt
          val n = (64 + (id % 5) * 16).toInt
          val pcm = Array.tabulate(n)(i =>
            (((s * 37 + i * 8191) % 65536) - 32768).toShort)
          (id, WavCodec.encode(8000, 1, pcm))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** REAL audio decode: parse each payload as a PCM16 WAV
    * ([[WavCodec]]) and emit the exact-integer feature row
    * ([[WavCodec.features]] — frames, floor-ms duration, Σs² energy,
    * peak |s|, channel-0 zero crossings). Same batched per-partition
    * shape as [[decodeBmpFeatures]]; payloads stop here. Undecodable
    * payloads yield the (-1, …) marker row (counted, not thrown). */
  def decodeWavFeatures(df: DataFrame, keyCol: String = "doc_id")
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val decoded = df.select(col(keyCol), col("payload"))
    val out = keyCol match {
      // key typing differs between the payload path (doc_id: Long) and
      // the binaryFile path (file_name: String); one decode body.
      case "file_name" =>
        decoded.as[(String, Array[Byte])].mapPartitions { it =>
          it.map { case (k, bytes) => (k, wavRow(bytes)) }
        }.map { case (k, r) =>
          (k, r._1, r._2, r._3, r._4, r._5, r._6, r._7)
        }.toDF(keyCol, "sample_rate", "channels", "n_frames",
          "duration_ms", "energy", "peak", "zero_crossings")
      case _ =>
        decoded.as[(Long, Array[Byte])].mapPartitions { it =>
          it.map { case (k, bytes) => (k, wavRow(bytes)) }
        }.map { case (k, r) =>
          (k, r._1, r._2, r._3, r._4, r._5, r._6, r._7)
        }.toDF(keyCol, "sample_rate", "channels", "n_frames",
          "duration_ms", "energy", "peak", "zero_crossings")
    }
    out
  }

  private def wavRow(bytes: Array[Byte])
      : (Long, Long, Long, Long, Long, Long, Long) =
    WavCodec.decode(bytes) match {
      case Some(w) =>
        val (frames, ms, energy, peak, zc) = WavCodec.features(w)
        (w.sampleRate.toLong, w.channels.toLong, frames, ms,
          energy, peak, zc)
      case None => (-1L, -1L, -1L, -1L, -1L, -1L, -1L)
    }

  /** Frame sampling ("video" payloads): one 16-byte frame every
    * `stride` bytes, fingerprinted with md5 — expression-only
    * (`sequence` + `transform` higher-order functions, whole-stage
    * codegen). Empty payloads are guarded explicitly: Spark's
    * `sequence(a, b)` DESCENDS when a > b (here `sequence(0, -1)` would
    * yield two bogus frames, where the oracle's `range(0, 0)` yields
    * none) — the same guard as [[Dedup.shingles]]. */
  def frameSample(df: DataFrame, stride: Int = 64): DataFrame = {
    val nFrames = greatest(lit(0L),
      (floor((length(col("payload")) - 1) / stride) + 1).cast(LongType))
    df.select(col("doc_id"),
      nFrames.as("n_frames"),
      when(nFrames > 0,
        transform(sequence(lit(0L), nFrames - 1),
          i => md5(substring(col("payload"),
            (i * stride + 1).cast(IntegerType), lit(16)))))
        .otherwise(array().cast(ArrayType(StringType)))
        .as("frame_md5s"))
  }
}
