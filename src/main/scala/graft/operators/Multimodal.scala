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
