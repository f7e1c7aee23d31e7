package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  protected val multimodal: Map[String, Q] = Map(
    "mm_meta" -> ((s, dir) =>
      Multimodal.extractMeta(mmPayload(s, dir)).orderBy("doc_id")),
    "mm_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(mmPayload(s, dir)).orderBy("doc_id")),
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(mmPayload(s, dir))
        .select(col("doc_id"), col("n_frames"),
          concat_ws("|", col("frame_md5s")).as("frames"))
        .orderBy("doc_id")),
    // Exact media dedup: digest-only — payload bytes never shuffle.
    "mm_content_dedup" -> ((s, dir) =>
      Multimodal.contentDedup(mmPayload(s, dir)).orderBy("doc_id")),
    // pHash-shaped near-dup candidate buckets over the decoded coarse
    // features — the LSH bucket shape on the multimodal column.
    "mm_phash_buckets" -> ((s, dir) =>
      Multimodal.phashBuckets(mmPayload(s, dir)).orderBy("doc_id")),
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

  protected val multimodalOracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        |  (LIST_VALUE('png', 'jpeg', 'webp'))[CAST(doc_id % 3 AS INT) + 1] AS format,
        |  64 + (doc_id % 32) * 16 AS width,
        |  64 + (doc_id % 24) * 16 AS height,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  lower(hex(encode(substr(text, 1, 4)))) AS magic_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode_features" ->
      """WITH b AS (SELECT doc_id,
        |  list_transform(range(1, length(text) + 1), i -> unicode(text[i:i])) AS bytes
        |FROM documents)
        |SELECT doc_id,
        |  CAST(len(bytes) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(bytes) AS BIGINT) AS byte_sum,
        |  CAST(list_min(bytes) AS BIGINT) AS byte_min,
        |  CAST(list_max(bytes) AS BIGINT) AS byte_max
        |FROM b ORDER BY doc_id""".stripMargin,
    "mm_content_dedup" ->
      """WITH d AS (SELECT doc_id, md5(text) AS payload_md5 FROM documents),
        |g AS (SELECT payload_md5, CAST(count(*) AS BIGINT) AS n_copies,
        |    min(doc_id) AS first_id
        |  FROM d GROUP BY payload_md5)
        |SELECT d.doc_id, d.payload_md5, g.n_copies,
        |  CAST(CASE WHEN d.doc_id = g.first_id THEN 1 ELSE 0 END
        |    AS BIGINT) AS keep
        |FROM d JOIN g USING (payload_md5) ORDER BY doc_id""".stripMargin,
    "mm_phash_buckets" ->
      """WITH b AS (SELECT doc_id,
        |    list_transform(range(1, length(text) + 1),
        |      i -> unicode(text[i:i])) AS bytes
        |  FROM documents),
        |f AS (SELECT doc_id, CAST(len(bytes) AS BIGINT) AS n,
        |    CAST(coalesce(list_sum(bytes), 0) AS BIGINT) AS s
        |  FROM b),
        |p AS (SELECT doc_id,
        |    md5(CAST(n // 64 AS VARCHAR) || ':' ||
        |      CAST(s // 4096 AS VARCHAR)) AS phash
        |  FROM f),
        |g AS (SELECT phash, CAST(count(*) AS BIGINT) AS n_bucket
        |  FROM p GROUP BY phash)
        |SELECT p.doc_id, p.phash, g.n_bucket,
        |  CAST(CASE WHEN g.n_bucket > 1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_candidate
        |FROM p JOIN g USING (phash) ORDER BY doc_id""".stripMargin,
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
