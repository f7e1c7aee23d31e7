package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Training-corpus-prep family of the extension registry — sampling,
  * mixing, packing, splits, end-to-end corpus pipelines. See
  * [[RegistryShared]]. */
private[graft] trait RegistryTrainPrep extends RegistryShared {
  // ---------------------------------------------------------------------
  // Training-corpus prep (TrainPrep): deterministic-hash sampling,
  // weighted corpus mixing, per-shard sequence packing — the stage
  // between a cleaned corpus and a training stream. All decisions are
  // pure functions of the row id, so the DuckDB oracles replay them
  // bit-for-bit.
  // ---------------------------------------------------------------------

  private val SamplePct = 20
  private val MixWeightA = 80
  private val PackBudget = 256
  private val ChunkWindow = 32
  private val ChunkStride = 24
  private val SplitValPct = 10
  private val SplitTestPct = 10
  // Per-source token budget for tp_token_budget — ~45% of a fixture
  // source's ~1300 tokens, so each source's selection boundary lands
  // mid-catalog (both verdicts well-populated).
  private val CurateBudget = 600L
  // tp_temperature_mix doc budget: NOT divisible by the fixture's 20
  // uniform sources, so the largest-remainder pass and its domain-name
  // tiebreak are genuinely exercised (10 domains get a +1 share).
  private val TempMixBudget = 130L

  /** The SAME bucket construction as TrainPrep.hashBucket, in DuckDB. */
  private def hashBucketSql(x: String, buckets: Int = 100): String =
    s"CAST(('0x' || substr(md5(CAST($x AS VARCHAR)), 1, 8)) AS BIGINT)" +
      s" % $buckets"

  /** Curriculum ordering: shard fan-out and difficulty-phase count. */
  private val CurriculumShards = 8
  private val CurriculumPhases = 3
  // Epoch-plan token budget: ~2x the sf0.01 fixture's total tokens, so
  // the plan genuinely upsamples (epochs_ppm > 1e6) most sources while
  // the temperature tilt still pushes some below others.
  private val EpochBudget = 60000L
  // Importance-resampling acceptance slope: fixture dsir scores sit in
  // ~[-300k, 0] ppm, so slope 4 spreads acceptance rates across the
  // full [0, 1e6] range — both verdicts well-populated.
  private val RsSlope = 4L

  protected val trainprep: Map[String, Q] = Map(
    "tp_sample_hash" -> ((s, dir) =>
      TrainPrep.sampleByHash(t(s, dir, "documents"), "doc_id", SamplePct)
        .select("doc_id", "bucket")
        .orderBy("doc_id")),

    // Temperature-scaled (α = 1/2, exact isqrt weights) domain mixture:
    // budget apportioned by largest remainder, rows kept by salted
    // hash-rate — the mT5/LLaMA source-mixing step.
    "tp_temperature_mix" -> ((s, dir) =>
      TrainPrep.temperatureMix(t(s, dir, "documents"), "doc_id",
        "source", TempMixBudget)
        .orderBy("doc_id")),

    // Length-curriculum schedule: per-shard easy-to-hard sort into
    // contiguous phases — shard-bounded windows, no global row_number.
    "tp_curriculum" -> ((s, dir) =>
      TrainPrep.curriculum(t(s, dir, "documents"), "doc_id",
        size(split(trim(col("text")), "\\s+")),
        CurriculumShards, CurriculumPhases)
        .orderBy("doc_id")),

    // Epoch plan: token-mass temperature weights → largest-remainder
    // budget split → exact per-source repeat factors (ppm).
    "tp_epoch_plan" -> ((s, dir) =>
      TrainPrep.epochPlan(t(s, dir, "documents"), "text", "source",
        EpochBudget)
        .orderBy("source")),

    // DSIR selection: importance scores → clipped-linear acceptance
    // rates → deterministic hash-ppm resampling.
    "tp_importance_resample" -> ((s, dir) =>
      TrainPrep.importanceResample(
        TextAnalysis.dsirScore(t(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en"),
        "doc_id", "score_ppm", RsSlope)
        .orderBy("doc_id")),

    // Two corpora (the fixture + a shifted-id copy standing in for a
    // second source) mixed 80/20: each source keeps its own hash-space
    // slice, tagged with source_id.
    "tp_mix_weighted" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val a = d.select(col("doc_id"))
      val b = d.select((col("doc_id") + IdShift).as("doc_id"))
      TrainPrep.mixWeighted(Seq((a, MixWeightA), (b, 100 - MixWeightA)),
          "doc_id")
        .select("doc_id", "bucket", "source_id")
        .orderBy("doc_id")
    }),

    "tp_pack_sequences" -> ((s, dir) =>
      TrainPrep.packSequences(t(s, dir, "documents"), "doc_id", "text",
        "lang", PackBudget)
        .orderBy("doc_id")),

    // Per-row weighted sampling: English downweighted to 25%, the rest
    // kept at 75% — the rebalancing move a multilingual corpus mix
    // actually makes, decided row-by-row on the scan.
    "tp_sample_weighted" -> ((s, dir) =>
      TrainPrep.sampleWeighted(
          t(s, dir, "documents").withColumn("keep_pct",
            when(col("lang") === "en", lit(25)).otherwise(lit(75))),
          "doc_id", "keep_pct")
        .select("doc_id", "lang", "keep_pct", "bucket")
        .orderBy("doc_id")),

    // Token-budget curation: each source keeps its best docs (n_chars
    // as the score stand-in, tie → id) until 600 tokens accumulate;
    // every row carries its verdict.
    "tp_token_budget" -> ((s, dir) =>
      TrainPrep.tokenBudget(t(s, dir, "documents"), "doc_id", "text",
          "source", "n_chars", CurateBudget)
        .orderBy("doc_id")),

    // Stratum-salted deterministic train/val/test split: each lang gets
    // its own hash space, so per-stratum fractions hold independently
    // and test membership is frozen under valPct growth.
    "tp_stratified_split" -> ((s, dir) =>
      TrainPrep.stratifiedSplit(t(s, dir, "documents"), "doc_id", "lang",
          valPct = SplitValPct, testPct = SplitTestPct)
        .select("doc_id", "lang", "bucket", "split")
        .orderBy("doc_id")),

    // Sliding-window chunking (embedding/RAG prep): 32-word windows at
    // stride 24 — a pure narrow explode, no shuffle (TrainPrepSpec
    // asserts the plan is exchange-free).
    "tp_chunk_windows" -> ((s, dir) =>
      TrainPrep.chunkWindows(t(s, dir, "documents"), "doc_id", "text",
          ChunkWindow, ChunkStride)
        .orderBy("doc_id", "chunk_id")),

    // The corpus-prep pipeline END-TO-END over the doubled (near-dup)
    // corpus: quality filter → language filter → LSH near-dedup →
    // per-shard packing, one declared plan, oracle-checked
    // value-for-value through all four stages.
    "tp_corpus_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val doubled = d.unionAll(d.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text")))
      TrainPrep.corpusPipeline(doubled, "doc_id", "text", PipelineLang,
          NumHashes, Bands, JaccardThreshold, PipelineShards, PackBudget)
        .orderBy("doc_id")
    }),

    // The FULL production pipeline: quality → langid → near-dedup →
    // benchmark decontamination → PII scrub → per-shard packing, in the
    // order a released corpus actually runs them. Input is the doubled
    // PII-planted corpus minus the eval holdout (docs at
    // id % EvalHoldout == 0 — the same split dd_decontaminate audits);
    // the holdout is the eval side the decontamination stage drops
    // against. Every stage's effect is oracle-checked value-for-value
    // through the composition.
    "tp_corpus_pipeline_full" -> ((s, dir) => {
      val p = plantPii(t(s, dir, "documents"))
      val doubled = p.unionAll(p.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text")))
      TrainPrep.corpusPipelineFull(
          doubled.where(col("doc_id") % EvalHoldout =!= 0),
          "doc_id", "text", PipelineLang, NumHashes, Bands,
          JaccardThreshold,
          p.where(col("doc_id") % EvalHoldout === 0),
          DecontamGram, PipelineShards, PackBudget)
        .orderBy("doc_id")
    })
  )

  protected val trainprepOracles: Map[String, String] = Map(
    // Replay of TrainPrep.temperatureMix: isqrt weights (float sqrt +
    // ±1 fixup — exact ⌊√n⌋ on both engines), largest-remainder
    // apportionment, salted hash-ppm rate selection.
    "tp_temperature_mix" ->
      s"""WITH c AS (SELECT source, count(*) AS n_docs
         |  FROM documents GROUP BY source),
         |w AS (SELECT source, n_docs,
         |    CASE WHEN (s1 + 1) * (s1 + 1) <= n_docs THEN s1 + 1
         |         WHEN s1 * s1 > n_docs THEN s1 - 1
         |         ELSE s1 END AS weight
         |  FROM (SELECT source, n_docs,
         |      CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s1
         |    FROM c)),
         |t AS (SELECT CAST(sum(weight) AS BIGINT) AS wtot FROM w),
         |a0 AS (SELECT source, n_docs, weight,
         |    ($TempMixBudget * weight) // wtot AS tgt0,
         |    $TempMixBudget * weight
         |      - (($TempMixBudget * weight) // wtot) * wtot AS rem
         |  FROM w CROSS JOIN t),
         |lf AS (SELECT $TempMixBudget - CAST(sum(tgt0) AS BIGINT) AS lft
         |  FROM a0),
         |al AS (SELECT source, n_docs, weight,
         |    tgt0 + CASE WHEN row_number()
         |        OVER (ORDER BY rem DESC, source) <= lft
         |      THEN 1 ELSE 0 END AS target
         |  FROM a0 CROSS JOIN lf),
         |ar AS (SELECT source, n_docs, weight, target,
         |    least(1000000, target * 1000000 // n_docs) AS rate_ppm
         |  FROM al)
         |SELECT d.doc_id, d.source, ar.n_docs, ar.weight,
         |  CAST(ar.target AS BIGINT) AS target, ar.rate_ppm
         |FROM documents d JOIN ar ON d.source = ar.source
         |WHERE CAST(('0x' || substr(md5(d.source || ':' ||
         |    CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |  % 1000000 < ar.rate_ppm
         |ORDER BY d.doc_id""".stripMargin,
    "tp_sample_hash" ->
      s"""WITH b AS (SELECT doc_id, ${hashBucketSql("doc_id")} AS bucket
         |  FROM documents)
         |SELECT doc_id, bucket FROM b
         |WHERE bucket < $SamplePct ORDER BY doc_id""".stripMargin,
    "tp_importance_resample" ->
      s"""WITH tk AS (SELECT doc_id, lang = 'en' AS is_target,
         |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
         |  FROM documents),
         |c AS (SELECT t, CAST(count(*) AS BIGINT) AS cb,
         |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ct
         |  FROM tk GROUP BY t),
         |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS tb,
         |    CAST(sum(ct) AS BIGINT) AS tt,
         |    CAST(count(*) AS BIGINT) AS v
         |  FROM c),
         |imp AS (SELECT t,
         |    CAST(length(bin((tb + v) // (cb + 1))) AS BIGINT)
         |      - CAST(length(bin((tt + v) // (ct + 1))) AS BIGINT)
         |      AS imp_bits
         |  FROM c CROSS JOIN tot),
         |pd AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(imp.imp_bits) AS BIGINT) AS imp_bits_total
         |  FROM tk JOIN imp USING (t) GROUP BY tk.doc_id),
         |sc AS (SELECT d.doc_id,
         |    CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
         |      AS is_target,
         |    coalesce(pd.n_tokens, 0) AS n_tokens,
         |    coalesce(pd.imp_bits_total, 0) AS imp_bits_total,
         |    CASE WHEN coalesce(pd.n_tokens, 0) > 0
         |      THEN pd.imp_bits_total * 1000000 // pd.n_tokens
         |      ELSE 0 END AS score_ppm
         |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id),
         |r AS (SELECT *,
         |    least(1000000, greatest(0, 1000000 + $RsSlope * score_ppm))
         |      AS rate_ppm,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 1000000 AS hash_ppm
         |  FROM sc)
         |SELECT doc_id, is_target, n_tokens, imp_bits_total, score_ppm,
         |  rate_ppm, hash_ppm,
         |  CAST(CASE WHEN hash_ppm < rate_ppm THEN 1 ELSE 0 END
         |    AS BIGINT) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "tp_epoch_plan" ->
      s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
         |      AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (SELECT source, n_docs, n_tokens,
         |    CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN s1 + 1
         |         WHEN s1 * s1 > n_tokens THEN s1 - 1
         |         ELSE s1 END AS weight
         |  FROM (SELECT source, n_docs, n_tokens,
         |      CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s1
         |    FROM c)),
         |t AS (SELECT CAST(sum(weight) AS BIGINT) AS wtot FROM w),
         |a0 AS (SELECT source, n_docs, n_tokens, weight,
         |    ($EpochBudget * weight) // wtot AS tgt0,
         |    $EpochBudget * weight
         |      - (($EpochBudget * weight) // wtot) * wtot AS rem
         |  FROM w CROSS JOIN t),
         |lf AS (SELECT $EpochBudget - CAST(sum(tgt0) AS BIGINT) AS lft
         |  FROM a0),
         |al AS (SELECT source, n_docs, n_tokens, weight,
         |    tgt0 + CASE WHEN row_number()
         |        OVER (ORDER BY rem DESC, source) <= lft
         |      THEN 1 ELSE 0 END AS target_tokens
         |  FROM a0 CROSS JOIN lf)
         |SELECT source, n_docs, n_tokens, weight,
         |  CAST(target_tokens AS BIGINT) AS target_tokens,
         |  CAST(target_tokens * 1000000 // n_tokens AS BIGINT)
         |    AS epochs_ppm
         |FROM al ORDER BY source""".stripMargin,
    "tp_curriculum" ->
      s"""WITH s AS (SELECT doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+'))
         |      AS BIGINT) AS score,
         |    ${hashBucketSql("doc_id", CurriculumShards)} AS shard
         |  FROM documents)
         |SELECT doc_id, score, shard,
         |  CAST(ntile($CurriculumPhases) OVER w AS BIGINT) AS phase,
         |  CAST(row_number() OVER w AS BIGINT) AS seq
         |FROM s WINDOW w AS (PARTITION BY shard ORDER BY score, doc_id)
         |ORDER BY doc_id""".stripMargin,
    "tp_mix_weighted" ->
      s"""WITH a AS (SELECT doc_id FROM documents),
         |b AS (SELECT doc_id + $IdShift AS doc_id FROM documents),
         |ah AS (SELECT doc_id, ${hashBucketSql("doc_id")} AS bucket FROM a),
         |bh AS (SELECT doc_id, ${hashBucketSql("doc_id")} AS bucket FROM b),
         |u AS (
         |  SELECT doc_id, bucket, 0 AS source_id FROM ah
         |    WHERE bucket >= 0 AND bucket < $MixWeightA
         |  UNION ALL
         |  SELECT doc_id, bucket, 1 AS source_id FROM bh
         |    WHERE bucket >= $MixWeightA AND bucket < 100)
         |SELECT doc_id, bucket, source_id FROM u ORDER BY doc_id""".stripMargin,
    "tp_sample_weighted" ->
      s"""WITH w AS (SELECT doc_id, lang,
         |  CASE WHEN lang = 'en' THEN 25 ELSE 75 END AS keep_pct,
         |  ${hashBucketSql("doc_id")} AS bucket FROM documents)
         |SELECT doc_id, lang, keep_pct, bucket FROM w
         |WHERE bucket < keep_pct ORDER BY doc_id""".stripMargin,
    "tp_token_budget" ->
      s"""WITH n AS (SELECT doc_id, source, n_chars,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_chars, n_tokens,
         |  COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY n_chars DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS tokens_before
         |  FROM n)
         |SELECT doc_id, source, n_chars, n_tokens, tokens_before,
         |  tokens_before < $CurateBudget AS selected
         |FROM c ORDER BY doc_id""".stripMargin,
    "tp_pack_sequences" ->
      s"""WITH n AS (SELECT doc_id, lang,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, lang, n_tokens,
         |  COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS tokens_before
         |  FROM n)
         |SELECT doc_id, lang, n_tokens, tokens_before,
         |  CAST(floor(tokens_before / $PackBudget) AS BIGINT) AS bin
         |FROM c ORDER BY doc_id""".stripMargin,
    "tp_stratified_split" ->
      s"""WITH b AS (SELECT doc_id, lang,
         |  CAST(('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
         |  FROM documents)
         |SELECT doc_id, lang, bucket,
         |  CASE WHEN bucket < $SplitTestPct THEN 'test'
         |       WHEN bucket < ${SplitTestPct + SplitValPct} THEN 'val'
         |       ELSE 'train' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    // DuckDB list slice w[a:b] is 1-based INCLUSIVE of both ends and
    // clamps past-the-end, matching Spark slice(w, a, len) exactly.
    "tp_chunk_windows" ->
      s"""WITH w AS (SELECT doc_id,
         |  regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |j AS (SELECT doc_id, w,
         |  unnest(generate_series(0, greatest(len(w) - 1, 0) // $ChunkStride)) AS j
         |  FROM w)
         |SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
         |  array_to_string(w[j*$ChunkStride+1 : j*$ChunkStride+$ChunkWindow], ' ') AS chunk_text,
         |  CAST(least($ChunkWindow, len(w) - j*$ChunkStride) AS BIGINT) AS n_words
         |FROM j ORDER BY doc_id, chunk_id""".stripMargin,
    // The four-stage pipeline, stage by stage in SQL: quality + langid
    // filters (same fragments as tx_quality / tx_langid), LSH-verified
    // near-dedup (same CTEs as dd_near_dedup, instantiated over the
    // FILTERED corpus q), per-shard packing (same window as
    // tp_pack_sequences).
    "tp_corpus_pipeline" -> {
      s"""WITH $doubledCte,
         |${qualityLangCtesOver("d", PipelineLang)},
         |${lshVerifyCtesOver("q")},
         |dropped AS (SELECT DISTINCT doc_b FROM j
         |  WHERE CAST(n_inter AS DOUBLE) / (n_both - n_inter) >= $JaccardThreshold),
         |kept AS (SELECT doc_id, text FROM q
         |  WHERE doc_id NOT IN (SELECT doc_b FROM dropped)),
         |pk AS (SELECT doc_id, doc_id % $PipelineShards AS shard,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM kept),
         |pc AS (SELECT doc_id, shard, n_tokens,
         |  COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS tokens_before
         |  FROM pk)
         |SELECT doc_id, shard, n_tokens, tokens_before,
         |  CAST(floor(tokens_before / $PackBudget) AS BIGINT) AS bin
         |FROM pc ORDER BY doc_id""".stripMargin
    },
    // The six-stage composition: the four tp_corpus_pipeline stages plus
    // decontamination (same gram construction as dd_decontaminate) and
    // the PII scrub chain (same pattern list as tx_pii_scrub), packing
    // on the SCRUBBED text.
    "tp_corpus_pipeline_full" -> {
      val counts = TextAnalysis.piiPatterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n  ")
      val countCols = TextAnalysis.piiPatterns
        .map { case (name, _, _) => s"n_$name" }.mkString(", ")
      val scrub = TextAnalysis.piiPatterns.foldLeft("text") {
        case (c, (_, pat, token)) =>
          s"regexp_replace($c, '$pat', '$token', 'g')"
      }
      s"""WITH $plantPiiCte,
         |d AS (SELECT doc_id, text FROM p
         |  UNION ALL SELECT doc_id + $IdShift, text || ' zzz zzz zzz' FROM p),
         |dt AS (SELECT doc_id, text FROM d WHERE doc_id % $EvalHoldout <> 0),
         |${qualityLangCtesOver("dt", PipelineLang)},
         |${lshVerifyCtesOver("q")},
         |dropped AS (SELECT DISTINCT doc_b FROM j
         |  WHERE CAST(n_inter AS DOUBLE) / (n_both - n_inter) >= $JaccardThreshold),
         |kept AS (SELECT doc_id, text FROM q
         |  WHERE doc_id NOT IN (SELECT doc_b FROM dropped)),
         |ev AS (SELECT doc_id, text FROM p WHERE doc_id % $EvalHoldout = 0),
         |evg AS (SELECT DISTINCT g FROM (${wordGramSelect("ev")})),
         |hit AS (SELECT DISTINCT doc_id
         |  FROM (${wordGramSelect("kept")}) kg JOIN evg USING (g)),
         |clean AS (SELECT doc_id, text FROM kept
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
         |sc AS (SELECT doc_id,
         |  $counts,
         |  $scrub AS scrubbed FROM clean),
         |pk AS (SELECT doc_id, doc_id % $PipelineShards AS shard, $countCols,
         |  CAST(len(regexp_split_to_array(trim(scrubbed), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM sc),
         |pc AS (SELECT doc_id, shard, $countCols, n_tokens,
         |  COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS tokens_before
         |  FROM pk)
         |SELECT doc_id, shard, $countCols, n_tokens, tokens_before,
         |  CAST(floor(tokens_before / $PackBudget) AS BIGINT) AS bin
         |FROM pc ORDER BY doc_id""".stripMargin
    }
  )

}
