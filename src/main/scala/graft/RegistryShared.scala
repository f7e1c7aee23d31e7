package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Shared foundation of the extension-registry family files
  * ([[RegistryDedup]], [[RegistrySimilarity]], [[RegistryTrainPrep]],
  * [[RegistryText]], [[RegistryEvents]], [[RegistryMultimodal]],
  * [[RegistryStreaming]]; composed by [[RegistryExt]]): the constants
  * referenced by BOTH the Spark plans and the generated oracle SQL, and
  * the cross-family DuckDB SQL builders. One definition site keeps a
  * plan and its oracle structurally in lockstep — the property the
  * whole correctness gate rests on. */
private[graft] trait RegistryShared {
  type Q = (SparkSession, String) => DataFrame

  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Shared constants — referenced by BOTH plans and oracle SQL.
  protected val NumHashes = 8
  protected val Bands = 4
  protected val JaccardThreshold = 0.5
  // Containment cut for dd_containment: admits the exact-subset
  // direction (1.0) and rejects the reverse unless a doc has ≥ 99
  // distinct tokens (fixture max is far below).
  protected val ContainThreshold = 0.99
  protected val NumQueries = 8L
  protected val TopK = 5
  protected val NumPlanes = 4
  protected val NeardupPlanes = 8
  protected val Dim = 64
  protected val SessionGapSeconds = 1800L
  /** Freshness bound for the tolerance-bounded as-of join (30 min in
    * micros) — referenced by BOTH the plan and the oracle SQL. */
  protected val AsofToleranceUs = 1800L * 1000000L
  /** HLL grading bound for the approx-rollup evals: |est − exact| ≤
    * max(1, exact·5%) — the EventsSpec/StreamingSpec bar (default HLL++
    * rsd 5%), in ppm so the grade is integer-exact. */
  protected val HllBoundPpm = 50000L
  protected val FunnelSteps = Seq("view", "click", "purchase")
  protected val PathTopK = 20
  // Attribution window for the stream-stream interval join (view→click).
  // 6 h keeps the fixture's pair count substantive (~250 at sf0.01).
  protected val StreamJoinWindowSeconds = 21600L
  // State partition count for run-to-completion streaming queries at
  // fixture scale: stateful operators pay per-partition state-store
  // machinery each micro-batch (a stream-stream join keeps 4 stores per
  // partition), so 8 beats the session's 32 here (measured 5.7s → 2.3s
  // on the interval join). Size UP on a real cluster.
  protected val StreamStateParts = Some(8)
  protected val IdShift = 1000000L
  /** Fuzzy-dedup block-size cap (plan AND oracle): a prefix block
    * bigger than this is mass duplication owned by the O(n) hash paths
    * — pairwise edit distance inside it would be quadratic in the
    * duplication factor (round-18 sf10: one 16,500-doc block → 324.8M
    * pairs). 200 leaves the sf0.01/sf0.1 fixtures bit-identical (their
    * largest block is 165). */
  protected val FuzzyMaxBlock = 200
  // Decontamination: eval holdout = ids divisible by 50; word-3-grams
  // (the fixture vocabulary is tiny, so 3-grams give a dense overlap
  // signal; production suites use 8–13).
  protected val EvalHoldout = 50L
  protected val DecontamGram = 3
  // Corpus pipeline: language kept after the quality gate; shard count
  // for the packing stage.
  protected val PipelineLang = "en"
  protected val PipelineShards = 4

  // ---------------------------------------------------------------------
  // Oracle SQL builders (DuckDB dialect)
  // ---------------------------------------------------------------------

  /** Word 3-shingle CTEs over a relation with (doc_id, text), ending in
    * `shh(doc_id, h)` — h is the polynomial shingle hash (base 257 mod
    * 2^32, list_reduce over codepoints), computed once per shingle and
    * shared by all k permutations. Same arithmetic as
    * graft.functions.MinhashSig. */
  protected def shingleCtes(src: String): String = {
    val B = graft.functions.RollingHash.Base
    s"""w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM $src),
       |sh AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
       |  THEN list_transform(generate_series(1, len(w) - 2),
       |                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |  ELSE CAST([] AS VARCHAR[]) END) AS shingle FROM w),
       |shh AS MATERIALIZED (SELECT doc_id, list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(shingle) + 1),
       |                     i -> CAST(unicode(shingle[i:i]) AS BIGINT))),
       |    (x, y) -> (x * $B + y) % 4294967296) AS h FROM sh)""".stripMargin
  }

  /** Generated from the SAME permutation constants as the Spark plan
    * (Dedup.minhashParams) — k affine permutations of the shared
    * shingle hash. */
  protected val mhSelects: String =
    Dedup.minhashParams(NumHashes).zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * h + $b) % ${Dedup.MinhashPrime}) AS mh$j"
    }.mkString(", ")

  /** The doubled near-dup corpus CTE (each doc + a copy gaining 3
    * trailing tokens) used by the dd_* oracles. */
  protected lazy val doubledCte: String =
    s"""d AS MATERIALIZED (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + $IdShift, text || ' zzz zzz zzz' FROM documents)""".stripMargin

  /** Deterministic PII planting over the documents table (the fixture
    * text has no real PII): an email on 4 of 5 docs, an IPv4 on all, a
    * phone on every third — zero-count paths stay covered. Shared by
    * tx_pii_scrub and the full corpus pipeline; [[plantPiiCte]] is the
    * same construction as a DuckDB CTE `p(doc_id, text)`. */
  protected def plantPii(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    d.select(col("doc_id"), concat_ws(" ", col("text"),
      when(col("doc_id") % 5 =!= 0,
        concat(col("source"), lit("."), col("lang"), lit("@example.com"))),
      concat(lit("10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string")),
      when(col("doc_id") % 3 === 0,
        concat(lit("+1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))))
      .as("text"))

  protected val plantPiiCte: String =
    """p AS (SELECT doc_id, concat_ws(' ', text,
      |  CASE WHEN doc_id % 5 <> 0 THEN source || '.' || lang || '@example.com' END,
      |  '10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR),
      |  CASE WHEN doc_id % 3 = 0 THEN '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END
      |) AS text FROM documents)""".stripMargin

  /** Distinct word `DecontamGram`-grams of a (doc_id, text) relation —
    * the same shingle construction as `Dedup.shingles` (and the
    * dd_decontaminate oracle). Yields a CTE body selecting (doc_id, g). */
  protected def wordGramSelect(src: String): String =
    s"""SELECT doc_id, unnest(CASE WHEN len(w) >= $DecontamGram
       |    THEN list_transform(generate_series(1, len(w) - ${DecontamGram - 1}),
       |                        i -> array_to_string(w[i:i+${DecontamGram - 1}], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM $src)""".stripMargin

  /** Minhash signatures, band explode, and the candidate-pair bucket
    * join over ANY (doc_id, text) relation `src`. */
  protected def lshCandCtesOver(src: String): String = {
    val rows = NumHashes / Bands
    val bandSelects = (0 until Bands).map { b =>
      val sig = (0 until rows).map(r => s"mh${b * rows + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString("\n  UNION ALL ")
    s"""${shingleCtes(src)},
       |mh AS MATERIALIZED (SELECT doc_id, $mhSelects FROM shh GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  $bandSelects),
       |cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
       |  WHERE a.doc_id < b.doc_id)""".stripMargin
  }

  /** [[lshCandCtesOver]] plus exact-Jaccard verification of the
    * candidates (distinct-token arrays, intersection counts). */
  protected def lshVerifyCtesOver(src: String): String =
    s"""${lshCandCtesOver(src)},
       |tok AS MATERIALIZED (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks FROM $src),
       |j AS MATERIALIZED (SELECT doc_a, doc_b,
       |    CAST(length(list_intersect(ta.toks, tb.toks)) AS BIGINT) AS n_inter,
       |    CAST(length(ta.toks) AS BIGINT) + CAST(length(tb.toks) AS BIGINT) AS n_both
       |  FROM cand
       |  JOIN tok ta ON ta.doc_id = doc_a
       |  JOIN tok tb ON tb.doc_id = doc_b)""".stripMargin

  /** Quality + language-ID filter CTEs over a (doc_id, text) relation
    * `src`, ending in `q(doc_id, text, n_tokens)` — the survivors of the
    * SAME thresholds and argmax/tiebreak as
    * `TextAnalysis.qualityKeepCol` / `langGuessCol`. Shared by the
    * corpus-pipeline oracles (batch and streaming). */
  protected def qualityLangCtesOver(src: String, keepLang: String): String = {
    val scores = TextAnalysis.stopwords.map { case (l, ws) =>
      s"CAST(len(list_filter(w, t -> t IN (${inList(ws)}))) AS BIGINT) AS s_$l"
    }.mkString(",\n  ")
    val best = TextAnalysis.stopwords.map { case (l, _) => s"s_$l" }
      .mkString("greatest(", ", ", ")")
    val cases = TextAnalysis.stopwords.map { case (l, _) =>
      s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
    }.mkString("\n      ")
    s"""lw AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w FROM $src),
       |ls AS (SELECT doc_id, text,
       |  CAST(len(text) AS BIGINT) AS n_chars,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
       |  $scores
       |FROM lw),
       |q AS (SELECT doc_id, text, n_tokens FROM ls
       |  WHERE n_tokens >= 5 AND n_tokens <= 100000
       |    AND (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) < CAST(0.2 AS DOUBLE)
       |    AND (CASE $cases ELSE 'und' END) = '$keepLang')""".stripMargin
  }

  /** Doubled-corpus instantiations — shared by the dd_* oracles. */
  protected lazy val lshCandCtes: String =
    s"$doubledCte,\n${lshCandCtesOver("d")}"
  protected lazy val lshVerifyCtes: String =
    s"$doubledCte,\n${lshVerifyCtesOver("d")}"

  /** Exact BIGINT dot product of two list columns (len = Dim). */
  protected def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) AS BIGINT)"

  /** Plane-literal dot: list column vs an inline ±1 literal list. */
  protected def planeDotSql(v: String, p: IndexedSeq[Long]): String =
    s"CAST(list_sum(list_transform(generate_series(1, $Dim), " +
      s"i -> $v[i] * (LIST_VALUE(${p.mkString(", ")}))[i])) AS BIGINT)"


  protected def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  // Quality-model weights (stand-in for trained classifier weights;
  // interpolated into BOTH the batch and streaming oracles). Bias
  // picked so the sf0.01 fixture splits ~261 keep / 239 drop.
  protected val QmWStop = 3L
  protected val QmWPunct = 5L
  protected val QmWLen = 20000L
  protected val QmBias = 300000L

  /** The tx_quality_model oracle body, shared with its streaming dual
    * (a drained deduplicated stream must equal the batch scoring
    * value-for-value). */
  protected def qualityModelOracleSql: String = {
    val en = inList(graft.operators.TextAnalysis.stopwords.toMap
      .apply("en"))
    s"""WITH w AS (SELECT doc_id, text,
       |    regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents),
       |m AS (SELECT doc_id,
       |  CAST(len(text) AS BIGINT) AS n_chars,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(text) - len(regexp_replace(text,
       |    '[^A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
       |  CAST(len(list_filter(w, t -> t IN ($en))) AS BIGINT)
       |    AS n_stopwords
       |FROM w),
       |f AS (SELECT doc_id,
       |  CASE WHEN n_tokens > 0 THEN n_stopwords * 1000000 // n_tokens
       |    ELSE 0 END AS stop_ppm,
       |  CASE WHEN n_chars > 0 THEN n_punct * 1000000 // n_chars
       |    ELSE 0 END AS punct_ppm,
       |  CASE WHEN n_tokens > 0
       |    THEN CAST(length(bin(n_tokens)) AS BIGINT)
       |    ELSE 0 END AS len_bits
       |FROM m)
       |SELECT doc_id, stop_ppm, punct_ppm, len_bits,
       |  $QmWStop * stop_ppm - $QmWPunct * punct_ppm
       |    + $QmWLen * len_bits - $QmBias AS score_q,
       |  CAST(CASE WHEN $QmWStop * stop_ppm - $QmWPunct * punct_ppm
       |    + $QmWLen * len_bits - $QmBias > 0 THEN 1 ELSE 0 END
       |    AS BIGINT) AS keep_model
       |FROM f ORDER BY doc_id""".stripMargin
  }
}
