package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Extension registry: the training-data-pipeline operators
  * (SURVEY.md §7.2 M5) — dedup, similarity search, text analysis, and
  * event/stream rollups — each with a DuckDB oracle whose SQL is
  * generated from the same constants as the Spark plan, so the two
  * stay structurally in lockstep.
  *
  * Determinism notes (same rules as [[Registry]]):
  *  - all hashing is md5 over explicit strings (no murmur3/hashCode);
  *  - embeddings are quantized to BIGINT before any arithmetic, so dot
  *    products are exact integer math; cosine/ratios are derived with an
  *    identical expression shape in Spark and the oracle;
  *  - every query ends in a total ORDER BY;
  *  - the documents fixture has no duplicate texts, so dedup queries
  *    synthesize duplicates in-query (UNION ALL of a shifted copy) —
  *    deterministically, mirrored in the oracle.
  */
object RegistryExt {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Shared constants — referenced by BOTH plans and oracle SQL.
  private val NumHashes = 8
  private val Bands = 4
  private val JaccardThreshold = 0.5
  // Containment cut for dd_containment: admits the exact-subset
  // direction (1.0) and rejects the reverse unless a doc has ≥ 99
  // distinct tokens (fixture max is far below).
  private val ContainThreshold = 0.99
  private val NumQueries = 8L
  private val TopK = 5
  private val NumPlanes = 4
  private val NeardupPlanes = 8
  private val Dim = 64
  private val SessionGapSeconds = 1800L
  private val FunnelSteps = Seq("view", "click", "purchase")
  private val PathTopK = 20
  // Attribution window for the stream-stream interval join (view→click).
  // 6 h keeps the fixture's pair count substantive (~250 at sf0.01).
  private val StreamJoinWindowSeconds = 21600L
  // State partition count for run-to-completion streaming queries at
  // fixture scale: stateful operators pay per-partition state-store
  // machinery each micro-batch (a stream-stream join keeps 4 stores per
  // partition), so 8 beats the session's 32 here (measured 5.7s → 2.3s
  // on the interval join). Size UP on a real cluster.
  private val StreamStateParts = Some(8)
  private val IdShift = 1000000L
  // Decontamination: eval holdout = ids divisible by 50; word-3-grams
  // (the fixture vocabulary is tiny, so 3-grams give a dense overlap
  // signal; production suites use 8–13).
  private val EvalHoldout = 50L
  private val DecontamGram = 3
  // Corpus pipeline: language kept after the quality gate; shard count
  // for the packing stage.
  private val PipelineLang = "en"
  private val PipelineShards = 4

  // ---------------------------------------------------------------------
  // Oracle SQL builders (DuckDB dialect)
  // ---------------------------------------------------------------------

  /** Word 3-shingle CTEs over a relation with (doc_id, text), ending in
    * `shh(doc_id, h)` — h is the polynomial shingle hash (base 257 mod
    * 2^32, list_reduce over codepoints), computed once per shingle and
    * shared by all k permutations. Same arithmetic as
    * graft.functions.MinhashSig. */
  private def shingleCtes(src: String): String = {
    val B = graft.functions.RollingHash.Base
    s"""w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM $src),
       |sh AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
       |  THEN list_transform(generate_series(1, len(w) - 2),
       |                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |  ELSE CAST([] AS VARCHAR[]) END) AS shingle FROM w),
       |shh AS (SELECT doc_id, list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(shingle) + 1),
       |                     i -> CAST(unicode(shingle[i:i]) AS BIGINT))),
       |    (x, y) -> (x * $B + y) % 4294967296) AS h FROM sh)""".stripMargin
  }

  /** Generated from the SAME permutation constants as the Spark plan
    * (Dedup.minhashParams) — k affine permutations of the shared
    * shingle hash. */
  private val mhSelects: String =
    Dedup.minhashParams(NumHashes).zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * h + $b) % ${Dedup.MinhashPrime}) AS mh$j"
    }.mkString(", ")

  /** The doubled near-dup corpus CTE (each doc + a copy gaining 3
    * trailing tokens) used by the dd_* oracles. */
  private lazy val doubledCte: String =
    s"""d AS (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + $IdShift, text || ' zzz zzz zzz' FROM documents)""".stripMargin

  /** Deterministic PII planting over the documents table (the fixture
    * text has no real PII): an email on 4 of 5 docs, an IPv4 on all, a
    * phone on every third — zero-count paths stay covered. Shared by
    * tx_pii_scrub and the full corpus pipeline; [[plantPiiCte]] is the
    * same construction as a DuckDB CTE `p(doc_id, text)`. */
  private def plantPii(d: org.apache.spark.sql.DataFrame)
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

  private val plantPiiCte: String =
    """p AS (SELECT doc_id, concat_ws(' ', text,
      |  CASE WHEN doc_id % 5 <> 0 THEN source || '.' || lang || '@example.com' END,
      |  '10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR),
      |  CASE WHEN doc_id % 3 = 0 THEN '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END
      |) AS text FROM documents)""".stripMargin

  /** Distinct word `DecontamGram`-grams of a (doc_id, text) relation —
    * the same shingle construction as `Dedup.shingles` (and the
    * dd_decontaminate oracle). Yields a CTE body selecting (doc_id, g). */
  private def wordGramSelect(src: String): String =
    s"""SELECT doc_id, unnest(CASE WHEN len(w) >= $DecontamGram
       |    THEN list_transform(generate_series(1, len(w) - ${DecontamGram - 1}),
       |                        i -> array_to_string(w[i:i+${DecontamGram - 1}], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM $src)""".stripMargin

  /** Minhash signatures, band explode, and the candidate-pair bucket
    * join over ANY (doc_id, text) relation `src`. */
  private def lshCandCtesOver(src: String): String = {
    val rows = NumHashes / Bands
    val bandSelects = (0 until Bands).map { b =>
      val sig = (0 until rows).map(r => s"mh${b * rows + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString("\n  UNION ALL ")
    s"""${shingleCtes(src)},
       |mh AS (SELECT doc_id, $mhSelects FROM shh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
       |  WHERE a.doc_id < b.doc_id)""".stripMargin
  }

  /** [[lshCandCtesOver]] plus exact-Jaccard verification of the
    * candidates (distinct-token arrays, intersection counts). */
  private def lshVerifyCtesOver(src: String): String =
    s"""${lshCandCtesOver(src)},
       |tok AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks FROM $src),
       |j AS (SELECT doc_a, doc_b,
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
  private def qualityLangCtesOver(src: String, keepLang: String): String = {
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
  private lazy val lshCandCtes: String =
    s"$doubledCte,\n${lshCandCtesOver("d")}"
  private lazy val lshVerifyCtes: String =
    s"$doubledCte,\n${lshVerifyCtesOver("d")}"

  /** Exact BIGINT dot product of two list columns (len = Dim). */
  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) AS BIGINT)"

  /** Plane-literal dot: list column vs an inline ±1 literal list. */
  private def planeDotSql(v: String, p: IndexedSeq[Long]): String =
    s"CAST(list_sum(list_transform(generate_series(1, $Dim), " +
      s"i -> $v[i] * (LIST_VALUE(${p.mkString(", ")}))[i])) AS BIGINT)"

  // ---------------------------------------------------------------------
  // Dedup
  // ---------------------------------------------------------------------

  private val dedup: Map[String, Q] = Map(
    // Exact dedup: the fixture has no duplicate texts, so duplicate every
    // doc under a shifted id; the operator must keep the original id and
    // report dup_count = 2.
    "dd_exact_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val doubled = d.unionAll(
        d.select((col("doc_id") + IdShift).as("doc_id"), col("text")))
      Dedup.exactDedup(doubled, "doc_id", Seq("text"))
        .select("doc_id", "dup_count")
        .orderBy("doc_id")
    }),

    // MinHash signatures (k=8) straight over the fixture.
    "dd_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignature(t(s, dir, "documents"), "doc_id", "text", NumHashes)
        .orderBy("doc_id")),

    // LSH candidate pairs over near-duplicates: each doc is paired with a
    // copy whose text gained three trailing tokens — most minhashes agree
    // so the banded bucket join must surface the pair.
    "dd_lsh_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val near = d.unionAll(d.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text")))
      val sig = Dedup.minhashSignature(near, "doc_id", "text", NumHashes)
      Dedup.lshCandidatePairs(sig, "doc_id", NumHashes, Bands)
        .orderBy("doc_a", "doc_b")
    }),

    "dd_simhash" -> ((s, dir) =>
      Dedup.simhash32(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // NOTE: the id-bounded all-pairs Jaccard baseline (Dedup.jaccardPairs)
    // is deliberately NOT registered — its posting-list self-join is
    // quadratic per token and survives only behind an id-range crutch,
    // and the registry should contain nothing that could not run at
    // 100×. It stays spec-tested (DedupSpec "jaccardPairs computes exact
    // set overlap"); the scale path is the composition below.

    // LSH → exact-Jaccard COMPOSITION: candidates from the banded
    // bucket join, verified by intersecting only the candidates' token
    // arrays — the scale path with no id-range crutch (contrast
    // dd_jaccard, the bounded posting-list baseline).
    "dd_jaccard_lsh" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val near = d.unionAll(d.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text")))
      val cands = Dedup.lshCandidatePairs(
        Dedup.minhashSignature(near, "doc_id", "text", NumHashes),
        "doc_id", NumHashes, Bands)
      Dedup.jaccardOfPairs(near, cands, "doc_id", "text", JaccardThreshold)
        .orderBy("doc_a", "doc_b")
    }),

    // The full dedup pipeline END-TO-END: LSH candidates → exact
    // verification → near-dup REMOVAL (drop the greater id of every
    // verified pair; every planted near-dup copy vanishes, originals
    // survive).
    "dd_near_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val near = d.unionAll(d.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text")))
      val verified = Dedup.jaccardOfPairs(near,
        Dedup.lshCandidatePairs(
          Dedup.minhashSignature(near, "doc_id", "text", NumHashes),
          "doc_id", NumHashes, Bands),
        "doc_id", "text", JaccardThreshold)
      Dedup.dropNearDuplicates(near, verified, "doc_id")
        .select("doc_id").orderBy("doc_id")
    }),

    // Duplicate-cluster GROUPING: connected components over the verified
    // pair graph — every doc labeled with its cluster's min id + the
    // cluster size (what a 100 TB dedup reports). Oracle = DuckDB
    // recursive transitive closure over the same verified pairs.
    "dd_components" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val near = d.unionAll(d.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text")))
      val verified = Dedup.jaccardOfPairs(near,
        Dedup.lshCandidatePairs(
          Dedup.minhashSignature(near, "doc_id", "text", NumHashes),
          "doc_id", NumHashes, Bands),
        "doc_id", "text", JaccardThreshold)
      Dedup.connectedComponents(near, verified, "doc_id")
        .orderBy("doc_id")
    }),

    // Directional containment over the LSH candidates of the doubled
    // corpus: every original's token set ⊂ its zzz-suffixed copy, so
    // original→copy scores exactly 1.0; the reverse direction crosses
    // 0.99 only if the copy's sole extra token is within budget —
    // orientation is the semantics under test.
    "dd_containment" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val near = d.unionAll(d.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text")))
      Dedup.containmentOfPairs(near,
        Dedup.lshCandidatePairs(
          Dedup.minhashSignature(near, "doc_id", "text", NumHashes),
          "doc_id", NumHashes, Bands),
        "doc_id", "text", ContainThreshold)
        .orderBy("contained_id", "container_id")
    }),

    // Quality-aware dedup ending: same doubled corpus and verified-pair
    // chain as dd_components, but electing each cluster's best copy by
    // the fixture's n_chars score (shifted copies carry the SAME score,
    // so the tie-break keeps the ORIGINAL id canonical — the outcome a
    // production pipeline wants).
    "dd_cluster_canonical" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text", "n_chars")
      val near = d.unionAll(d.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text"),
        col("n_chars")))
      val verified = Dedup.jaccardOfPairs(near,
        Dedup.lshCandidatePairs(
          Dedup.minhashSignature(near, "doc_id", "text", NumHashes),
          "doc_id", NumHashes, Bands),
        "doc_id", "text", JaccardThreshold)
      Dedup.clusterCanonical(near, verified, "doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // Blocked edit-distance (fuzzy) pairing: prefix block → levenshtein
    // only among block-mates (the Jaccard path's string-similarity
    // dual). Fixture distances are bimodal (near-dups ≤ 4, unrelated
    // ≥ 37) so the ≤ 20 cut is robustly inside the gap.
    "dd_fuzzy_pairs" -> ((s, dir) =>
      Dedup.fuzzyPairs(t(s, dir, "documents"), "doc_id", "text",
          blockLen = 8, cmpLen = 80, maxDist = 20)
        .orderBy("doc_a", "doc_b")),

    // Benchmark DECONTAMINATION audit: docs at id % EvalHoldout == 0
    // play the eval suite; every remaining (training) doc is labeled
    // with its distinct overlapping word-3-gram count and the keep/drop
    // verdict. Eval shingles broadcast (a benchmark suite is small by
    // construction); the corpus side never shuffles its text.
    "dd_decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.contaminationAudit(
          d.where(col("doc_id") % EvalHoldout =!= 0),
          d.where(col("doc_id") % EvalHoldout === 0),
          "doc_id", "text", DecontamGram)
        .orderBy("doc_id")
    }),

    // Decontamination as a DROP with the bloom-prefiltered plan: the
    // sketch prunes the corpus's exploded grams pre-exchange, the exact
    // broadcast join kills false positives, so the output (and oracle)
    // is exactly the exact path's surviving-document set.
    "dd_decontaminate_bloom" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.decontaminateBloom(
          d.where(col("doc_id") % EvalHoldout =!= 0),
          d.where(col("doc_id") % EvalHoldout === 0),
          "doc_id", "text", DecontamGram)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    })
  )

  private val dedupOracles: Map[String, String] = Map(
    "dd_exact_dedup" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + $IdShift, text FROM documents)
         |SELECT min(doc_id) AS doc_id, count(*) AS dup_count
         |FROM d GROUP BY text ORDER BY doc_id""".stripMargin,
    "dd_minhash_sig" ->
      s"""WITH ${shingleCtes("documents")}
         |SELECT doc_id, $mhSelects
         |FROM shh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dd_lsh_pairs" ->
      s"""WITH $lshCandCtes
         |SELECT doc_a, doc_b FROM cand
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_jaccard_lsh" ->
      s"""WITH $lshVerifyCtes
         |SELECT doc_a, doc_b, n_inter,
         |  n_both - n_inter AS n_union,
         |  CAST(n_inter AS DOUBLE) / (n_both - n_inter) AS jaccard
         |FROM j
         |WHERE CAST(n_inter AS DOUBLE) / (n_both - n_inter) >= $JaccardThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_near_dedup" ->
      s"""WITH $lshVerifyCtes,
         |dropped AS (SELECT DISTINCT doc_b FROM j
         |  WHERE CAST(n_inter AS DOUBLE) / (n_both - n_inter) >= $JaccardThreshold)
         |SELECT doc_id FROM d
         |WHERE doc_id NOT IN (SELECT doc_b FROM dropped)
         |ORDER BY doc_id""".stripMargin,
    "dd_fuzzy_pairs" ->
      """WITH d AS (SELECT doc_id,
        |  substr(regexp_replace(regexp_replace(trim(lower(text)),
        |    '\s+', ' ', 'g'), '[^ -~]', '', 'g'), 1, 80) AS head
        |  FROM documents),
        |b AS (SELECT doc_id, head, substr(head, 1, 8) AS block FROM d)
        |SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
        |  levenshtein(a.head, bb.head) AS edit_dist
        |FROM b a JOIN b bb ON a.block = bb.block AND a.doc_id < bb.doc_id
        |WHERE levenshtein(a.head, bb.head) <= 20
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_components" ->
      s"""WITH RECURSIVE $lshVerifyCtes,
         |vp AS (SELECT doc_a, doc_b FROM j
         |  WHERE CAST(n_inter AS DOUBLE) / (n_both - n_inter) >= $JaccardThreshold),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM vp
         |  UNION ALL SELECT doc_b, doc_a FROM vp),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lbl AS (SELECT src AS node, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |nodes AS (SELECT doc_id, COALESCE(l.cluster_id, doc_id) AS cluster_id
         |  FROM d LEFT JOIN lbl l ON d.doc_id = l.node),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size
         |  FROM nodes GROUP BY cluster_id)
         |SELECT n.doc_id, n.cluster_id, s.cluster_size
         |FROM nodes n JOIN sz s USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    // Same candidate CTEs as the pair queries; both directions scored
    // from one j, oriented rows unioned. Division of small BIGINTs is
    // bit-deterministic IEEE on both engines.
    "dd_containment" ->
      s"""WITH $doubledCte,
         |${lshCandCtesOver("d")},
         |tok AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks FROM d),
         |j AS (SELECT doc_a, doc_b,
         |    CAST(length(list_intersect(ta.toks, tb.toks)) AS BIGINT) AS n_inter,
         |    CAST(length(ta.toks) AS BIGINT) AS n_a,
         |    CAST(length(tb.toks) AS BIGINT) AS n_b
         |  FROM cand
         |  JOIN tok ta ON ta.doc_id = doc_a
         |  JOIN tok tb ON tb.doc_id = doc_b),
         |u AS (
         |  SELECT doc_a AS contained_id, doc_b AS container_id, n_inter,
         |    n_a AS n_contained, CAST(n_inter AS DOUBLE) / n_a AS containment
         |  FROM j WHERE CAST(n_inter AS DOUBLE) / n_a >= $ContainThreshold
         |  UNION ALL
         |  SELECT doc_b, doc_a, n_inter,
         |    n_b, CAST(n_inter AS DOUBLE) / n_b
         |  FROM j WHERE CAST(n_inter AS DOUBLE) / n_b >= $ContainThreshold)
         |SELECT contained_id, container_id, n_inter, n_contained, containment
         |FROM u ORDER BY contained_id, container_id""".stripMargin,
    // dd_components' recursive-CTE chain plus the per-cluster election:
    // row_number over (n_chars DESC, doc_id) replays the Spark side's
    // max(struct(score, -id)) exactly. The doubled CTE carries the
    // fixture n_chars through the shifted copies unchanged.
    "dd_cluster_canonical" ->
      s"""WITH RECURSIVE dsc AS (SELECT doc_id, text, n_chars FROM documents
         |  UNION ALL SELECT doc_id + $IdShift, text || ' zzz zzz zzz', n_chars FROM documents),
         |${lshVerifyCtesOver("dsc")},
         |vp AS (SELECT doc_a, doc_b FROM j
         |  WHERE CAST(n_inter AS DOUBLE) / (n_both - n_inter) >= $JaccardThreshold),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM vp
         |  UNION ALL SELECT doc_b, doc_a FROM vp),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |lbl AS (SELECT src AS node, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |nodes AS (SELECT doc_id, COALESCE(l.cluster_id, doc_id) AS cluster_id
         |  FROM dsc LEFT JOIN lbl l ON dsc.doc_id = l.node),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size
         |  FROM nodes GROUP BY cluster_id),
         |best AS (SELECT cluster_id, doc_id AS canonical_id FROM (
         |  SELECT n.cluster_id, n.doc_id,
         |    row_number() OVER (PARTITION BY n.cluster_id
         |      ORDER BY d2.n_chars DESC, n.doc_id) AS rn
         |  FROM nodes n JOIN dsc d2 USING (doc_id))
         |  WHERE rn = 1)
         |SELECT n.doc_id, n.cluster_id, s.cluster_size, b.canonical_id,
         |  n.doc_id = b.canonical_id AS is_canonical
         |FROM nodes n JOIN sz s USING (cluster_id) JOIN best b USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    "dd_simhash" -> {
      val sums = (0 until 32).map { b =>
        val pos = 1 + b / 4
        val shift = b % 4
        s"SUM(CASE WHEN (((instr('0123456789abcdef', substr(md5(t), $pos, 1)) - 1) >> $shift) & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
      }.mkString(",\n  ")
      val bits = (0 until 32)
        .map(b => s"CASE WHEN s$b >= 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t FROM documents),
         |s AS (SELECT doc_id,
         |  $sums
         |FROM tok GROUP BY doc_id)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
         |FROM s ORDER BY doc_id""".stripMargin
    },
    // Distinct per-doc 3-grams both sides (Spark `shingles` is distinct
    // by default); eval = ids % EvalHoldout == 0; the audit covers every
    // training doc including zero-hit ones.
    "dd_decontaminate" ->
      s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, g FROM (
         |  SELECT doc_id, unnest(CASE WHEN len(w) >= $DecontamGram
         |    THEN list_transform(generate_series(1, len(w) - ${DecontamGram - 1}),
         |                        i -> array_to_string(w[i:i+${DecontamGram - 1}], ' '))
         |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM w)),
         |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % $EvalHoldout = 0),
         |hits AS (SELECT doc_id, count(*) AS n_hits
         |  FROM sh JOIN ev USING (g)
         |  WHERE doc_id % $EvalHoldout <> 0 GROUP BY doc_id)
         |SELECT d.doc_id, CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
         |  COALESCE(n_hits, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $EvalHoldout <> 0) d
         |LEFT JOIN hits USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // The bloom variant is result-identical to the exact drop: the
    // oracle is the plain anti-join, no sketch anywhere in it.
    "dd_decontaminate_bloom" ->
      s"""WITH sh AS (SELECT DISTINCT doc_id, g FROM (
         |  ${wordGramSelect("documents")})),
         |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % $EvalHoldout = 0),
         |hits AS (SELECT DISTINCT doc_id FROM sh JOIN ev USING (g)
         |  WHERE doc_id % $EvalHoldout <> 0)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id % $EvalHoldout <> 0
         |  AND doc_id NOT IN (SELECT doc_id FROM hits)
         |ORDER BY doc_id""".stripMargin
  )

  // ---------------------------------------------------------------------
  // Similarity search
  // ---------------------------------------------------------------------

  private val NumCentroids = 16
  private val NumProbes = 2
  // OR-amplification width for sim_lsh_topk: 16 independent 4-plane
  // tables. One sign-bucket table co-buckets a near-orthogonal true
  // neighbor with probability ≈ 2^-NumPlanes; the 16-table union lifts
  // recall@5 to ~0.7 at fixture scale (pinned by the SimilaritySpec
  // recall contract against brute-force ground truth).
  private val NumTables = 16
  private val KMeansIter = 2
  // SemDeDup cosine cut: only exact/near-exact copies at fixture scale
  // (random vectors are near-orthogonal); the literal appears verbatim
  // in both the Spark call and the oracle SQL.
  private val SemThreshold = 0.999
  // Large-k assignment demo: 400 centroids — big enough that the plan
  // must NOT inline the codebook as literals (the query forces the
  // reference-object path NearestCentroidExpr, the same path the
  // assignCol dispatcher takes automatically past LiteralAssignMaxK).
  private val NumCentroidsBig = 400
  // hierarchical assignment: √k-ish super count over the 400-entry
  // codebook — per-row work S + k/S = 40 distances instead of 400
  private val NumSupers = 20
  // refine: approximate top-25 from codes, exact re-scoring to top-5
  private val Rerank = 25

  private val similarity: Map[String, Q] = Map(
    // SemDeDup's clustering primitive at LARGE k: one narrow projection
    // assigning every vector to its L2-nearest of 400 codebook entries,
    // with the codebook riding the task binary (executor-memory-bounded
    // k) instead of plan literals (Janino-bounded k). Closes the
    // round-9 `weak` on the literal-codebook ceiling.
    "sim_assign_bigk" -> ((s, dir) =>
      Similarity.assignToCodebook(t(s, dir, "embeddings"), NumCentroidsBig,
        forceRef = true)
        .orderBy("vec_id")),
    // Two-level assignment past the large-k COMPUTE ceiling: the
    // codebook is itself clustered (one Lloyd's round over its 400
    // rows), rows probe the nearest super then argmin only within its
    // bin — S + k/S distances per row instead of k. Exact-integer at
    // both levels, so the oracle replays super training, binning, and
    // both argmins.
    "sim_assign_hier" -> ((s, dir) =>
      Similarity.assignHierarchical(t(s, dir, "embeddings"),
        NumCentroidsBig, NumSupers, 1, Dim)
        .orderBy("vec_id")),
    "sim_brute_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), NumQueries, TopK)
        .orderBy("query_id", "rank")),
    // Exact-integer Lloyd's training of the IVF codebook; the oracle
    // unrolls both iterations as CTEs and replays the argmin and the
    // truncating integer means bit-for-bit.
    "sim_kmeans" -> ((s, dir) =>
      Similarity.kMeans(t(s, dir, "embeddings"), NumCentroids, KMeansIter,
        Dim)
        .orderBy("cid", "i")),
    // k-means with deterministic farthest-point (maxmin) init — the
    // randomness-free k-means++ family member; cid = pick order. The
    // oracle unrolls the 15 sequential maxmin picks AND the Lloyd's
    // rounds.
    "sim_kmeans_pp" -> ((s, dir) =>
      Similarity.kMeansPP(t(s, dir, "embeddings"), NumCentroids,
        KMeansIter, Dim)
        .orderBy("cid", "i")),
    "sim_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(t(s, dir, "embeddings"), NumQueries, TopK,
        NumPlanes, Dim, NumTables)
        .orderBy("query_id", "rank")),
    // Retrieval-quality eval AS DATA: per-query recall@k / MRR of the
    // LSH index against the brute-force ground truth — the recall
    // contract SimilaritySpec asserts, promoted to an oracle-checked
    // query (the oracle replays BOTH searches and the overlap).
    "sim_recall_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, NumQueries, TopK),
        Similarity.lshTopK(emb, NumQueries, TopK, NumPlanes, Dim,
          NumTables),
        TopK).orderBy("query_id")
    }),
    // The same eval harness over the COMPRESSED flagship index: how
    // much recall does IVF pruning × PQ code-only scoring give up vs
    // exact search — the accuracy half of the compression trade, as
    // oracle-checked data.
    "sim_recall_eval_ivfadc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, NumQueries, TopK),
        Similarity.ivfadcTopK(emb, NumQueries, TopK, NumCentroids,
          NumProbes),
        TopK).orderBy("query_id")
    }),
    "sim_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), NumQueries, TopK,
        NumCentroids, NumProbes)
        .orderBy("query_id", "rank")),
    // PQ/ADC: candidates scored from their 8 sub-codebook codes only
    // (32× payload compression at dim=64) — prune-nothing,
    // compress-everything, the third ANN design point.
    "sim_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(t(s, dir, "embeddings"), NumQueries, TopK)
        .orderBy("query_id", "rank")),
    // PQ over TRAINED sub-codebooks: kMeansCodebookQ per subspace
    // slice (numIter Lloyd's rounds each, same init convention), then
    // the identical ADC serving path — the trained twin sim_ivf_trained
    // is for sim_ivf_topk. The oracle unrolls all 8 per-subspace
    // training chains as prefixed CTEs.
    "sim_pq_trained" -> ((s, dir) =>
      Similarity.pqTopKTrained(t(s, dir, "embeddings"), NumQueries, TopK,
        numIter = KMeansIter)
        .orderBy("query_id", "rank")),
    // IVFADC (Jégou 2011 §V): probe-list pruning × PQ code-only
    // scoring — a query touches only its probed coarse lists and ranks
    // their candidates from (cid, codes) payloads via ADC tables. The
    // billion-vector composition of sim_ivf_topk and sim_pq_topk.
    "sim_ivfadc_topk" -> ((s, dir) =>
      Similarity.ivfadcTopK(t(s, dir, "embeddings"), NumQueries, TopK,
        NumCentroids, NumProbes)
        .orderBy("query_id", "rank")),
    // Fully-trained IVFADC: trained coarse quantizer (kMeansCodebook)
    // × trained sub-codebooks (pqModelTrained), identical serving —
    // the complete deployed shape, every model from a training run.
    "sim_ivfadc_trained" -> ((s, dir) =>
      Similarity.ivfadcTopKTrained(t(s, dir, "embeddings"), NumQueries,
        TopK, NumCentroids, NumProbes, numIter = KMeansIter)
        .orderBy("query_id", "rank")),
    // SQ8 scalar quantization: per-dim 8-bit codes against corpus
    // [min, max] ranges — 8× compression with no codebook training,
    // the FAISS SQ8 point on the compression/accuracy dial.
    "sim_sq_topk" -> ((s, dir) =>
      Similarity.sqTopK(t(s, dir, "embeddings"), NumQueries, TopK, Dim)
        .orderBy("query_id", "rank")),
    // Index persistence lifecycle: build writes (codes, coarse, books)
    // parquet relations; serve reloads the model and runs the shared
    // probe+ADC tail against the saved inverted file — encode once,
    // serve without ever re-reading the corpus. Bit-identical to
    // sim_ivfadc_topk (shared oracle).
    "sim_index_roundtrip" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val path = graft.Scratch.dir("graft_ann_index")
      Similarity.ivfadcIndexBuild(e, path, NumCentroids)
      Similarity.ivfadcIndexServe(e, path, NumQueries, TopK, NumProbes)
        .orderBy("query_id", "rank")
    }),
    // Exact re-ranking refine (FAISS IndexRefine): approximate top-25
    // from the compressed index, true vectors fetched for those 25
    // per query only (broadcast semi-join on the scan), exact top-5.
    "sim_ivfadc_refine" -> ((s, dir) =>
      Similarity.ivfadcRefineTopK(t(s, dir, "embeddings"), NumQueries,
        TopK, Rerank, NumCentroids, NumProbes)
        .orderBy("query_id", "rank")),
    // Incremental maintenance: build on the first half, encode ONLY
    // the delta with the saved model, append — bit-identical to a full
    // build because encoding is a pure function of (vector, model).
    "sim_index_append" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val path = graft.Scratch.dir("graft_ann_inc")
      val half = e.count() / 2
      Similarity.ivfadcIndexBuild(e.where(col("vec_id") < half), path,
        NumCentroids)
      Similarity.ivfadcIndexAppend(e.where(col("vec_id") >= half), path)
      Similarity.ivfadcIndexServe(e, path, NumQueries, TopK, NumProbes)
        .orderBy("query_id", "rank")
    }),
    // Streaming ingest: the delta arrives as a file stream; each
    // micro-batch encodes against the saved model and appends —
    // stateless, so foreachBatch is the only streaming machinery.
    // Drained index == batch build (shared oracle).
    "st_index_ingest" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val path = graft.Scratch.dir("graft_ann_stream")
      val deltaDir = graft.Scratch.dir("graft_ann_delta")
      val half = e.count() / 2
      Similarity.ivfadcIndexBuild(e.where(col("vec_id") < half), path,
        NumCentroids)
      e.where(col("vec_id") >= half).coalesce(2)
        .write.mode("overwrite").parquet(deltaDir)
      Similarity.ivfadcIndexIngest(
        s.readStream.schema(e.schema).option("maxFilesPerTrigger", "1")
          .parquet(deltaDir), path)
      Similarity.ivfadcIndexServe(e, path, NumQueries, TopK, NumProbes)
        .orderBy("query_id", "rank")
    }),
    // Residual IVFADC (by_residual=true): PQ codes quantize v − C[cid]
    // — FAISS's default deployed form; scoring adds the per-probe
    // q·C[cid] term and reconstructs ‖C+r̂‖² from driver-side tables,
    // all exact BIGINT.
    "sim_ivfadc_residual" -> ((s, dir) =>
      Similarity.ivfadcResidualTopK(t(s, dir, "embeddings"), NumQueries,
        TopK, NumCentroids, NumProbes)
        .orderBy("query_id", "rank")),
    // The train-then-serve ANN path: same probe machinery as
    // sim_ivf_topk but over the Lloyd's-trained codebook. The oracle
    // prepends the k-means CTE chain and swaps the centroid source.
    "sim_ivf_trained" -> ((s, dir) =>
      Similarity.ivfTopKTrained(t(s, dir, "embeddings"), NumQueries, TopK,
        NumCentroids, NumProbes, KMeansIter, Dim)
        .orderBy("query_id", "rank")),
    // SemDeDup over the doubled fixture (exact dups under shifted ids,
    // same synthesis as dd_embed_neardup): k-means clusters prune the
    // pair space instead of LSH buckets; every shifted copy must be
    // dropped, every original must survive.
    "dd_semantic_dedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val doubled = e.unionAll(e.select(
        (col("vec_id") + IdShift).as("vec_id"), col("embedding")))
      Similarity.semanticDedup(doubled, SemThreshold, NumCentroids,
        KMeansIter, Dim)
        .orderBy("vec_id")
    }),
    // SemDeDup END-TO-END through the large-k reference-object
    // assignment path (forceRefAssign; k=32, one Lloyd's round): the
    // same train-cluster-score-drop pipeline as dd_semantic_dedup with
    // the clustering assignment running through NearestCentroidExpr —
    // the full-operator close of the round-9 literal-codebook `weak`.
    "dd_semantic_bigk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val doubled = e.unionAll(e.select(
        (col("vec_id") + IdShift).as("vec_id"), col("embedding")))
      Similarity.semanticDedup(doubled, SemThreshold, 32, 1, Dim,
        forceRefAssign = true)
        .orderBy("vec_id")
    })
  )

  private val quantCte =
    """v AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |FROM embeddings)""".stripMargin

  /** One unrolled Lloyd's assignment: every vector in `vn` to its
    * L2-nearest centroid of `cSrc` — row_number over
    * (|v|²−2·v·c+|c|², cid), the same lexicographic argmin as the Spark
    * `min(struct(dist, cid))`. */
  private def kmeansAssignCte(cSrc: String, aName: String,
                              vnName: String = "vn"): String =
    s"""${aName}s AS (
       |  SELECT vn.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY vn.vec_id
       |      ORDER BY vn.nq - 2 * ${dotSql("vn.q", "c.cv")} + c.nc, c.cid) AS rn
       |  FROM $vnName vn CROSS JOIN
       |    (SELECT cid, cv, ${dotSql("cv", "cv")} AS nc FROM $cSrc) c),
       |$aName AS (SELECT vec_id, cid FROM ${aName}s WHERE rn = 1)""".stripMargin

  /** The unrolled k-means training chain, shared by every oracle that
    * consumes the trained codebook (sim_kmeans, sim_ivf_trained,
    * dd_semantic_dedup): expects a CTE `v(vec_id, q)` in scope, defines
    * `vn` (with norms) and `c0`..`c$KMeansIter`, generated from the
    * same constants as the Spark loop — per-dim BIGINT sums, truncating
    * `//` means (DuckDB `//` and Spark `div` both truncate toward zero
    * on all signs), empty clusters keeping the previous centroid via
    * the per-dim LEFT JOIN COALESCE. */
  /** The chain, parameterized for REUSE PER SUBSPACE (sim_pq_trained
    * trains 8 independent sub-codebooks — one chain each, names
    * prefixed, over the slice CTE `vName`, at the subspace's `dim`).
    * `kmeansChainCtes` is exactly `kmeansChainFor("", "v", Dim,
    * NumCentroids, KMeansIter)` — the full-width instance the three
    * original consumers share. Defines `${pfx}vn` and
    * `${pfx}c0`..`${pfx}c$numIter`. */
  private def kmeansChainFor(pfx: String, vName: String, dim: Int,
                             k: Int, numIter: Int,
                             c0Select: Option[String] = None): String = {
    val iters = (0 until numIter).map { it =>
      s"""${kmeansAssignCte(s"${pfx}c$it", s"${pfx}a$it", s"${pfx}vn")},
         |${pfx}m$it AS (SELECT cid, i, CAST(sum(q[i]) AS BIGINT) AS s, count(*) AS n
         |  FROM ${pfx}a$it JOIN $vName USING (vec_id)
         |  CROSS JOIN generate_series(1, $dim) g(i)
         |  GROUP BY cid, i),
         |${pfx}c${it + 1}d AS (SELECT p.cid, gi.i, COALESCE(m.s // m.n, p.cv[gi.i]) AS val
         |  FROM ${pfx}c$it p CROSS JOIN generate_series(1, $dim) gi(i)
         |  LEFT JOIN ${pfx}m$it m ON m.cid = p.cid AND m.i = gi.i),
         |${pfx}c${it + 1} AS (SELECT cid, list(val ORDER BY i) AS cv
         |  FROM ${pfx}c${it + 1}d GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    val c0 = c0Select.getOrElse(
      s"SELECT vec_id AS cid, q AS cv FROM $vName WHERE vec_id < $k")
    s"""${pfx}vn AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM $vName),
       |${pfx}c0 AS ($c0),
       |$iters""".stripMargin
  }

  private lazy val kmeansChainCtes: String =
    kmeansChainFor("", "v", Dim, NumCentroids, KMeansIter)

  /** Deterministic farthest-point (maxmin) init CTEs: `ch{k-1}` ends
    * holding the k picks as (pid, vec_id, q) — pid = pick order, the
    * cid convention of [[Similarity.kMeansInitFarthest]]. Each step's
    * arg-max (min-distance DESC, vec_id ASC, chosen excluded) mirrors
    * the Spark struct-max exactly. */
  private def farthestInitCtes(k: Int): String = {
    // every ch/d CTE is MATERIALIZED: ch$i references ch${i-1} twice,
    // and inlining would expand the chain exponentially (observed as a
    // file-handle explosion re-opening the parquet 2^k times)
    val steps = (1 until k).map { i =>
      s"""d$i AS MATERIALIZED (SELECT v2.vec_id, v2.q,
         |    min(${dotSql("v2.q", "v2.q")} - 2 * ${dotSql("v2.q", "p.q")} + ${dotSql("p.q", "p.q")}) AS d
         |  FROM v v2 CROSS JOIN ch${i - 1} p
         |  WHERE v2.vec_id NOT IN (SELECT vec_id FROM ch${i - 1})
         |  GROUP BY v2.vec_id, v2.q),
         |fp$i AS (SELECT CAST($i AS BIGINT) AS pid, vec_id, q FROM (
         |  SELECT vec_id, q, row_number() OVER (ORDER BY d DESC, vec_id) AS rn FROM d$i)
         |  WHERE rn = 1),
         |ch$i AS MATERIALIZED (SELECT * FROM ch${i - 1} UNION ALL SELECT * FROM fp$i)""".stripMargin
    }.mkString(",\n")
    s"""ch0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS pid, vec_id, q FROM v
       |  WHERE vec_id = (SELECT min(vec_id) FROM v)),
       |$steps""".stripMargin
  }

  private lazy val kmeansOracle: String =
    s"""WITH $quantCte,
       |$kmeansChainCtes,
       |${kmeansAssignCte(s"c$KMeansIter", "af")},
       |sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM af GROUP BY cid)
       |SELECT p.cid, CAST(gi.i AS BIGINT) AS i, p.cv[gi.i] AS c_val,
       |  CAST(COALESCE(sz.cluster_size, 0) AS BIGINT) AS cluster_size
       |FROM c$KMeansIter p CROSS JOIN generate_series(1, $Dim) gi(i)
       |LEFT JOIN sz ON sz.cid = p.cid
       |ORDER BY p.cid, gi.i""".stripMargin

  /** The IVF probe/score/rank tail, parameterized by the centroid
    * source CTE body: expects `v` in scope, defines `n` and `c`,
    * returns the final SELECT. Shared by sim_ivf_topk (first-C
    * stand-in) and sim_ivf_trained (k-means chain). */
  private def ivfOracleTail(centSelect: String): String =
    s"""n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
       |c AS ($centSelect),
       |sc AS (
       |  SELECT n.vec_id, c.cid,
       |    CAST(${dotSql("n.q", "c.cv")} AS DOUBLE) / sqrt(CAST(c.nc AS DOUBLE)) AS score
       |  FROM n CROSS JOIN c),
       |best AS (
       |  SELECT vec_id, (max(struct_pack(s := score, c := cid))).c AS cid
       |  FROM sc GROUP BY vec_id),
       |probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS pr
       |    FROM sc WHERE vec_id < $NumQueries)
       |  WHERE pr <= $NumProbes),
       |cand AS (SELECT n.*, b.cid FROM n JOIN best b USING (vec_id)),
       |qs AS (
       |  SELECT n.vec_id AS query_id, n.q AS qv, n.nq AS nqq, p.cid
       |  FROM n JOIN probes p ON n.vec_id = p.query_id),
       |pairs AS (
       |  SELECT q.query_id, c.vec_id AS cand_id, c.cid,
       |    ${dotSql("q.qv", "c.q")} AS dot, q.nqq, c.nq AS nqc
       |  FROM cand c JOIN qs q ON c.cid = q.cid
       |  WHERE c.vec_id <> q.query_id),
       |r AS (
       |  SELECT query_id, cand_id, cid, dot,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nqc AS DOUBLE))) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS "rank"
       |  FROM pairs)
       |SELECT query_id, cand_id, cid, dot, cosine, "rank"
       |FROM r WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin

  /** The shared IVFADC probe+ADC tail — coarse-assign (sc/best), probe
    * selection, per-subspace encode against `bn`, probed-list-only ADC
    * scoring, rank. Expects in scope: `v` (vec_id, q), `n` (+ norms),
    * `c` (cid, cv, nc — the COARSE codebook), `bn` (s, code, cv, nc —
    * the SUB-codebooks). Shared by sim_ivfadc_topk (first-C stand-ins)
    * and sim_ivfadc_trained (both models from training chains). */
  private def ivfadcOracleTail(sub: Int): String =
    s"""${ivfadcOracleCtes(sub)}
       |SELECT query_id, cand_id, cid, adot, acos, "rank"
       |FROM r WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin

  /** Same, stopping at the ranked CTE `r` so a composition (the exact
    * re-ranking refine) can keep building. */
  private def ivfadcOracleCtes(sub: Int): String =
    s"""sc AS (
       |  SELECT n.vec_id, c.cid,
       |    CAST(${dotSql("n.q", "c.cv")} AS DOUBLE) / sqrt(CAST(c.nc AS DOUBLE)) AS score
       |  FROM n CROSS JOIN c),
       |best AS (
       |  SELECT vec_id, (max(struct_pack(s := score, c := cid))).c AS cid
       |  FROM sc GROUP BY vec_id),
       |probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS pr
       |    FROM sc WHERE vec_id < $NumQueries)
       |  WHERE pr <= $NumProbes),
       |sl AS (SELECT vec_id, s, q[$sub*s+1 : $sub*s+$sub] AS sv
       |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)),
       |enc AS (SELECT vec_id, s, code, nc FROM (
       |  SELECT sl.vec_id, sl.s, b.code, b.nc,
       |    row_number() OVER (PARTITION BY sl.vec_id, sl.s
       |      ORDER BY b.nc - 2 * ${dotSql("sl.sv", "b.cv")}, b.code) AS rn
       |  FROM sl JOIN bn b ON b.s = sl.s)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS query_id, q AS qv, nq AS nqq FROM n
       |  WHERE vec_id < $NumQueries),
       |qp AS (SELECT qs.query_id, qs.qv, qs.nqq, p.cid
       |  FROM qs JOIN probes p USING (query_id)),
       |cand AS (SELECT e.vec_id, e.s, e.code, e.nc, b.cid
       |  FROM enc e JOIN best b USING (vec_id)),
       |parts AS (SELECT qp.query_id, cd.vec_id AS cand_id, cd.cid, qp.nqq,
       |    ${dotSql(s"(qp.qv[$sub*cd.s+1 : $sub*cd.s+$sub])", "b2.cv")} AS pdot,
       |    cd.nc AS pnc
       |  FROM cand cd JOIN bn b2 ON b2.s = cd.s AND b2.code = cd.code
       |  JOIN qp ON qp.cid = cd.cid
       |  WHERE cd.vec_id <> qp.query_id),
       |sc2 AS (SELECT query_id, cand_id, cid, CAST(sum(pdot) AS BIGINT) AS adot,
       |    CAST(sum(pnc) AS BIGINT) AS nrec, min(nqq) AS nqq
       |  FROM parts GROUP BY query_id, cand_id, cid),
       |r AS (SELECT query_id, cand_id, cid, adot,
       |    CAST(adot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nrec AS DOUBLE))) AS acos,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, cand_id) AS BIGINT) AS "rank"
       |  FROM sc2)""".stripMargin

  private lazy val ivfadcTopkOracle: String = {
    val sub = 8 // numSub == subDim == 8 at Dim 64, numCodes == 16
    s"""WITH $quantCte,
       |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
       |c AS (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
       |  WHERE vec_id < $NumCentroids),
       |bn AS (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
       |    ${dotSql(s"(q[$sub*s+1 : $sub*s+$sub])", s"(q[$sub*s+1 : $sub*s+$sub])")} AS nc
       |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)
       |  WHERE vec_id < 16),
       |${ivfadcOracleTail(sub)}""".stripMargin
  }

  private val similarityOracles: Map[String, String] = Map(
    "sim_kmeans" -> kmeansOracle,
    // kmeansOracle with the init swapped for the maxmin pick chain.
    "sim_kmeans_pp" ->
      s"""WITH $quantCte,
         |${farthestInitCtes(NumCentroids)},
         |${kmeansChainFor("", "v", Dim, NumCentroids, KMeansIter,
        Some(s"SELECT pid AS cid, q AS cv FROM ch${NumCentroids - 1}"))},
         |${kmeansAssignCte(s"c$KMeansIter", "af")},
         |sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM af GROUP BY cid)
         |SELECT p.cid, CAST(gi.i AS BIGINT) AS i, p.cv[gi.i] AS c_val,
         |  CAST(COALESCE(sz.cluster_size, 0) AS BIGINT) AS cluster_size
         |FROM c$KMeansIter p CROSS JOIN generate_series(1, $Dim) gi(i)
         |LEFT JOIN sz ON sz.cid = p.cid
         |ORDER BY p.cid, gi.i""".stripMargin,
    // Hierarchical assignment replay: super chain over the codebook
    // rows (spc0→spc1), member binning (am), live supers (ls), row
    // super probe (rsup), then the within-bin argmin — every level the
    // same exact-integer (dist, id) lexicographic rule.
    "sim_assign_hier" -> {
      s"""WITH $quantCte,
         |cb AS (SELECT vec_id AS cid, q AS cv FROM v
         |  WHERE vec_id < $NumCentroidsBig),
         |cbq AS (SELECT cid AS vec_id, cv AS q FROM cb),
         |${kmeansChainFor("sp", "cbq", Dim, NumSupers, 1)},
         |${kmeansAssignCte("spc1", "am", "spvn")},
         |ls AS (SELECT DISTINCT cid AS sid FROM am),
         |vn AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |${kmeansAssignCte(
        "(SELECT s.cid, s.cv FROM spc1 s JOIN ls ON ls.sid = s.cid)",
        "rsup")},
         |fin AS (SELECT vec_id, sid, cid FROM (
         |  SELECT vn.vec_id, r.cid AS sid, cb.cid,
         |    row_number() OVER (PARTITION BY vn.vec_id
         |      ORDER BY vn.nq - 2 * ${dotSql("vn.q", "cb.cv")} + ${dotSql("cb.cv", "cb.cv")}, cb.cid) AS rn
         |  FROM vn JOIN rsup r ON r.vec_id = vn.vec_id
         |  JOIN am ON am.cid = r.cid
         |  JOIN cb ON cb.cid = am.vec_id)
         |  WHERE rn = 1)
         |SELECT vec_id, sid, cid FROM fin ORDER BY vec_id""".stripMargin
    },
    // Same argmin + tie-break as the k-means assignment CTE, over the
    // first-400 codebook: DuckDB replays the reference-object path's
    // result exactly (the Spark formulation change is invisible to the
    // oracle — that is the point of the parity contract).
    "sim_assign_bigk" ->
      s"""WITH $quantCte,
         |vn AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |${kmeansAssignCte(
        s"(SELECT vec_id AS cid, q AS cv FROM v WHERE vec_id < $NumCentroidsBig)",
        "af")}
         |SELECT vec_id, cid FROM af ORDER BY vec_id""".stripMargin,
    "sim_brute_topk" ->
      s"""WITH $quantCte,
         |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |sc AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${dotSql("qq.q", "c.q")} AS dot, qq.nq AS nqq, c.nq AS nqc
         |  FROM n c CROSS JOIN n qq
         |  WHERE qq.vec_id < $NumQueries AND c.vec_id <> qq.vec_id),
         |r AS (
         |  SELECT query_id, cand_id, dot,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nqc AS DOUBLE))) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM sc)
         |SELECT query_id, cand_id, dot, cosine, "rank"
         |FROM r WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin,
    // Multi-table OR-amplified LSH: a candidate is admitted when it
    // shares a sign-bucket with the query in ANY of the NumTables
    // independent plane tables (same seeded-planes construction as
    // Similarity.planes). DISTINCT collapses multi-table co-hits before
    // ranking — mirroring the Spark side's cross-table dedup stage.
    "sim_lsh_topk" -> {
      val bucketsByTable = (0 until NumTables).map { t =>
        Similarity.planes(NumPlanes, Dim, t).map(p =>
          s"(CASE WHEN ${planeDotSql("q", p)} >= 0 THEN '1' ELSE '0' END)")
          .mkString(" || ")
      }
      val bk = bucketsByTable.zipWithIndex.map { case (b, t) =>
        s"SELECT vec_id, $t AS tbl, $b AS bucket FROM n"
      }.mkString("\nUNION ALL ")
      s"""WITH $quantCte,
         |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |bk AS (
         |$bk),
         |cand AS (
         |  SELECT DISTINCT qq.vec_id AS query_id, c.vec_id AS cand_id
         |  FROM bk c JOIN bk qq ON c.tbl = qq.tbl AND c.bucket = qq.bucket
         |  WHERE qq.vec_id < $NumQueries AND c.vec_id <> qq.vec_id),
         |sc AS (
         |  SELECT query_id, cand_id,
         |    ${dotSql("qn.q", "cn.q")} AS dot, qn.nq AS nqq, cn.nq AS nqc
         |  FROM cand
         |  JOIN n qn ON qn.vec_id = cand.query_id
         |  JOIN n cn ON cn.vec_id = cand.cand_id),
         |r AS (
         |  SELECT query_id, cand_id, dot,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nqc AS DOUBLE))) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM sc)
         |SELECT query_id, cand_id, dot, cosine, "rank"
         |FROM r WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin
    },
    "sim_ivf_topk" ->
      s"""WITH $quantCte,
         |${ivfOracleTail(
        s"SELECT vec_id AS cid, q AS cv, nq AS nc FROM n WHERE vec_id < $NumCentroids")}""".stripMargin,
    // Recall/MRR eval: the oracle replays BOTH the brute-force ranking
    // and the multi-table LSH search (same CTE bodies as their own
    // oracles), then the overlap join and the exact ppm ratios.
    "sim_recall_eval" -> {
      val bucketsByTable = (0 until NumTables).map { t =>
        Similarity.planes(NumPlanes, Dim, t).map(p =>
          s"(CASE WHEN ${planeDotSql("q", p)} >= 0 THEN '1' ELSE '0' END)")
          .mkString(" || ")
      }
      val bk = bucketsByTable.zipWithIndex.map { case (b, t) =>
        s"SELECT vec_id, $t AS tbl, $b AS bucket FROM n"
      }.mkString("\nUNION ALL ")
      s"""WITH $quantCte,
         |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |bsc AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${dotSql("qq.q", "c.q")} AS dot
         |  FROM n c CROSS JOIN n qq
         |  WHERE qq.vec_id < $NumQueries AND c.vec_id <> qq.vec_id),
         |bt AS (SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY dot DESC, cand_id) AS rk
         |    FROM bsc) WHERE rk <= $TopK),
         |bk AS (
         |$bk),
         |cand AS (
         |  SELECT DISTINCT qq.vec_id AS query_id, c.vec_id AS cand_id
         |  FROM bk c JOIN bk qq ON c.tbl = qq.tbl AND c.bucket = qq.bucket
         |  WHERE qq.vec_id < $NumQueries AND c.vec_id <> qq.vec_id),
         |lsc AS (
         |  SELECT query_id, cand_id, ${dotSql("qn.q", "cn.q")} AS dot
         |  FROM cand
         |  JOIN n qn ON qn.vec_id = cand.query_id
         |  JOIN n cn ON cn.vec_id = cand.cand_id),
         |lt AS (SELECT query_id, cand_id, rk FROM (
         |    SELECT query_id, cand_id, CAST(row_number() OVER (
         |      PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT)
         |      AS rk
         |    FROM lsc) WHERE rk <= $TopK),
         |hits AS (SELECT lt.query_id, CAST(count(*) AS BIGINT) AS n_hits,
         |    min(lt.rk) AS first_hit
         |  FROM lt JOIN bt USING (query_id, cand_id) GROUP BY lt.query_id),
         |qs AS (SELECT DISTINCT query_id FROM bt)
         |SELECT qs.query_id, coalesce(h.n_hits, 0) AS n_hits,
         |  (coalesce(h.n_hits, 0) * 1000000) // $TopK AS recall_ppm,
         |  CASE WHEN h.first_hit IS NOT NULL THEN 1000000 // h.first_hit
         |    ELSE 0 END AS mrr_ppm
         |FROM qs LEFT JOIN hits h USING (query_id)
         |ORDER BY qs.query_id""".stripMargin
    },
    // Recall/MRR of IVFADC vs brute force: the full probe+ADC replay
    // (shared CTE builders) feeds the same overlap/ppm tail.
    "sim_recall_eval_ivfadc" -> {
      val sub = 8
      s"""WITH $quantCte,
         |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |c AS (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
         |  WHERE vec_id < $NumCentroids),
         |bn AS (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
         |    ${dotSql(s"(q[$sub*s+1 : $sub*s+$sub])",
        s"(q[$sub*s+1 : $sub*s+$sub])")} AS nc
         |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)
         |  WHERE vec_id < 16),
         |${ivfadcOracleCtes(sub)},
         |ar AS (SELECT query_id, cand_id, "rank" AS rk FROM r
         |  WHERE "rank" <= $TopK),
         |bsc AS (
         |  SELECT qq.vec_id AS query_id, cc.vec_id AS cand_id,
         |    ${dotSql("qq.q", "cc.q")} AS dot
         |  FROM n cc CROSS JOIN n qq
         |  WHERE qq.vec_id < $NumQueries AND cc.vec_id <> qq.vec_id),
         |bt AS (SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY dot DESC, cand_id) AS brk
         |    FROM bsc) WHERE brk <= $TopK),
         |hits AS (SELECT ar.query_id, CAST(count(*) AS BIGINT) AS n_hits,
         |    CAST(min(ar.rk) AS BIGINT) AS first_hit
         |  FROM ar JOIN bt USING (query_id, cand_id)
         |  GROUP BY ar.query_id),
         |qq2 AS (SELECT DISTINCT query_id FROM bt)
         |SELECT qq2.query_id, coalesce(h.n_hits, 0) AS n_hits,
         |  (coalesce(h.n_hits, 0) * 1000000) // $TopK AS recall_ppm,
         |  CASE WHEN h.first_hit IS NOT NULL THEN 1000000 // h.first_hit
         |    ELSE 0 END AS mrr_ppm
         |FROM qq2 LEFT JOIN hits h USING (query_id)
         |ORDER BY qq2.query_id""".stripMargin
    },
    // PQ/ADC replay: per-subspace argmin encoding (row_number over the
    // same (‖C‖²−2·slice·C, code) lexicographic key as the Spark
    // array_min), then the asymmetric score reassembled as the sum of
    // per-subspace partial dots against the SELECTED codeword.
    "sim_pq_topk" -> {
      val sub = 8 // numSub == subDim == 8 at Dim 64, numCodes == 16
      s"""WITH $quantCte,
         |bn AS (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
         |    ${dotSql(s"(q[$sub*s+1 : $sub*s+$sub])", s"(q[$sub*s+1 : $sub*s+$sub])")} AS nc
         |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)
         |  WHERE vec_id < 16),
         |sl AS (SELECT vec_id, s, q[$sub*s+1 : $sub*s+$sub] AS sv
         |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)),
         |enc AS (SELECT vec_id, s, code, nc FROM (
         |  SELECT sl.vec_id, sl.s, b.code, b.nc,
         |    row_number() OVER (PARTITION BY sl.vec_id, sl.s
         |      ORDER BY b.nc - 2 * ${dotSql("sl.sv", "b.cv")}, b.code) AS rn
         |  FROM sl JOIN bn b ON b.s = sl.s)
         |  WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, q AS qv, ${dotSql("q", "q")} AS nqq
         |  FROM v WHERE vec_id < $NumQueries),
         |parts AS (SELECT qs.query_id, e.vec_id AS cand_id, qs.nqq,
         |    ${dotSql(s"(qs.qv[$sub*e.s+1 : $sub*e.s+$sub])", "b2.cv")} AS pdot,
         |    e.nc
         |  FROM enc e JOIN bn b2 ON b2.s = e.s AND b2.code = e.code
         |  CROSS JOIN qs
         |  WHERE e.vec_id <> qs.query_id),
         |sc AS (SELECT query_id, cand_id, CAST(sum(pdot) AS BIGINT) AS adot,
         |    CAST(sum(nc) AS BIGINT) AS nrec, min(nqq) AS nqq
         |  FROM parts GROUP BY query_id, cand_id),
         |r AS (SELECT query_id, cand_id, adot,
         |    CAST(adot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nrec AS DOUBLE))) AS acos,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM sc)
         |SELECT query_id, cand_id, adot, acos, "rank"
         |FROM r WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin
    },
    // Trained-PQ replay: one prefixed k-means chain per subspace over
    // its slice CTE (p{s}vn, p{s}c0..p{s}c2), the union of the 8
    // trained books as bn, then the SAME encode/score/rank tail as
    // sim_pq_topk — the oracle proves training changed only the model.
    "sim_pq_trained" -> {
      val sub = 8 // numSub == subDim == 8 at Dim 64, numCodes == 16
      val chains = (0 until sub).map { s =>
        s"""v$s AS (SELECT vec_id, q[$sub*$s+1 : $sub*$s+$sub] AS q FROM v),
           |${kmeansChainFor(s"p$s", s"v$s", sub, 16, KMeansIter)}""".stripMargin
      }.mkString(",\n")
      val bnUnion = (0 until sub).map { s =>
        s"SELECT $s AS s, cid AS code, cv, ${dotSql("cv", "cv")} AS nc FROM p${s}c$KMeansIter"
      }.mkString("\n  UNION ALL ")
      s"""WITH $quantCte,
         |$chains,
         |bn AS (
         |  $bnUnion),
         |sl AS (SELECT vec_id, s, q[$sub*s+1 : $sub*s+$sub] AS sv
         |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)),
         |enc AS (SELECT vec_id, s, code, nc FROM (
         |  SELECT sl.vec_id, sl.s, b.code, b.nc,
         |    row_number() OVER (PARTITION BY sl.vec_id, sl.s
         |      ORDER BY b.nc - 2 * ${dotSql("sl.sv", "b.cv")}, b.code) AS rn
         |  FROM sl JOIN bn b ON b.s = sl.s)
         |  WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, q AS qv, ${dotSql("q", "q")} AS nqq
         |  FROM v WHERE vec_id < $NumQueries),
         |parts AS (SELECT qs.query_id, e.vec_id AS cand_id, qs.nqq,
         |    ${dotSql(s"(qs.qv[$sub*e.s+1 : $sub*e.s+$sub])", "b2.cv")} AS pdot,
         |    e.nc
         |  FROM enc e JOIN bn b2 ON b2.s = e.s AND b2.code = e.code
         |  CROSS JOIN qs
         |  WHERE e.vec_id <> qs.query_id),
         |sc AS (SELECT query_id, cand_id, CAST(sum(pdot) AS BIGINT) AS adot,
         |    CAST(sum(nc) AS BIGINT) AS nrec, min(nqq) AS nqq
         |  FROM parts GROUP BY query_id, cand_id),
         |r AS (SELECT query_id, cand_id, adot,
         |    CAST(adot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nrec AS DOUBLE))) AS acos,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM sc)
         |SELECT query_id, cand_id, adot, acos, "rank"
         |FROM r WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin
    },
    // IVFADC: the coarse CTEs (c/sc/best/probes) verbatim from the IVF
    // oracle + the PQ CTEs (bn/sl/enc) verbatim from the PQ oracle,
    // joined so per-subspace partial dots are summed ONLY for (query,
    // candidate) pairs whose candidate sits in a probed list.
    "sim_ivfadc_topk" -> ivfadcTopkOracle,
    // the persisted-index roundtrip, the incremental append, and the
    // streaming ingest all serve bit-identically to the direct
    // operator, so they share its oracle — the k_*_roundtrip
    // losslessness pattern applied to an ANN index lifecycle
    "sim_index_roundtrip" -> ivfadcTopkOracle,
    "sim_index_append" -> ivfadcTopkOracle,
    "st_index_ingest" -> ivfadcTopkOracle,
    // refine: the IVFADC CTEs ranked to top-Rerank, then exact
    // re-scoring of just those candidates against the true vectors
    "sim_ivfadc_refine" -> {
      val sub = 8
      s"""WITH $quantCte,
         |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |c AS (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
         |  WHERE vec_id < $NumCentroids),
         |bn AS (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
         |    ${dotSql(s"(q[$sub*s+1 : $sub*s+$sub])", s"(q[$sub*s+1 : $sub*s+$sub])")} AS nc
         |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)
         |  WHERE vec_id < 16),
         |${ivfadcOracleCtes(sub)},
         |ap AS (SELECT query_id, cand_id FROM r WHERE "rank" <= $Rerank),
         |ex AS (SELECT ap.query_id, ap.cand_id,
         |    ${dotSql("qn.q", "cn.q")} AS dot, qn.nq AS nqq, cn.nq AS nqc
         |  FROM ap JOIN n qn ON qn.vec_id = ap.query_id
         |  JOIN n cn ON cn.vec_id = ap.cand_id),
         |r2 AS (SELECT query_id, cand_id, dot,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nqc AS DOUBLE))) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM ex)
         |SELECT query_id, cand_id, dot, cosine, "rank"
         |FROM r2 WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin
    },
    // SQ8 replay: per-dim range stats, truncating affine encode (all
    // operands non-negative, so DuckDB // == Spark div), reconstruction
    // from codes + ranges, exact-BIGINT asymmetric dot.
    "sim_sq_topk" ->
      s"""WITH $quantCte,
         |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |st AS (SELECT i, min(q[i]) AS mn, max(q[i]) AS mx
         |  FROM v CROSS JOIN generate_series(1, $Dim) g(i) GROUP BY i),
         |enc AS (SELECT v.vec_id, g.i,
         |    CASE WHEN st.mx = st.mn THEN 0
         |         ELSE (v.q[g.i] - st.mn) * 255 // (st.mx - st.mn) END AS code
         |  FROM v CROSS JOIN generate_series(1, $Dim) g(i)
         |  JOIN st ON st.i = g.i),
         |rec AS (SELECT e.vec_id, e.i,
         |    CASE WHEN st.mx = st.mn THEN st.mn
         |         ELSE st.mn + e.code * (st.mx - st.mn) // 255 END AS rv
         |  FROM enc e JOIN st ON st.i = e.i),
         |qs AS (SELECT vec_id AS query_id, q AS qv, nq AS nqq FROM n
         |  WHERE vec_id < $NumQueries),
         |parts AS (SELECT qs.query_id, r.vec_id AS cand_id, qs.nqq,
         |    qs.qv[r.i] * r.rv AS pd, r.rv * r.rv AS pr
         |  FROM rec r CROSS JOIN qs
         |  WHERE r.vec_id <> qs.query_id),
         |sc AS (SELECT query_id, cand_id, CAST(sum(pd) AS BIGINT) AS adot,
         |    CAST(sum(pr) AS BIGINT) AS nrec, min(nqq) AS nqq
         |  FROM parts GROUP BY query_id, cand_id),
         |r AS (SELECT query_id, cand_id, adot,
         |    CAST(adot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nrec AS DOUBLE))) AS acos,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM sc)
         |SELECT query_id, cand_id, adot, acos, "rank"
         |FROM r WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin,
    // Residual IVFADC replay: residuals via indexed list_transform
    // against the assigned centroid, residual books from the first-16
    // vectors' own residuals, and the score reassembled as
    // q·C + Σ per-subspace residual partial dots; the reconstruction
    // norm is ‖C‖² + 2·Σ C_slice·codeword + Σ‖codeword‖².
    "sim_ivfadc_residual" -> {
      val sub = 8 // numSub == subDim == 8 at Dim 64, numCodes == 16
      s"""WITH $quantCte,
         |n AS (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |c AS (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
         |  WHERE vec_id < $NumCentroids),
         |sc AS (
         |  SELECT n.vec_id, c.cid,
         |    CAST(${dotSql("n.q", "c.cv")} AS DOUBLE) / sqrt(CAST(c.nc AS DOUBLE)) AS score
         |  FROM n CROSS JOIN c),
         |best AS (
         |  SELECT vec_id, (max(struct_pack(s := score, c := cid))).c AS cid
         |  FROM sc GROUP BY vec_id),
         |probes AS (
         |  SELECT vec_id AS query_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS pr
         |    FROM sc WHERE vec_id < $NumQueries)
         |  WHERE pr <= $NumProbes),
         |rs AS (SELECT n.vec_id, b.cid,
         |    list_transform(generate_series(1, $Dim), i -> n.q[i] - cc.cv[i]) AS r
         |  FROM n JOIN best b USING (vec_id) JOIN c cc ON cc.cid = b.cid),
         |rbn AS (SELECT s, vec_id AS code, r[$sub*s+1 : $sub*s+$sub] AS cv,
         |    ${dotSql(s"(r[$sub*s+1 : $sub*s+$sub])", s"(r[$sub*s+1 : $sub*s+$sub])")} AS nc
         |  FROM rs CROSS JOIN generate_series(0, ${sub - 1}) g(s)
         |  WHERE vec_id < 16),
         |rsl AS (SELECT vec_id, cid, s, r[$sub*s+1 : $sub*s+$sub] AS sv
         |  FROM rs CROSS JOIN generate_series(0, ${sub - 1}) g(s)),
         |renc AS (SELECT vec_id, cid, s, code, nc FROM (
         |  SELECT rsl.vec_id, rsl.cid, rsl.s, b.code, b.nc,
         |    row_number() OVER (PARTITION BY rsl.vec_id, rsl.s
         |      ORDER BY b.nc - 2 * ${dotSql("rsl.sv", "b.cv")}, b.code) AS rn
         |  FROM rsl JOIN rbn b ON b.s = rsl.s)
         |  WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, q AS qv, nq AS nqq FROM n
         |  WHERE vec_id < $NumQueries),
         |qp AS (SELECT qs.query_id, qs.qv, qs.nqq, p.cid,
         |    ${dotSql("qs.qv", "cc.cv")} AS qcdot
         |  FROM qs JOIN probes p USING (query_id)
         |  JOIN c cc ON cc.cid = p.cid),
         |parts AS (SELECT qp.query_id, e.vec_id AS cand_id, e.cid, qp.nqq,
         |    qp.qcdot, cc.nc AS pncc,
         |    ${dotSql(s"(qp.qv[$sub*e.s+1 : $sub*e.s+$sub])", "b2.cv")} AS pdot,
         |    b2.nc AS pnc,
         |    ${dotSql(s"(cc.cv[$sub*e.s+1 : $sub*e.s+$sub])", "b2.cv")} AS pcr
         |  FROM renc e JOIN rbn b2 ON b2.s = e.s AND b2.code = e.code
         |  JOIN c cc ON cc.cid = e.cid
         |  JOIN qp ON qp.cid = e.cid
         |  WHERE e.vec_id <> qp.query_id),
         |sc2 AS (SELECT query_id, cand_id, cid,
         |    CAST(min(qcdot) + sum(pdot) AS BIGINT) AS adot,
         |    CAST(min(pncc) + 2 * sum(pcr) + sum(pnc) AS BIGINT) AS nrec,
         |    min(nqq) AS nqq
         |  FROM parts GROUP BY query_id, cand_id, cid),
         |r AS (SELECT query_id, cand_id, cid, adot,
         |    CAST(adot AS DOUBLE) / (sqrt(CAST(nqq AS DOUBLE)) * sqrt(CAST(nrec AS DOUBLE))) AS acos,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM sc2)
         |SELECT query_id, cand_id, cid, adot, acos, "rank"
         |FROM r WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin
    },
    // Fully-trained IVFADC: the coarse k-means chain (as
    // sim_ivf_trained) AND the 8 per-subspace training chains (as
    // sim_pq_trained), feeding the shared probe+ADC tail — the
    // complete train-then-serve replay.
    "sim_ivfadc_trained" -> {
      val sub = 8
      val chains = (0 until sub).map { s =>
        s"""v$s AS (SELECT vec_id, q[$sub*$s+1 : $sub*$s+$sub] AS q FROM v),
           |${kmeansChainFor(s"p$s", s"v$s", sub, 16, KMeansIter)}""".stripMargin
      }.mkString(",\n")
      val bnUnion = (0 until sub).map { s =>
        s"SELECT $s AS s, cid AS code, cv, ${dotSql("cv", "cv")} AS nc FROM p${s}c$KMeansIter"
      }.mkString("\n  UNION ALL ")
      s"""WITH $quantCte,
         |$kmeansChainCtes,
         |$chains,
         |n AS (SELECT vec_id, q, nq FROM vn),
         |c AS (SELECT cid, cv, ${dotSql("cv", "cv")} AS nc FROM c$KMeansIter),
         |bn AS (
         |  $bnUnion),
         |${ivfadcOracleTail(sub)}""".stripMargin
    },
    "sim_ivf_trained" ->
      s"""WITH $quantCte,
         |$kmeansChainCtes,
         |${ivfOracleTail(
        s"""SELECT cid, cv, ${dotSql("cv", "cv")} AS nc FROM c$KMeansIter""")}""".stripMargin,
    "dd_semantic_dedup" -> semanticDedupOracle(kmeansChainCtes, KMeansIter),
    // identical pipeline, k=32 / one round — the chain and the final
    // assign swap in; the Spark-side formulation change (reference
    // object vs literals) is invisible to the oracle, which is the
    // parity point.
    "dd_semantic_bigk" ->
      semanticDedupOracle(kmeansChainFor("", "v", Dim, 32, 1), 1)
  )

  /** The SemDeDup oracle tail, parameterized by the training chain (and
    * its final-codebook index): doubled fixture → quantize → train →
    * assign → within-cluster cosine pairs → drop higher-id near-dups. */
  private def semanticDedupOracle(chain: String, iters: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
       |  UNION ALL SELECT vec_id + $IdShift, embedding FROM embeddings),
       |v AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |FROM e),
       |$chain,
       |${kmeansAssignCte(s"c$iters", "af")},
       |mm AS (SELECT vn.vec_id, vn.q, vn.nq, af.cid
       |  FROM vn JOIN af USING (vec_id)),
       |rm AS (SELECT DISTINCT b.vec_id
       |  FROM mm a JOIN mm b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE CAST(${dotSql("a.q", "b.q")} AS DOUBLE) /
       |    (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) >= $SemThreshold)
       |SELECT m.vec_id, m.cid FROM mm m
       |WHERE m.vec_id NOT IN (SELECT vec_id FROM rm)
       |ORDER BY m.vec_id""".stripMargin

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
  private val HeavyHittersK = 25
  private val SplitValPct = 10
  private val SplitTestPct = 10
  // Per-source token budget for tp_token_budget — ~45% of a fixture
  // source's ~1300 tokens, so each source's selection boundary lands
  // mid-catalog (both verdicts well-populated).
  private val CurateBudget = 600L

  /** The SAME bucket construction as TrainPrep.hashBucket, in DuckDB. */
  private def hashBucketSql(x: String): String =
    s"CAST(('0x' || substr(md5(CAST($x AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

  private val trainprep: Map[String, Q] = Map(
    "tp_sample_hash" -> ((s, dir) =>
      TrainPrep.sampleByHash(t(s, dir, "documents"), "doc_id", SamplePct)
        .select("doc_id", "bucket")
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

  private val trainprepOracles: Map[String, String] = Map(
    "tp_sample_hash" ->
      s"""WITH b AS (SELECT doc_id, ${hashBucketSql("doc_id")} AS bucket
         |  FROM documents)
         |SELECT doc_id, bucket FROM b
         |WHERE bucket < $SamplePct ORDER BY doc_id""".stripMargin,
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

  // ---------------------------------------------------------------------
  // Text analysis
  // ---------------------------------------------------------------------

  private val text: Map[String, Q] = Map(
    "tx_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "tx_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "tx_langid" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "tx_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // Sketch-prefiltered exact heavy hitters: Misra-Gries candidates
    // (bounded map-side state at any vocabulary size) → exact count +
    // rank of candidates only. Oracle = the plain exact top-k; equality
    // holds whenever the k-th count clears the sketch error bound
    // (trivially true at fixture vocabulary).
    "tx_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(t(s, dir, "documents"), "text",
        HeavyHittersK)),
    // Fixed-point tf-idf ranking (integer score — ln's last-ulp
    // divergence between JVM and libm would break hash parity).
    "tx_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text",
          topN = 3)
        .orderBy("doc_id", "rank")),
    // C4-style line cleaning. The fixture text is single-line, so the
    // query first breaks sentences into lines ('. ' → '.\n') the same
    // way on both sides — the cleaning then has real lines to judge.
    "tx_c4_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "\\. ", ".\n").as("text"))
      TextAnalysis.c4LineClean(docs, "doc_id", "text").orderBy("doc_id")
    }),
    // PII scrub. The fixture text has no PII, so the query plants
    // deterministic PII derived from real columns (same construction in
    // the oracle): an email on 4 of 5 docs, an IPv4 on all, a phone on
    // every third — zero-count paths stay covered.
    "tx_pii_scrub" -> ((s, dir) =>
      TextAnalysis.piiScrub(plantPii(t(s, dir, "documents")),
        "doc_id", "text").orderBy("doc_id")),
    // Gopher-style repetition stats (integer ppm ratios — exact on both
    // engines; bigram tiebreak is lexicographic max(struct)).
    "tx_rep_stats" -> ((s, dir) =>
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"))
  )

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  private val textOracles: Map[String, String] = Map(
    "tx_token_stats" ->
      s"""WITH w AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)
         |SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.wordPattern}')) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.bpePattern}')) AS BIGINT) AS n_bpe,
         |  CAST(list_sum(list_transform(w, t -> len(t))) AS BIGINT) AS n_token_chars,
         |  CASE WHEN len(w) > 0
         |    THEN CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w)
         |    ELSE 0.0 END AS avg_token_len
         |FROM w ORDER BY doc_id""".stripMargin,
    "tx_quality" -> {
      val en = inList(TextAnalysis.stopwords.toMap.apply("en"))
      s"""WITH w AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(text) AS BIGINT) AS n_chars,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(len(list_filter(w, t -> t IN ($en))) AS BIGINT) AS n_stopwords
         |FROM w)
         |SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
         |  CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
         |  CASE WHEN n_tokens > 0 THEN CAST(n_stopwords AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_ratio,
         |  (n_tokens >= 5 AND n_tokens <= 100000
         |   AND (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) < 0.2) AS quality_keep
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "tx_langid" -> {
      val scores = TextAnalysis.stopwords.map { case (l, ws) =>
        s"CAST(len(list_filter(w, t -> t IN (${inList(ws)}))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val best = TextAnalysis.stopwords.map { case (l, _) => s"s_$l" }
        .mkString("greatest(", ", ", ")")
      val cases = TextAnalysis.stopwords.map { case (l, _) =>
        s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
      }.mkString("\n    ")
      s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |s AS (SELECT doc_id,
         |  $scores
         |FROM w)
         |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
         |  CASE $cases
         |    ELSE 'und' END AS lang_guess
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "tx_fingerprint" -> {
      // Polynomial window hash with the SAME base/modulus constants as
      // graft.functions.RollingHash — power literals inlined.
      val pw = graft.functions.RollingHash.powers(8)
      val terms = (0 until 8)
        .map(k => s"CAST(unicode(p[i + $k : i + $k]) AS BIGINT) * ${pw(7 - k)}")
        .mkString(" + ")
      s"""WITH n AS (SELECT doc_id,
         |  regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm FROM documents),
         |pd AS (SELECT doc_id, norm,
         |  CASE WHEN length(norm) < 8 THEN rpad(norm, 8, chr(1))
         |       ELSE norm END AS p FROM n)
         |SELECT doc_id, md5(norm) AS content_md5,
         |  CAST(list_min(list_transform(range(1, length(p) - 6),
         |    i -> ($terms) % 4294967296)) AS BIGINT) AS min_gram_hash
         |FROM pd ORDER BY doc_id""".stripMargin
    },
    // The heavy-hitters oracle is the PLAIN exact top-k — no sketch
    // anywhere in it (the sketch only nominates candidates).
    "tx_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM documents)
         |SELECT token, count(*) AS n FROM tk
         |GROUP BY token ORDER BY n DESC, token LIMIT $HeavyHittersK""".stripMargin,
    // Integer floor-division score both sides (Spark `div`, DuckDB `//`);
    // ASCII-only terms, lowercased after extraction (locale-free).
    "tx_tfidf" ->
      """WITH tok AS (SELECT doc_id, lower(t) AS term FROM
        |  (SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z]+')) AS t
        |   FROM documents)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |sc AS (SELECT t.doc_id, t.term, t.tf, d.df,
        |  t.tf * 1000000 // d.df AS score_q,
        |  CAST(row_number() OVER (PARTITION BY t.doc_id
        |    ORDER BY t.tf * 1000000 // d.df DESC, t.term) AS BIGINT) AS "rank"
        |  FROM tf t JOIN dfreq d USING (term))
        |SELECT doc_id, term, tf, df, score_q, "rank"
        |FROM sc WHERE "rank" <= 3 ORDER BY doc_id, "rank"""".stripMargin,
    "tx_pii_scrub" -> {
      // Counts and the replace chain are generated from the SAME
      // pattern list as the Spark plan (TextAnalysis.piiPatterns).
      val counts = TextAnalysis.piiPatterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n  ")
      val scrub = TextAnalysis.piiPatterns.foldLeft("text") {
        case (c, (_, pat, token)) =>
          s"regexp_replace($c, '$pat', '$token', 'g')"
      }
      s"""WITH p AS (SELECT doc_id, concat_ws(' ', text,
         |  CASE WHEN doc_id % 5 <> 0 THEN source || '.' || lang || '@example.com' END,
         |  '10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR),
         |  CASE WHEN doc_id % 3 = 0 THEN '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END
         |) AS text FROM documents)
         |SELECT doc_id,
         |  $counts,
         |  $scrub AS scrubbed
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "tx_rep_stats" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS t FROM w),
        |wc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
        |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |  count(*) AS n_distinct,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_tokens
        |  FROM wc GROUP BY doc_id),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        |  THEN list_transform(generate_series(1, len(w) - 1),
        |                      i -> w[i] || ' ' || w[i+1])
        |  ELSE CAST([] AS VARCHAR[]) END) AS g FROM w),
        |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
        |bt AS (SELECT doc_id, max(struct_pack(c := c, g := g)) AS top
        |  FROM bc GROUP BY doc_id)
        |SELECT a.doc_id, n_words, n_distinct, n_dup_tokens,
        |  n_dup_tokens * 1000000 // n_words AS dup_frac_ppm,
        |  COALESCE(top.g, '') AS top_bigram,
        |  CAST(COALESCE(top.c, 0) AS BIGINT) AS top_bigram_n,
        |  CAST(COALESCE(top.c * 2000000 // n_words, 0) AS BIGINT) AS top_bigram_ppm
        |FROM wa a LEFT JOIN bt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "tx_c4_clean" ->
      """WITH d AS (SELECT doc_id,
        |  str_split(regexp_replace(text, '\. ', '.' || chr(10), 'g'),
        |            chr(10)) AS lines FROM documents),
        |k AS (SELECT doc_id, lines,
        |  list_filter(lines, l ->
        |    regexp_matches(trim(l), '[.!?"'']$')
        |    AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
        |    AND NOT contains(lower(trim(l)), 'javascript')
        |    AND NOT contains(lower(trim(l)), 'cookie')
        |    AND NOT contains(lower(trim(l)), '{')) AS keep FROM d)
        |SELECT doc_id,
        |  COALESCE(array_to_string(keep, chr(10)), '') AS clean_text,
        |  CAST(len(keep) AS BIGINT) AS n_kept,
        |  CAST(len(lines) - len(keep) AS BIGINT) AS n_dropped
        |FROM k ORDER BY doc_id""".stripMargin
  )

  // ---------------------------------------------------------------------
  // Events (batch duals of the streaming path)
  // ---------------------------------------------------------------------

  private val events: Map[String, Q] = Map(
    "ev_hourly_rollup" -> ((s, dir) =>
      Events.hourlyRollup(t(s, dir, "events")).orderBy("hour", "event_type")),
    "ev_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events"), SessionGapSeconds)
        .orderBy("user_id", "session_id")),
    // The hot-key-safe two-level form — SAME oracle as ev_sessionize:
    // the value-for-value match IS the proof the bucket-cut repair
    // reproduces plain sessionization exactly.
    "ev_sessionize_2level" -> ((s, dir) =>
      Events.sessionize2Level(t(s, dir, "events"), SessionGapSeconds)
        .orderBy("user_id", "session_id")),
    // HLL scale variant: approx_count_distinct instead of the exact
    // two-phase distinct (bounded sketch state — what the 100 TB rollup
    // actually runs). Approximate ⇒ no hash oracle (driver rows-only);
    // the error bound vs the exact count is asserted in EventsSpec.
    "ev_hourly_rollup_approx" -> ((s, dir) =>
      Events.hourlyRollupApprox(t(s, dir, "events"))
        .orderBy("hour", "event_type")),
    // Ordered funnel: users reaching view → click → purchase with each
    // step strictly after the previous step's earliest completion.
    "ev_funnel" -> ((s, dir) =>
      Events.funnel(t(s, dir, "events"), FunnelSteps)
        .orderBy("step_order")),
    // Behavioral-graph edge weights: top (from, to) consecutive
    // event-type pairs per user timeline, (ts, event_id)-total-ordered.
    "ev_path_transitions" -> ((s, dir) =>
      Events.pathTransitions(t(s, dir, "events"), PathTopK)),
    // CDC compaction read: latest event per user via one struct-max
    // (map-side partials, no per-user sort).
    "ev_latest_snapshot" -> ((s, dir) =>
      Events.latestSnapshot(t(s, dir, "events")).orderBy("user_id")),
    // Dense-spine resample: every (type, hour) cell over the global
    // range, zero-filled counts, forward-filled value, has_data flag.
    "ev_gap_fill" -> ((s, dir) =>
      Events.gapFill(t(s, dir, "events"))
        .orderBy("event_type", "hour")),
    // Incremental-view maintenance: the rollup rebuilt from two delta
    // partials (split on event_id parity) must equal the full-scan
    // rollup — the oracle IS the full scan.
    "ev_rollup_incremental" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Events.hourlyRollupMerge(Seq(
          ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1)))
        .orderBy("hour", "event_type")
    }),
    // Full-walk sibling of ev_path_transitions: top-k complete session
    // path strings (same gap convention as ev_sessionize).
    "ev_session_paths" -> ((s, dir) =>
      Events.sessionPaths(t(s, dir, "events"), SessionGapSeconds, PathTopK)),
    // SCD type-2 intervals from the raw change stream: one row per run
    // of consecutive equal event types, with validity bounds.
    "ev_scd2" -> ((s, dir) =>
      Events.scd2(t(s, dir, "events")).orderBy("user_id", "version")),
    // ROLLUP grouping sets: leaf (type, day) cells + per-type subtotals
    // + grand total in one Expand+aggregate pass.
    "ev_rollup_multi" -> ((s, dir) =>
      Events.rollupMulti(t(s, dir, "events"))
        .orderBy("gid", "event_type", "day")),
    // Cohort retention: users cohort by first-event date; each cell
    // counts that cohort's actives day_offset days later.
    "ev_retention" -> ((s, dir) =>
      Events.retention(t(s, dir, "events"))
        .withColumn("cohort_date", col("cohort_date").cast("string"))
        .orderBy("cohort_date", "day_offset")),
    // Exact-AND-bounded distinct: paged-bitmap aggregation (ClickHouse
    // groupBitmap analog). Hash-oracled against COUNT(DISTINCT) — the
    // bitmap path is exact by construction, so the oracle is the plain
    // SQL distinct.
    "ev_bitmap_distinct" -> ((s, dir) =>
      Events.bitmapDistinct(t(s, dir, "events"), "event_type", "user_id")
        .orderBy("event_type")),
    // ROLLUP (multi-level subtotals in one shuffle) and pinned-values
    // PIVOT — the grouping-analytics surface beyond plain GROUP BY.
    // Rolled-up keys surface as '(all)'/-1 (no nulls in output).
    "ev_type_rollup" -> ((s, dir) =>
      Events.typeRollup(t(s, dir, "events")).orderBy("event_type", "hod")),
    "ev_pivot" -> ((s, dir) =>
      Events.typePivot(t(s, dir, "events")).orderBy("hod")),
    // UNPIVOT round-trip of the pivot (melt back to long form — zero
    // cells survive as real rows) and a value-based rangeBetween frame
    // (10-minute sliding sum; tie timestamps all included, so the
    // result is deterministic without an intra-ts tiebreak).
    "ev_unpivot" -> ((s, dir) =>
      Events.typeUnpivot(Events.typePivot(t(s, dir, "events")))
        .orderBy("hod", "event_type")),
    "ev_sliding_sum" -> ((s, dir) =>
      Events.slidingTimeSum(t(s, dir, "events"), 600L)
        .orderBy("user_id", "event_id")),
    // Fixed-width histogram: integer floor-div binning (0.5-unit bins
    // over micro-quantized values) — boundary-exact on both engines.
    "ev_histogram" -> ((s, dir) =>
      Events.valueHistogram(t(s, dir, "events"), 500000L).orderBy("bin")),
    // Exact binary-fraction quantiles (interpolation exact in double on
    // both engines) and window-function breadth (lag/lead/ntile/
    // cume_dist — IEEE division is correctly rounded, so cume is
    // bit-identical cross-engine).
    "ev_quantiles" -> ((s, dir) =>
      Events.valueQuantiles(t(s, dir, "events")).orderBy("event_type")),
    "ev_timeline_windows" -> ((s, dir) =>
      Events.timelineWindows(t(s, dir, "events"))
        .orderBy("user_id", "event_id")),
    // Morton (Z-order) key derivation — the 2-D layout key behind
    // Layout.clusterByZ; the oracle re-runs the same magic-number bit
    // spread in DuckDB from shared constants.
    "ev_zorder" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("hour_idx"))
      e.select(col("event_id"), col("user_id"), col("hour_idx"),
          Layout.zValue(col("user_id"), col("hour_idx")).as("z"))
        .orderBy("event_id")
    }),
    "ev_top_n" -> ((s, dir) =>
      Events.topNPerUser(t(s, dir, "events"), 3).orderBy("user_id", "rank")),
    // Hive-partitioned layout roundtrip: write one directory per
    // event_type (pre-shuffled: few files per partition), read back one
    // type — the scan's PartitionFilters answer the predicate from the
    // directory listing (asserted in LayoutSpec); the rollup then runs
    // over only that type's bytes. Oracle = the same rollup with a WHERE
    // on the raw table.
    "ev_partition_prune" -> ((s, dir) => {
      val out = graft.Scratch.dir("graft_part")
      Layout.writePartitioned(t(s, dir, "events"), out, "event_type")
      Events.hourlyRollup(
          s.read.parquet(out).where(col("event_type") === "click"))
        .orderBy("hour")
    }),
    "ev_moving_sum" -> ((s, dir) =>
      Events.movingSum(t(s, dir, "events")).orderBy("user_id", "event_id")),

    // Backward AS-OF join (Joins.asofJoin — union-and-carry, one shuffle
    // on the key): every view event picks up the user's latest
    // click-at-or-before it. The right side aggregates to one row per
    // (user, time); unmatched views coalesce to -1. Oracle = DuckDB's
    // native ASOF LEFT JOIN — an independent implementation of the same
    // semantics.
    "ev_asof_join" -> ((s, dir) =>
      asofViewClick(s, dir) { (views, clicks) =>
        Joins.asofJoin(views, clicks, "user_id", "us",
          Seq("click_us", "click_vm"))
      }),
    // The hot-key-safe two-level form — SAME oracle as ev_asof_join
    // (the value-for-value match proves the bucket-boundary repair
    // reproduces the plain carry exactly). Day-sized buckets.
    "ev_asof_join_2level" -> ((s, dir) =>
      asofViewClick(s, dir) { (views, clicks) =>
        Joins.asofJoin2Level(views, clicks, "user_id", "us",
          Seq("click_us", "click_vm"), bucketWidth = 86400L * 1000000L)
      }),

    // Interval-containment RANGE join (Joins.rangeJoin — bucket
    // decomposition, hash join on the coarse bucket, never a nested
    // loop): the 50 longest sessions become time intervals; every event
    // in the table (any user) inside an interval counts toward it. The
    // oracle is DuckDB's plain BETWEEN range join — an independent
    // execution of the same predicate.
    "ev_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val top = Events.sessionize(ev, SessionGapSeconds)
        .orderBy(col("duration_us").desc, col("user_id"), col("session_id"))
        .limit(50)
        .select(col("user_id").as("iv_user_id"),
          col("session_id").as("iv_session_id"),
          col("start_us"), col("end_us"))
      val pts = ev.select(col("user_id").as("p_user_id"),
        col("event_id"), unix_micros(col("ts")).as("us"))
      Joins.rangeJoin(pts, "us", top, "start_us", "end_us",
          bucketWidth = 3600L * 1000000L)
        .groupBy("iv_user_id", "iv_session_id", "start_us", "end_us")
        .agg(count(lit(1)).as("n_in"),
          countDistinct(col("p_user_id")).as("n_users"))
        .orderBy("iv_user_id", "iv_session_id")
    })
  )

  // Shared input prep for the as-of variants: views = left rows,
  // clicks aggregated to one row per (user, time) — the as-of
  // uniqueness precondition; unmatched views coalesce to -1.
  private def asofViewClick(s: SparkSession, dir: String)(
      join: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        Events.micros(col("value")).as("vm"))
    val views = e.where(col("event_type") === "view")
      .select("user_id", "event_id", "us")
    val clicks = e.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("us").as("click_us"))
      .agg(max(col("vm")).as("click_vm"))
      .select(col("user_id"), col("click_us").as("us"),
        col("click_us"), col("click_vm"))
    join(views, clicks)
      .select(col("user_id"), col("event_id"), col("us"),
        coalesce(col("click_us"), lit(-1L)).as("click_us"),
        coalesce(col("click_vm"), lit(-1L)).as("click_vm"))
      .orderBy("event_id")
  }

  // Gap boundary PINNED to strictly-> on both sides (see
  // Events.sessionize scaladoc): exactly-gap distance continues the
  // session. Flipping either side to >= breaks the EventsSpec
  // boundary test and this oracle's hash match. Shared verbatim by
  // ev_sessionize, ev_sessionize_2level, and st_stateful_sessions —
  // three implementations, one contract.
  private lazy val sessionizeOracleSql: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
       |b AS (SELECT user_id, event_id, us,
       |  CASE WHEN lag(us) OVER w IS NULL
       |         OR us - lag(us) OVER w > ${SessionGapSeconds * 1000000L}
       |       THEN 1 ELSE 0 END AS brk
       |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |s AS (SELECT user_id, us,
       |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |FROM b)
       |SELECT user_id, session_id, count(*) AS n_events,
       |  min(us) AS start_us, max(us) AS end_us,
       |  max(us) - min(us) AS duration_us
       |FROM s GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // Latest-per-key snapshot — shared verbatim by the batch struct-max
  // (ev_latest_snapshot) and the streaming CDC snapshot
  // (st_latest_snapshot): two implementations, one contract.
  private lazy val latestSnapshotOracleSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |r AS (SELECT user_id, event_id, event_type, us,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, us AS last_us, event_id AS last_event_id,
      |  event_type AS last_type
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  // SCD2 run compression — shared verbatim by the batch build (ev_scd2)
  // and its streaming CDC dual (st_scd2): two implementations, one
  // contract, including the Long.MaxValue "current" sentinel.
  private lazy val scd2OracleSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |b AS (SELECT user_id, event_id, event_type, us,
      |  CASE WHEN lag(event_type) OVER w IS NULL
      |         OR lag(event_type) OVER w <> event_type
      |       THEN 1 ELSE 0 END AS chg
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |r AS (SELECT user_id, event_type, us,
      |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      |FROM b),
      |g AS (SELECT user_id, version, min(event_type) AS state,
      |  min(us) AS valid_from_us, count(*) AS n_events
      |FROM r GROUP BY user_id, version)
      |SELECT user_id, version, state, valid_from_us, n_events,
      |  coalesce(lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version),
      |           9223372036854775807) AS valid_to_us
      |FROM g ORDER BY user_id, version""".stripMargin

  // events.ts is TIMESTAMP(NANOS) in the parquet; Spark-side we truncate
  // to microseconds (Tables.load), so every oracle goes through
  // epoch_us(CAST(ts AS TIMESTAMP)) — the same floor-to-micros.
  // ev_hourly_rollup_approx has NO oracle (approximate results cannot
  // hash-match) → driver rows-only; the error bound is spec-checked.
  private val eventsOracles: Map[String, String] = Map(
    "ev_hourly_rollup" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "ev_sessionize" -> sessionizeOracleSql,
    "ev_sessionize_2level" -> sessionizeOracleSql,
    "ev_bitmap_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_path_transitions" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |p AS (SELECT event_type AS from_type,
         |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
         |  FROM e)
         |SELECT from_type, to_type, count(*) AS n FROM p
         |WHERE to_type IS NOT NULL
         |GROUP BY from_type, to_type
         |ORDER BY n DESC, from_type, to_type LIMIT $PathTopK""".stripMargin,
    // row_number replay of the struct-max: ties on us fall to the
    // larger event_id on both sides (lexicographic max ⇔ DESC, DESC).
    "ev_latest_snapshot" -> latestSnapshotOracleSql,
    "ev_gap_fill" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS vm
        |FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM h),
        |spine AS (SELECT t.event_type, g.h AS hour
        |  FROM (SELECT DISTINCT event_type FROM h) t
        |  CROSS JOIN b, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS g(h)),
        |j AS (SELECT s.event_type, s.hour,
        |  h.vm IS NOT NULL AS has_data,
        |  COALESCE(h.n_events, 0) AS n_events,
        |  COALESCE(last_value(h.vm IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.hour
        |    ROWS UNBOUNDED PRECEDING), 0) AS value_micros
        |FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.hour = s.hour)
        |SELECT CAST(hour AS VARCHAR) AS hour, event_type, n_events,
        |  value_micros, has_data
        |FROM j ORDER BY event_type, hour""".stripMargin,
    // The merged-partials view must equal a FULL RESCAN — so the oracle
    // is the plain full-scan rollup (no distinct column; see the
    // hourlyRollupMerge scaladoc for why).
    "ev_rollup_incremental" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // Same session-break chain as sessionizeOracleSql (strictly-> gap),
    // with event_type carried through; string_agg's ORDER BY replays
    // the (us, event_id) total order the Spark array_sort restores.
    "ev_session_paths" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |b AS (SELECT user_id, event_id, event_type, us,
         |  CASE WHEN lag(us) OVER w IS NULL
         |         OR us - lag(us) OVER w > ${SessionGapSeconds * 1000000L}
         |       THEN 1 ELSE 0 END AS brk
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (SELECT user_id, event_id, event_type, us,
         |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |FROM b),
         |p AS (SELECT string_agg(event_type, '>' ORDER BY us, event_id) AS path
         |  FROM s GROUP BY user_id, session_id)
         |SELECT path, count(*) AS n FROM p
         |GROUP BY path ORDER BY n DESC, path LIMIT $PathTopK""".stripMargin,
    "ev_scd2" -> scd2OracleSql,
    "ev_rollup_multi" ->
      """WITH e AS (SELECT event_type,
        |  CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS day,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events)
        |SELECT coalesce(event_type, '(all)') AS event_type,
        |  coalesce(day, '(all)') AS day,
        |  CAST(grouping_id(event_type, day) AS BIGINT) AS gid,
        |  count(*) AS n_events, CAST(sum(vm) AS BIGINT) AS value_micros
        |FROM e GROUP BY ROLLUP(event_type, day)
        |ORDER BY gid, event_type, day""".stripMargin,
    // Date truncation is nanos-insensitive, so the cohort oracle casts
    // straight to DATE; DATE − DATE is integer days in DuckDB.
    "ev_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_date FROM a GROUP BY user_id)
        |SELECT CAST(cohort_date AS VARCHAR) AS cohort_date,
        |  CAST(d - cohort_date AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY cohort_date, day_offset
        |ORDER BY cohort_date, day_offset""".stripMargin,
    // epoch_us(CAST(... AS TIMESTAMP)) floors the nanos column to the
    // same micros Spark compares on (the shared events-oracle pattern).
    "ev_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step_order, 'view' AS step,
        |    CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY step_order""".stripMargin,
    "ev_partition_prune" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events WHERE event_type = 'click'
        |GROUP BY 1, 2 ORDER BY hour""".stripMargin,
    "ev_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |v AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, us AS click_us, max(vm) AS click_vm FROM e
        |  WHERE event_type = 'click' GROUP BY user_id, us)
        |SELECT v.user_id, v.event_id, v.us,
        |  COALESCE(c.click_us, -1) AS click_us,
        |  COALESCE(c.click_vm, -1) AS click_vm
        |FROM v ASOF LEFT JOIN c
        |  ON v.user_id = c.user_id AND v.us >= c.click_us
        |ORDER BY event_id""".stripMargin,
    "ev_asof_join_2level" -> // same contract as the plain form
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |v AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, us AS click_us, max(vm) AS click_vm FROM e
        |  WHERE event_type = 'click' GROUP BY user_id, us)
        |SELECT v.user_id, v.event_id, v.us,
        |  COALESCE(c.click_us, -1) AS click_us,
        |  COALESCE(c.click_vm, -1) AS click_vm
        |FROM v ASOF LEFT JOIN c
        |  ON v.user_id = c.user_id AND v.us >= c.click_us
        |ORDER BY event_id""".stripMargin,
    // Plain BETWEEN range join over the same top-50 session intervals;
    // the ORDER BY ... LIMIT tiebreak (duration DESC, user, session) is
    // total, so both engines select the same 50 regardless of ties.
    "ev_range_join" ->
      s"""WITH sess AS ($sessionizeOracleSql),
         |top AS (SELECT * FROM sess
         |  ORDER BY duration_us DESC, user_id, session_id LIMIT 50),
         |pts AS (SELECT user_id AS p_user_id, event_id,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
         |SELECT t.user_id AS iv_user_id, t.session_id AS iv_session_id,
         |  t.start_us, t.end_us, count(*) AS n_in,
         |  count(DISTINCT p_user_id) AS n_users
         |FROM top t JOIN pts ON pts.us BETWEEN t.start_us AND t.end_us
         |GROUP BY 1, 2, 3, 4
         |ORDER BY iv_user_id, iv_session_id""".stripMargin,
    "ev_type_rollup" ->
      """WITH e AS (SELECT event_type, hour(ts) AS hod,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events)
        |SELECT COALESCE(event_type, '(all)') AS event_type,
        |  COALESCE(hod, -1) AS hod,
        |  count(*) AS n_events, CAST(sum(vm) AS BIGINT) AS value_micros
        |FROM e GROUP BY ROLLUP(event_type, hod)
        |ORDER BY event_type, hod""".stripMargin,
    "ev_pivot" -> {
      val cols = Events.EventTypes.map(et =>
        s"CAST(COALESCE(sum(CASE WHEN event_type = '$et' THEN vm END), 0) AS BIGINT) AS $et")
        .mkString(",\n  ")
      s"""WITH e AS (SELECT hour(ts) AS hod, event_type,
         |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events)
         |SELECT hod,
         |  $cols
         |FROM e GROUP BY hod ORDER BY hod""".stripMargin
    },
    "ev_zorder" -> {
      // CTE chain generated from Layout.ZSpreadSteps — identical
      // shift/mask literals in both engines.
      val steps = Layout.ZSpreadSteps.zipWithIndex.map {
        case ((sh, m), i) =>
          val prev = if (i == 0) "e0" else s"s${i - 1}"
          s"""s$i AS (SELECT event_id, user_id, hour_idx,
             |  ((a | (a << $sh)) & $m) AS a,
             |  ((b | (b << $sh)) & $m) AS b FROM $prev)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT event_id, user_id,
         |  epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx,
         |  user_id & 2147483647 AS a,
         |  (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) & 2147483647 AS b
         |FROM events),
         |$steps
         |SELECT event_id, user_id, hour_idx, (a | (b << 1)) AS z
         |FROM s${Layout.ZSpreadSteps.size - 1} ORDER BY event_id""".stripMargin
    },
    "ev_quantiles" ->
      """WITH e AS (SELECT event_type,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events)
        |SELECT event_type,
        |  quantile_cont(vm, 0.25) AS p25,
        |  quantile_cont(vm, 0.5) AS p50,
        |  quantile_cont(vm, 0.75) AS p75,
        |  count(*) AS n
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_timeline_windows" ->
      """WITH e AS (SELECT user_id, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
        |SELECT user_id, event_id,
        |  COALESCE(lag(event_id) OVER w, -1) AS prev_event,
        |  COALESCE(lead(event_id) OVER w, -1) AS next_event,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  cume_dist() OVER w AS cume
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "ev_unpivot" -> {
      val arms = Events.EventTypes.map(et =>
        s"SELECT hod, '$et' AS event_type, $et AS value_micros FROM p")
        .mkString("\nUNION ALL ")
      val cols = Events.EventTypes.map(et =>
        s"CAST(COALESCE(sum(CASE WHEN event_type = '$et' THEN vm END), 0) AS BIGINT) AS $et")
        .mkString(",\n  ")
      s"""WITH e AS (SELECT hour(ts) AS hod, event_type,
         |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
         |p AS (SELECT hod,
         |  $cols
         |FROM e GROUP BY hod)
         |$arms
         |ORDER BY hod, event_type""".stripMargin
    },
    "ev_histogram" ->
      """WITH e AS (SELECT CAST(floor(value * 1000000) AS BIGINT) AS vm
        |  FROM events)
        |SELECT vm // 500000 AS bin, count(*) AS n,
        |  CAST(sum(vm) AS BIGINT) AS sum_micros, (vm // 500000) * 500000 AS bin_lo
        |FROM e GROUP BY 1 ORDER BY bin""".stripMargin,
    "ev_sliding_sum" ->
      """WITH e AS (SELECT user_id, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events)
        |SELECT user_id, event_id, us,
        |  CAST(sum(vm) OVER (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS win_micros
        |FROM e ORDER BY user_id, event_id""".stripMargin,
    "ev_top_n" ->
      """WITH r AS (SELECT user_id, event_id, value,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS "rank"
        |FROM events)
        |SELECT user_id, event_id, value, "rank"
        |FROM r WHERE "rank" <= 3 ORDER BY user_id, "rank"""".stripMargin,
    "ev_moving_sum" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT))
        |       OVER (PARTITION BY user_id
        |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT))
        |       OVER (PARTITION BY user_id
        |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000 AS mov_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin
  )

  // ---------------------------------------------------------------------
  // Multimodal (graft.operators.Multimodal): binary payload columns +
  // typed metadata, batched stub decode, expression-only frame sampling.
  // The fixture text is pure ASCII, so the oracle derives identical byte
  // values from the text itself (payload = UTF-8 bytes of text).
  // ---------------------------------------------------------------------

  private def mmPayload(s: SparkSession, dir: String) =
    Multimodal.asBinaryPayload(t(s, dir, "documents"), "doc_id", "text")

  private val multimodal: Map[String, Q] = Map(
    "mm_meta" -> ((s, dir) =>
      Multimodal.extractMeta(mmPayload(s, dir)).orderBy("doc_id")),
    "mm_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(mmPayload(s, dir)).orderBy("doc_id")),
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(mmPayload(s, dir))
        .select(col("doc_id"), col("n_frames"),
          concat_ws("|", col("frame_md5s")).as("frames"))
        .orderBy("doc_id")),
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

  private val multimodalOracles: Map[String, String] = Map(
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

  // ---------------------------------------------------------------------
  // Streaming (graft.streaming.StreamOps) — a genuinely streaming plan
  // (file stream → watermark+window agg → memory sink, run to
  // completion) plus the stream-capable session_window operator in its
  // batch mode. Both get the SAME oracles as their batch duals: the
  // value-for-value match IS the stream/batch parity proof.
  // ---------------------------------------------------------------------

  private val streaming: Map[String, Q] = Map(
    "st_hourly_rollup" -> ((s, dir) =>
      graft.streaming.StreamOps.runToCompletion(
        s, Tables.loadStream(s, dir, "events"),
        graft.streaming.StreamOps.hourlyRollupStream,
        shufflePartitions = StreamStateParts)
        .orderBy("hour", "event_type")),
    // The bounded-state form of the rollup: HLL sketch per (window,
    // type) instead of collect_set — fixed state memory at any stream
    // cardinality. Approximate ⇒ no hash oracle (driver rows-only);
    // StreamingSpec bounds the estimate against the exact rollup.
    "st_hourly_rollup_approx" -> ((s, dir) =>
      graft.streaming.StreamOps.runToCompletion(
        s, Tables.loadStream(s, dir, "events"),
        graft.streaming.StreamOps.hourlyRollupApproxStream,
        shufflePartitions = StreamStateParts)
        .orderBy("hour", "event_type")),
    "st_session_window" -> ((s, dir) =>
      graft.streaming.StreamOps.sessionWindowAgg(
        t(s, dir, "events"), SessionGapSeconds)
        .orderBy("user_id", "start_us")),

    // Streaming corpus prep: the documents file streamed twice
    // (at-least-once delivery), quality + language predicates as
    // stateless filters on the scan, then watermark-bounded key dedup —
    // the streaming dual of tp_corpus_pipeline's front half. Event time
    // is synthesized deterministically from doc_id (positive epoch —
    // rows at/below the engine's initial watermark would drop as late).
    "st_corpus_prep" -> ((s, dir) => {
      def docStream() = Tables.loadStream(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          timestamp_seconds(col("doc_id") + lit(1000000000L)).as("ts"))
      graft.streaming.StreamOps.runToCompletion(s,
        docStream().unionAll(docStream()),
        graft.streaming.StreamOps.corpusPrepStream(_, PipelineLang),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("doc_id")
    }),

    // Streaming exact dedup: the same file streamed twice (UNION ALL of
    // two identical sources), deduplicated on event_id with watermarked,
    // BOUNDED state (dropDuplicatesWithinWatermark — state evicts once
    // the watermark passes ts + delay) — each event emitted exactly once.
    "st_stream_dedup" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
        .unionAll(Tables.loadStream(s, dir, "events"))
      graft.streaming.StreamOps.runToCompletion(s, src,
        graft.streaming.StreamOps.streamDedup(_),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("event_id")
    }),

    // ARBITRARY-STATE sessionization (flatMapGroupsWithState, event-time
    // timeout) run as a real stream and checked against the SAME oracle
    // as the batch window and the two-level form — the third stream/
    // batch parity proof, this one for custom state. A sentinel event
    // (user −1) past every session's timeout is appended so the final
    // watermark closes each real user's last open session before the
    // stream drains; the sentinel's own session stays open and is
    // filtered out.
    "st_stateful_sessions" -> ((s, dir) => {
      import graft.streaming.StreamOps
      import s.implicits._
      val batch = t(s, dir, "events")
      val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(
        maxTs.getTime + (SessionGapSeconds + 3600) * 1000L)
      val sentinelDir = graft.Scratch.dir("graft_st_sentinel")
      Seq((-1L, -1L, sentinelTs)).toDF("user_id", "event_id", "ts")
        .write.mode("overwrite").parquet(sentinelDir)
      val evStream = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "ts")
      val src = evStream.unionAll(
        s.readStream.schema(s.read.parquet(sentinelDir).schema)
          .parquet(sentinelDir))
      StreamOps.runToCompletion(s, src,
        df => StreamOps.statefulSessionize(
          df.as[StreamOps.Ev], SessionGapSeconds).toDF(),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .where(col("user_id") >= 0)
        .orderBy("user_id", "session_id")
    }),

    // Streaming CDC snapshot: one struct-max state row per user,
    // complete-mode emission; drained result == the batch snapshot
    // (shared oracle).
    "st_latest_snapshot" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      graft.streaming.StreamOps.runToCompletion(s, src,
        graft.streaming.StreamOps.latestSnapshotStream,
        outputMode = "complete", shufflePartitions = StreamStateParts)
        .orderBy("user_id")
    }),
    // Changelog-mode CDC snapshot: per batch, only the touched keys'
    // struct-max rows merge into the generation table (order-
    // insensitive max merge), closing complete-mode's full-keyset
    // re-emission gap; drained result == the batch snapshot (shared
    // oracle).
    "st_snapshot_changelog" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      graft.streaming.StreamOps.runSnapshotChangelog(s, src,
        graft.Scratch.dir("graft_st_changelog"))
        .orderBy("user_id")
    }),
    // Streaming SCD2: incremental run compression with state-change
    // emission; the beyond-horizon sentinel flushes open intervals so
    // the drained stream equals the batch scd2 (same oracle).
    // CONSTRAINT (enforced, not assumed): the events source must drain
    // in ONE micro-batch — statefulScd2 orders events only within a
    // batch, and a mid-stream flush would restart versions — so
    // singleBatchSources asserts it from the query progress; a source
    // split across batches fails loudly instead of hash-mismatching.
    "st_scd2" -> ((s, dir) => {
      import graft.streaming.StreamOps
      import s.implicits._
      val batch = t(s, dir, "events")
      val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 7200 * 1000L)
      val sentinelDir = graft.Scratch.dir("graft_st_scd2_sentinel")
      Seq((-1L, -1L, "flush", sentinelTs))
        .toDF("user_id", "event_id", "event_type", "ts")
        .write.mode("overwrite").parquet(sentinelDir)
      val evStream = Tables.loadStream(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      val src = evStream.unionAll(
        s.readStream.schema(s.read.parquet(sentinelDir).schema)
          .parquet(sentinelDir))
      StreamOps.runToCompletion(s, src,
        df => StreamOps.statefulScd2(df.as[StreamOps.TypedEv]).toDF(),
        outputMode = "append", shufflePartitions = StreamStateParts,
        singleBatchSources = Seq(0))
        .where(col("user_id") >= 0)
        .orderBy("user_id", "version")
    }),

    // Stream-stream watermarked interval join (views × clicks of the
    // same user within the attribution window) — a genuinely streaming
    // join with bounded state; one file stream forked into two sides
    // (stream self-joins are supported for inner joins). Oracle = the
    // batch BETWEEN range join in DuckDB.
    "st_stream_join" -> ((s, dir) => {
      val src = Tables.loadStream(s, dir, "events")
      graft.streaming.StreamOps.runToCompletion(s, src,
        df => graft.streaming.StreamOps.streamIntervalJoin(
          df.where(col("event_type") === "view"),
          df.where(col("event_type") === "click"),
          StreamJoinWindowSeconds),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("view_event_id", "click_event_id")
    }),

    // Stream-STATIC enrichment: each streamed event picks up its user's
    // total count from a batch-side dimension (broadcast — stateless,
    // no watermark, no state store). Oracle = the same join in batch.
    "st_static_enrich" -> ((s, dir) => {
      val dim = t(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1)).as("user_events"))
      val src = Tables.loadStream(s, dir, "events")
      graft.streaming.StreamOps.runToCompletion(s, src,
        df => graft.streaming.StreamOps.enrichWithStatic(
          df.select("event_id", "user_id"), dim, "user_id"),
        outputMode = "append", shufflePartitions = StreamStateParts)
        .orderBy("event_id")
    })
  )

  private val streamingOracles: Map[String, String] = Map(
    // Identical to ev_hourly_rollup: the streaming plan must agree with
    // the batch aggregate bit-for-bit.
    "st_hourly_rollup" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // session_window semantics: window = [first event, last event + gap).
    "st_session_window" ->
      s"""WITH e AS (SELECT user_id, event_id, value,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |b AS (SELECT user_id, event_id, us, value,
         |  CASE WHEN lag(us) OVER w IS NULL
         |         OR us - lag(us) OVER w > ${SessionGapSeconds * 1000000L}
         |       THEN 1 ELSE 0 END AS brk
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (SELECT user_id, us, value,
         |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |FROM b)
         |SELECT user_id, min(us) AS start_us,
         |  max(us) + ${SessionGapSeconds * 1000000L} AS end_us,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, start_us""".stripMargin,
    "st_stream_dedup" ->
      """SELECT event_id, user_id, event_type
        |FROM events ORDER BY event_id""".stripMargin,
    // Batch dual of the streaming corpus prep: the quality/langid
    // survivors, each exactly once (st_hourly_rollup_approx has NO
    // oracle — approximate results cannot hash-match).
    "st_corpus_prep" ->
      s"""WITH ${qualityLangCtesOver("documents", PipelineLang)}
         |SELECT doc_id, n_tokens FROM q ORDER BY doc_id""".stripMargin,
    // Identical to the batch sessionize oracle: custom streaming state
    // must agree with the window formulation bit-for-bit.
    "st_stateful_sessions" -> sessionizeOracleSql,
    // The streaming CDC run compression must equal the batch interval
    // build value-for-value once drained (sentinel-flushed).
    "st_scd2" -> scd2OracleSql,
    // The drained streaming snapshot must equal the batch struct-max.
    "st_latest_snapshot" -> latestSnapshotOracleSql,
    "st_snapshot_changelog" -> latestSnapshotOracleSql,
    // Batch dual of the streaming interval join: inclusive BETWEEN on
    // micros; (view_event_id, click_event_id) is a unique pair → total
    // order, inner join → no nulls.
    "st_stream_join" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |v AS (SELECT user_id, event_id AS view_event_id, us AS v_us
         |  FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id AS c_user_id,
         |  event_id AS click_event_id, us AS c_us
         |  FROM e WHERE event_type = 'click')
         |SELECT v.user_id, view_event_id, click_event_id, v_us, c_us
         |FROM v JOIN c ON v.user_id = c_user_id
         |  AND c_us >= v_us
         |  AND c_us <= v_us + ${StreamJoinWindowSeconds * 1000000L}
         |ORDER BY view_event_id, click_event_id""".stripMargin,
    "st_static_enrich" ->
      """WITH dim AS (SELECT user_id, count(*) AS user_events
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, d.user_events
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |ORDER BY event_id""".stripMargin
  )

  val queries: Map[String, Q] =
    dedup ++ similarity ++ text ++ events ++ streaming ++ multimodal ++
      trainprep
  val oracles: Map[String, String] =
    dedupOracles ++ similarityOracles ++ textOracles ++ eventsOracles ++
      streamingOracles ++ multimodalOracles ++ trainprepOracles
}
