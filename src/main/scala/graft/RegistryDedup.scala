package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Dedup family of the extension registry — exact/MinHash-LSH/SimHash/
  * embedding near-dup, sub-document dedup, decontamination. Split from
  * the monolithic RegistryExt; see [[RegistryShared]] for the shared
  * constants and SQL builders. */
private[graft] trait RegistryDedup extends RegistryShared {
  // ---------------------------------------------------------------------
  // Dedup
  // ---------------------------------------------------------------------

  protected val dedup: Map[String, Q] = Map(
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
          blockLen = 8, cmpLen = 80, maxDist = 20,
          maxBlock = FuzzyMaxBlock)
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

  protected val dedupOracles: Map[String, String] = Map(
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
      s"""WITH d AS (SELECT doc_id,
        |  substr(regexp_replace(regexp_replace(trim(lower(text)),
        |    '\\s+', ' ', 'g'), '[^ -~]', '', 'g'), 1, 80) AS head
        |  FROM documents),
        |b0 AS (SELECT doc_id, head, substr(head, 1, 8) AS block FROM d),
        |b AS (SELECT doc_id, head, block FROM (
        |  SELECT doc_id, head, block,
        |    count(*) OVER (PARTITION BY block) AS n FROM b0)
        |  WHERE n <= $FuzzyMaxBlock)
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
         |nodes AS MATERIALIZED (SELECT doc_id, COALESCE(l.cluster_id, doc_id) AS cluster_id
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
      s"""WITH RECURSIVE dsc AS MATERIALIZED (SELECT doc_id, text, n_chars FROM documents
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
         |nodes AS MATERIALIZED (SELECT doc_id, COALESCE(l.cluster_id, doc_id) AS cluster_id
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

}
