package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Similarity/ANN family of the extension registry — brute-force/LSH/
  * IVF top-k, k-means training, MMR/RRF re-ranking, kNN graph, SemDeDup,
  * recall eval. The compressed/persisted index family (PQ/SQ/IVFADC,
  * index lifecycle) lives in the [[RegistryIndex]] subtrait. See
  * [[RegistryShared]]. */
private[graft] trait RegistrySimilarity extends RegistryShared {
  // ---------------------------------------------------------------------
  // Similarity search
  // ---------------------------------------------------------------------

  protected val NumCentroids = 16
  protected val NumProbes = 2
  // OR-amplification width for sim_lsh_topk: 16 independent 4-plane
  // tables. One sign-bucket table co-buckets a near-orthogonal true
  // neighbor with probability ≈ 2^-NumPlanes; the 16-table union lifts
  // recall@5 to ~0.7 at fixture scale (pinned by the SimilaritySpec
  // recall contract against brute-force ground truth).
  private val NumTables = 16
  /** Bucket resolution for the SCALED kNN-graph twin. The LSH
    * self-join's candidate-pair work is Σ_buckets occupancy² ≈
    * N·(N/2^planes) per table — QUADRATIC in N at fixed planes (the
    * sf0.01→sf1 scaling runs measured exponent 1.35 for the 4-plane
    * form; BASELINE.md round 14). The operator's scale contract is
    * therefore planes ≈ log₂(N / targetOccupancy): occupancy stays
    * constant and pair work returns to ∝ N. 11 planes targets the
    * ~20k-vector sf1 step (occupancy ≈ 10/table); the 4-plane original
    * stays registered at the fixture-tuned recall point. */
  private val NumPlanesScaled = 11
  protected val KMeansIter = 2
  // k-means‖ oversampling geometry: 3 rounds × 8 picks + the seed = 25
  // candidates ≥ k=16 (Bahmani's l ≈ k/rounds regime; constants appear
  // verbatim in the oracle's unrolled CTE chain)
  protected val KParRounds = 3
  protected val KParBatch = 8
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
  // MMR diversified re-rank: candidate pool depth and the exact
  // rational λ = 7/10 (score = 7·rel − 3·maxsim; same argmax as the
  // float objective, zero drift). Pool > TopK so the greedy loop has
  // real alternatives to diversify into.
  protected val MmrPool = 12
  protected val MmrLamNum = 7L
  protected val MmrLamDen = 10L
  // RRF fusion constant (Cormack et al.'s k=60) and the integer
  // reciprocal scale — both appear verbatim in plan and oracle.
  private val RrfK = 60
  private val RrfScale = 1000000000L

  /** Mutual-kNN clustering, parameterized by bucket resolution like
    * its oracle generator (`knnComponentsOracle`): keep only edges
    * where BOTH endpoints rank each other (the symmetrization that
    * kills hub-induced chaining), then connected components —
    * isolated vectors stay singleton clusters. The mutuality check is
    * a self-semi-join of the k-bounded edge list, never the corpus. */
  private def knnComponentsQuery(s: SparkSession, dir: String,
                                 numPlanes: Int): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val g = Similarity.knnGraph(emb, TopK, numPlanes, Dim, NumTables)
      .select("src_id", "dst_id")
    val mutual = g.join(
      g.select(col("dst_id").as("src_id"), col("src_id").as("dst_id")),
      Seq("src_id", "dst_id"), "left_semi")
    Dedup.connectedComponents(
      emb.select(col("vec_id").as("doc_id")),
      mutual.select(col("src_id").as("doc_a"),
        col("dst_id").as("doc_b")),
      "doc_id")
      .select(col("doc_id").as("vec_id"), col("cluster_id"),
        col("cluster_size"))
      .orderBy("vec_id")
  }

  protected val similarity: Map[String, Q] = Map(
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
    // Hybrid-retrieval combiner: reciprocal-rank fusion of the exact
    // ranking with the multi-table LSH ranking — candidates the two
    // rankers agree on out-score either ranker's tail, score-free.
    // The oracle replays both searches (same CTE bodies as their own
    // oracles, renamed apart) and the integer RRF sum.
    "sim_rrf_fusion" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.rrfFuse(Seq(
        Similarity.bruteForceTopK(emb, NumQueries, TopK),
        Similarity.lshTopK(emb, NumQueries, TopK, NumPlanes, Dim,
          NumTables)),
        TopK, RrfK, RrfScale)
        .orderBy("query_id", "rank")
    }),
    // MMR diversified re-rank over the brute-force pool: greedy
    // λ-tradeoff of relevance vs redundancy with the already-selected
    // set; the oracle unrolls all k greedy rounds as CTEs.
    "sim_mmr" -> ((s, dir) =>
      Similarity.mmrTopK(t(s, dir, "embeddings"), NumQueries, TopK,
        MmrPool, MmrLamNum, MmrLamDen)
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
    // k-means with the deterministic k-means‖ init (Bahmani et al.
    // 2012): KParRounds batched top-KParBatch oversampling scans
    // instead of k−1 sequential maxmin scans, then weighted
    // farthest-point reduction of the ≤ 1+rounds·batch candidates on
    // the driver. The oracle unrolls the 3 oversampling rounds, the
    // weighting argmin, all 15 reduce picks, AND the Lloyd's rounds.
    "sim_kmeans_par" -> ((s, dir) =>
      Similarity.kMeansPar(t(s, dir, "embeddings"), NumCentroids,
        KMeansIter, Dim, KParRounds, KParBatch)
        .orderBy("cid", "i")),
    "sim_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(t(s, dir, "embeddings"), NumQueries, TopK,
        NumPlanes, Dim, NumTables)
        .orderBy("query_id", "rank")),
    // k-NN graph over the whole corpus: every vector's k nearest
    // co-bucketed neighbors — LSH self-join on the (table, bucket)
    // key (both sides partition on the key; no broadcast, no
    // all-pairs), then the lshTopK two-phase bounded-heap ranking.
    // Bucket resolution is AUTO-SIZED from the corpus count
    // (Similarity.autoPlanes — planes ≈ log₂(N/occupancy)), so the
    // default-named query is scale-safe BY CONSTRUCTION: 5 planes at
    // the 500-vector fixture, 7 at sf0.1, 11 at the 20k-vector sf1
    // step — the resolution the round-14 measurement proved necessary.
    // The oracle derives the identical count from count(*).
    "sim_knn_graph" -> ((s, dir) =>
      Similarity.knnGraph(t(s, dir, "embeddings"), TopK,
        Similarity.AutoPlanes, Dim, NumTables)
        .orderBy("src_id", "rank")),
    // The PINNED-resolution twin (11 planes — the sizing the sf1 step
    // derives): exercises the explicit-override path and keeps a
    // fixed-constant reproduction point for the scaling tables in
    // BASELINE.md; identical code path, own oracle at the constant.
    "sim_knn_graph_scaled" -> ((s, dir) =>
      Similarity.knnGraph(t(s, dir, "embeddings"), TopK,
        NumPlanesScaled, Dim, NumTables)
        .orderBy("src_id", "rank")),
    // Mutual-kNN clustering: keep only edges where BOTH endpoints rank
    // each other (the standard symmetrization that kills hub-induced
    // chaining), then connected components — isolated vectors stay
    // singleton clusters. The mutuality check is a self-semi-join of
    // the k-bounded edge list, never the corpus. Auto-sized bucket
    // resolution, like sim_knn_graph.
    "sim_knn_components" -> ((s, dir) =>
      knnComponentsQuery(s, dir, Similarity.AutoPlanes)),
    // The components dual at SCALED bucket resolution — the sf1
    // scaling run showed sim_knn_components' exp 1.09 is the graph
    // construction (gr_components itself is 0.38); this twin applies
    // the planes ≈ log₂(N/occupancy) rule to the whole mutual-kNN
    // clustering path.
    "sim_knn_components_scaled" -> ((s, dir) =>
      knnComponentsQuery(s, dir, NumPlanesScaled)),
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
    "sim_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), NumQueries, TopK,
        NumCentroids, NumProbes)
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

  protected val quantCte =
    """v AS MATERIALIZED (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |FROM embeddings)""".stripMargin

  /** One unrolled Lloyd's assignment: every vector in `vn` to its
    * L2-nearest centroid of `cSrc` — row_number over
    * (|v|²−2·v·c+|c|², cid), the same lexicographic argmin as the Spark
    * `min(struct(dist, cid))`. */
  protected def kmeansAssignCte(cSrc: String, aName: String,
                              vnName: String = "vn"): String =
    s"""${aName}s AS (
       |  SELECT vn.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY vn.vec_id
       |      ORDER BY vn.nq - 2 * ${dotSql("vn.q", "c.cv")} + c.nc, c.cid) AS rn
       |  FROM $vnName vn CROSS JOIN
       |    (SELECT cid, cv, ${dotSql("cv", "cv")} AS nc FROM $cSrc) c),
       |$aName AS (SELECT vec_id, cid FROM ${aName}s WHERE rn = 1)""".stripMargin

  /** The chain, parameterized for REUSE PER SUBSPACE (sim_pq_trained
    * trains 8 independent sub-codebooks — one chain each, names
    * prefixed, over the slice CTE `vName`, at the subspace's `dim`).
    * `kmeansChainCtes` is exactly `kmeansChainFor("", "v", Dim,
    * NumCentroids, KMeansIter)` — the full-width instance the three
    * original consumers share. Defines `${pfx}vn` and
    * `${pfx}c0`..`${pfx}c$numIter`. */
  protected def kmeansChainFor(pfx: String, vName: String, dim: Int,
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
         |${pfx}c${it + 1} AS MATERIALIZED (SELECT cid, list(val ORDER BY i) AS cv
         |  FROM ${pfx}c${it + 1}d GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    val c0 = c0Select.getOrElse(
      s"SELECT vec_id AS cid, q AS cv FROM $vName WHERE vec_id < $k")
    // vn / every c$it are multi-referenced (vn by each round's assign,
    // c$it by the assign AND the next mean) — MATERIALIZED, or the
    // inlining re-evaluates the whole upstream chain per reference and
    // the replay goes exponential in numIter (the farthestInitCtes /
    // kcoreOracle lesson; observed as the sf1 sweep's training-replay
    // timeouts).
    s"""${pfx}vn AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM $vName),
       |${pfx}c0 AS MATERIALIZED ($c0),
       |$iters""".stripMargin
  }

  /** The unrolled k-means training chain, shared by every oracle that
    * consumes the trained codebook (sim_kmeans, sim_ivf_trained,
    * dd_semantic_dedup): expects a CTE `v(vec_id, q)` in scope, defines
    * `vn` (with norms) and `c0`..`c$KMeansIter`, generated from the
    * same constants as the Spark loop — per-dim BIGINT sums, truncating
    * `//` means (DuckDB `//` and Spark `div` both truncate toward zero
    * on all signs), empty clusters keeping the previous centroid via
    * the per-dim LEFT JOIN COALESCE. */
  protected lazy val kmeansChainCtes: String =
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

  /** Deterministic k-means‖ init replay (mirrors
    * [[Similarity.kMeansInitParallel]] phase for phase): oversampling
    * rounds `kpc0 → kpc$rounds` (each a min-distance scan + top-`batch`
    * pick by (d DESC, vec_id)), the weighting argmin (`kpwt`), and the
    * k-step weighted farthest-point reduce chain ending in
    * `kpr${k-1}(rid, pid, q)` — rid = reduce pick order, the cid
    * convention. MATERIALIZED on every multi-referenced CTE (the
    * farthestInitCtes exponential-inlining lesson). */
  private def parallelInitCtes(k: Int, rounds: Int, batch: Int): String = {
    def dist(a: String, b: String): String =
      s"${dotSql(s"$a.q", s"$a.q")} - 2 * ${dotSql(s"$a.q", s"$b.q")} + ${dotSql(s"$b.q", s"$b.q")}"
    val sample = (1 to rounds).map { r =>
      val prior = 1 + (r - 1) * batch
      s"""kpd$r AS MATERIALIZED (SELECT v2.vec_id, v2.q,
         |    min(${dist("v2", "p")}) AS d
         |  FROM v v2 CROSS JOIN kpc${r - 1} p
         |  WHERE v2.vec_id NOT IN (SELECT vec_id FROM kpc${r - 1})
         |  GROUP BY v2.vec_id, v2.q),
         |kpp$r AS (SELECT CAST($prior + rn - 1 AS BIGINT) AS pid, vec_id, q FROM (
         |  SELECT vec_id, q, row_number() OVER (ORDER BY d DESC, vec_id) AS rn FROM kpd$r)
         |  WHERE rn <= $batch),
         |kpc$r AS MATERIALIZED (SELECT * FROM kpc${r - 1} UNION ALL SELECT * FROM kpp$r)""".stripMargin
    }.mkString(",\n")
    val reduce = (1 until k).map { j =>
      s"""kprd$j AS MATERIALIZED (SELECT c.pid, c.q, c.w,
         |    min(${dist("c", "p")}) AS d
         |  FROM kpcw c CROSS JOIN kpr${j - 1} p
         |  WHERE c.pid NOT IN (SELECT pid FROM kpr${j - 1})
         |  GROUP BY c.pid, c.q, c.w),
         |kprp$j AS (SELECT CAST($j AS BIGINT) AS rid, pid, q FROM (
         |  SELECT pid, q, row_number() OVER (ORDER BY w * d DESC, pid) AS rn FROM kprd$j)
         |  WHERE rn = 1),
         |kpr$j AS MATERIALIZED (SELECT * FROM kpr${j - 1} UNION ALL SELECT * FROM kprp$j)""".stripMargin
    }.mkString(",\n")
    s"""kpc0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS pid, vec_id, q FROM v
       |  WHERE vec_id = (SELECT min(vec_id) FROM v)),
       |$sample,
       |kpwa AS (SELECT vv.vec_id, c.pid,
       |    row_number() OVER (PARTITION BY vv.vec_id
       |      ORDER BY ${dist("vv", "c")}, c.pid) AS rn
       |  FROM v vv CROSS JOIN kpc$rounds c),
       |kpwt AS (SELECT pid, CAST(count(*) AS BIGINT) AS w
       |  FROM kpwa WHERE rn = 1 GROUP BY pid),
       |kpcw AS MATERIALIZED (SELECT c.pid, c.q, COALESCE(t.w, 0) AS w
       |  FROM kpc$rounds c LEFT JOIN kpwt t USING (pid)),
       |kpr0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS rid, pid, q FROM (
       |  SELECT pid, q, row_number() OVER (ORDER BY w DESC, pid) AS rn FROM kpcw)
       |  WHERE rn = 1),
       |$reduce""".stripMargin
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
    s"""n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
       |c AS MATERIALIZED ($centSelect),
       |sc AS MATERIALIZED (
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



  /** Unrolled replay of [[Similarity.mmrTopK]]'s greedy loop: the
    * brute-force pool (rel desc, cand_id tiebreak — the TopKByDot
    * convention), then one (anti-join → max-sim → argmax-pick → union)
    * CTE block per selection round. MATERIALIZED throughout: each
    * round's selected set is referenced three times, so plain CTEs
    * would re-expand the whole prior chain per reference. */
  /** The MMR greedy rounds + final select, defined over a pool CTE
    * `cd(query_id, cand_id, rel)` and the quantized vectors `v` — the
    * pool-agnostic tail, so any scorer's CTE chain (brute-force here,
    * the IVFADC replay in [[RegistryIndex]]) composes in front of it,
    * mirroring [[graft.operators.Similarity.mmrFromPool]]'s contract. */
  protected def mmrTailSql(k: Int, lamNum: Long, lamDen: Long): String = {
    val negW = lamDen - lamNum
    val rounds = (2 to k).map { r =>
      val p = r - 1
      s"""mm$r AS MATERIALIZED (
         |  SELECT c.query_id, c.cand_id, max(c.rel) AS rel,
         |    max(${dotSql("cv.q", "sv.q")}) AS maxsim
         |  FROM cd c
         |  JOIN s$p s ON c.query_id = s.query_id
         |  JOIN v cv ON cv.vec_id = c.cand_id
         |  JOIN v sv ON sv.vec_id = s.cand_id
         |  WHERE NOT EXISTS (SELECT 1 FROM s$p x
         |    WHERE x.query_id = c.query_id AND x.cand_id = c.cand_id)
         |  GROUP BY c.query_id, c.cand_id),
         |p$r AS (SELECT query_id, CAST($r AS BIGINT) AS rank, cand_id,
         |    rel, maxsim, $lamNum * rel - $negW * maxsim AS score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $lamNum * rel - $negW * maxsim DESC, cand_id) AS rn
         |    FROM mm$r) WHERE rn = 1),
         |s$r AS MATERIALIZED (
         |  SELECT * FROM s$p UNION ALL SELECT * FROM p$r)""".stripMargin
    }.mkString(",\n")
    s"""s1 AS MATERIALIZED (SELECT query_id, CAST(1 AS BIGINT) AS rank,
       |    cand_id, rel, CAST(0 AS BIGINT) AS maxsim,
       |    $lamNum * rel AS score
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, cand_id) AS rn FROM cd)
       |  WHERE rn = 1),
       |$rounds
       |SELECT query_id, rank, cand_id, rel, maxsim,
       |  CAST(score AS BIGINT) AS score
       |FROM s$k ORDER BY query_id, rank""".stripMargin
  }

  private def mmrOracle(k: Int, pool: Int, lamNum: Long,
                        lamDen: Long): String =
    s"""WITH $quantCte,
       |sc AS MATERIALIZED (SELECT q.vec_id AS query_id,
       |    c.vec_id AS cand_id, ${dotSql("q.q", "c.q")} AS rel
       |  FROM v q JOIN v c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries),
       |cd AS MATERIALIZED (SELECT query_id, cand_id, rel
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, cand_id) AS rn FROM sc)
       |  WHERE rn <= $pool),
       |${mmrTailSql(k, lamNum, lamDen)}""".stripMargin

  /** The [[Similarity.autoPlanes]] sizing rule as a DuckDB CTE — the
    * smallest p in [MinAutoPlanes, MaxAutoPlanes] with
    * `targetOccupancy · 2^p >= count(*)`, exact integer arithmetic, so
    * the oracle derives the IDENTICAL plane count the Spark side
    * computes from its `count()` at every scale factor. */
  private def autoPlanesCte: String =
    s"""pl AS (SELECT COALESCE(MIN(g.p), ${Similarity.MaxAutoPlanes}) AS p
       |  FROM generate_series(${Similarity.MinAutoPlanes}, ${Similarity.MaxAutoPlanes}) g(p)
       |  WHERE ${Similarity.AutoTargetOccupancy} * (CAST(1 AS BIGINT) << g.p)
       |    >= (SELECT count(*) FROM v))""".stripMargin

  /** Per-table bucket-key SQL: at a PINNED resolution the
    * `numPlanes`-bit sign string; in AUTO mode the full
    * MaxAutoPlanes-bit string truncated to the derived count (plane j
    * is seed-independent of the total, so the prefix IS the j-plane
    * bucket — the same bits the fused Spark kernel emits). */
  private def bucketSqlByTable(numPlanes: Int,
                               auto: Boolean): IndexedSeq[String] = {
    val n = if (auto) Similarity.MaxAutoPlanes else numPlanes
    (0 until NumTables).map { t =>
      val bits = Similarity.planes(n, Dim, t).map(p =>
        s"(CASE WHEN ${planeDotSql("q", p)} >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      if (auto) s"substr($bits, 1, (SELECT p FROM pl))" else bits
    }
  }

  /** kNN-graph oracle generator, parameterized by bucket resolution so
    * the auto-sized default and the pinned (11-plane) registry twin
    * replay the identical construction at their own resolution. */
  private def knnGraphOracle(numPlanes: Int,
                             auto: Boolean = false): String = {
    val bucketsByTable = bucketSqlByTable(numPlanes, auto)
    val bk = bucketsByTable.zipWithIndex.map { case (b, t) =>
      s"SELECT vec_id, $t AS tbl, $b AS bucket FROM n"
    }.mkString("\nUNION ALL ")
    val plCte = if (auto) s"$autoPlanesCte,\n" else ""
    s"""WITH $quantCte,
       |n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
       |${plCte}bk AS MATERIALIZED (
       |$bk),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  WHERE a.vec_id <> b.vec_id),
       |sc AS (
       |  SELECT src_id, dst_id,
       |    ${dotSql("sn.q", "dn.q")} AS dot, sn.nq AS nqs, dn.nq AS nqd
       |  FROM cand
       |  JOIN n sn ON sn.vec_id = cand.src_id
       |  JOIN n dn ON dn.vec_id = cand.dst_id),
       |r AS (
       |  SELECT src_id, dst_id, dot,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(nqs AS DOUBLE)) * sqrt(CAST(nqd AS DOUBLE))) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY src_id ORDER BY dot DESC, dst_id) AS BIGINT) AS "rank"
       |  FROM sc)
       |SELECT src_id, dst_id, dot, cosine, "rank"
       |FROM r WHERE "rank" <= $TopK ORDER BY src_id, "rank"""".stripMargin
  }

  /** Rounds of staged label propagation in [[knnComponentsOracle]].
    * Hook + shortcut per round converges in O(log |C|) (Shiloach–
    * Vishkin); 2·log2 of sf1's 19,790-node giant component ≈ 29, and a
    * NON-converged label cannot pass silently — the compare is exact,
    * so too few rounds is a loud hash mismatch, never a wrong green. */
  private val LpRounds = 36

  /** Mutual-kNN components oracle generator, parameterized by
    * bucket resolution like [[knnGraphOracle]].
    *
    * The component closure is NOT a monolithic recursive CTE: sf1's
    * mutual graph has one 19,790-node component, so the transitive
    * closure `reach` is ~|C|² ≈ 392M pairs re-deduplicated every
    * recursion round — >600 s in DuckDB at sf1 even with the candidate
    * chain MATERIALIZED. Instead the oracle replays [[LpRounds]] staged
    * pointer-jumping label-propagation rounds,
    * l_{t+1}(n) = min(l_t(n), min_{nb∈N(n)} l_t(nb), l_t(l_t(n))),
    * each a pair of joins over the 20k-row label table (MATERIALIZED so
    * no round re-evaluates its predecessors). At any fixed point
    * l(n) ≤ l(nb) for every neighbor, hence by symmetry equal across
    * each component — i.e. the component minimum, exactly the
    * reach-based `least(src, min(dst))` label this replaces. */
  private def knnComponentsOracle(numPlanes: Int,
                                  auto: Boolean = false): String = {
      val bucketsByTable = bucketSqlByTable(numPlanes, auto)
      val bk = bucketsByTable.zipWithIndex.map { case (b, t) =>
        s"SELECT vec_id, $t AS tbl, $b AS bucket FROM n"
      }.mkString("\nUNION ALL ")
      val plCte = if (auto) s"$autoPlanesCte,\n" else ""
      val rounds = (1 to LpRounds).map { t =>
        val p = s"l${t - 1}"
        s"""l$t AS MATERIALIZED (
           |  SELECT cur.node,
           |    least(cur.cid, par.cid, coalesce(nbm.x, cur.cid)) AS cid
           |  FROM $p cur
           |  JOIN $p par ON par.node = cur.cid
           |  LEFT JOIN (SELECT m.src, min(p2.cid) AS x
           |             FROM m JOIN $p p2 ON p2.node = m.dst
           |             GROUP BY m.src) nbm ON nbm.src = cur.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $quantCte,
         |n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |${plCte}bk AS MATERIALIZED (
         |$bk),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS dst_id
         |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |  WHERE a.vec_id <> b.vec_id),
         |sc AS (
         |  SELECT src_id, dst_id, ${dotSql("sn.q", "dn.q")} AS dot
         |  FROM cand
         |  JOIN n sn ON sn.vec_id = cand.src_id
         |  JOIN n dn ON dn.vec_id = cand.dst_id),
         |r AS (
         |  SELECT src_id, dst_id,
         |    CAST(row_number() OVER (PARTITION BY src_id
         |      ORDER BY dot DESC, dst_id) AS BIGINT) AS "rank"
         |  FROM sc),
         |g AS MATERIALIZED (SELECT src_id, dst_id FROM r WHERE "rank" <= $TopK),
         |m AS MATERIALIZED (SELECT a.src_id AS src, a.dst_id AS dst FROM g a
         |  JOIN g b ON a.src_id = b.dst_id AND a.dst_id = b.src_id),
         |l0 AS MATERIALIZED (
         |  SELECT v.vec_id AS node,
         |    least(v.vec_id, coalesce(nb0.mn, v.vec_id)) AS cid
         |  FROM v LEFT JOIN (SELECT src, min(dst) AS mn FROM m
         |                    GROUP BY src) nb0 ON v.vec_id = nb0.src),
         |$rounds,
         |sz AS (SELECT cid AS cluster_id, CAST(count(*) AS BIGINT)
         |    AS cluster_size
         |  FROM l$LpRounds GROUP BY cid)
         |SELECT node AS vec_id, cid AS cluster_id, cluster_size
         |FROM l$LpRounds JOIN sz ON cid = cluster_id
         |ORDER BY vec_id""".stripMargin
    }

  protected val similarityOracles: Map[String, String] = Map(
    "sim_mmr" -> mmrOracle(TopK, MmrPool, MmrLamNum, MmrLamDen),
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
    // kmeansOracle with the init swapped for the k-means‖ replay chain.
    "sim_kmeans_par" ->
      s"""WITH $quantCte,
         |${parallelInitCtes(NumCentroids, KParRounds, KParBatch)},
         |${kmeansChainFor("", "v", Dim, NumCentroids, KMeansIter,
        Some(s"SELECT rid AS cid, q AS cv FROM kpr${NumCentroids - 1}"))},
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
    // RRF fusion: both searches replayed (brute CTEs b*, LSH CTEs l* —
    // same bodies as their own oracles, renamed apart), then the
    // integer reciprocal sum and the fused re-rank.
    "sim_rrf_fusion" -> {
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
         |br AS (
         |  SELECT query_id, cand_id,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM bsc),
         |bk AS (
         |$bk),
         |lcand AS (
         |  SELECT DISTINCT qq.vec_id AS query_id, c.vec_id AS cand_id
         |  FROM bk c JOIN bk qq ON c.tbl = qq.tbl AND c.bucket = qq.bucket
         |  WHERE qq.vec_id < $NumQueries AND c.vec_id <> qq.vec_id),
         |lsc AS (
         |  SELECT query_id, cand_id, ${dotSql("qn.q", "cn.q")} AS dot
         |  FROM lcand
         |  JOIN n qn ON qn.vec_id = lcand.query_id
         |  JOIN n cn ON cn.vec_id = lcand.cand_id),
         |lr AS (
         |  SELECT query_id, cand_id,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM lsc),
         |u AS (
         |  SELECT query_id, cand_id, "rank" FROM br WHERE "rank" <= $TopK
         |  UNION ALL
         |  SELECT query_id, cand_id, "rank" FROM lr WHERE "rank" <= $TopK),
         |f AS (
         |  SELECT query_id, cand_id,
         |    CAST(sum($RrfScale // ($RrfK + "rank")) AS BIGINT) AS rrf_score,
         |    CAST(count(*) AS BIGINT) AS n_lists,
         |    min("rank") AS best_rank
         |  FROM u GROUP BY query_id, cand_id),
         |fr AS (
         |  SELECT query_id, cand_id, rrf_score, n_lists, best_rank,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, cand_id) AS BIGINT) AS "rank"
         |  FROM f)
         |SELECT query_id, cand_id, rrf_score, n_lists, best_rank, "rank"
         |FROM fr WHERE "rank" <= $TopK ORDER BY query_id, "rank"""".stripMargin
    },
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
    // k-NN graph: the sim_lsh_topk construction with EVERY vector as a
    // query — candidate pairs from the multi-table bucket self-join,
    // DISTINCT-collapsed, exact-scored, ranked per source node.
    "sim_knn_graph" -> knnGraphOracle(0, auto = true),
    // The BUCKET-RESOLUTION-SCALED twin (see the query's comment).
    "sim_knn_graph_scaled" -> knnGraphOracle(NumPlanesScaled),
    // Mutual-kNN components: the knn CTE chain, both-directions edge
    // filter, transitive min-reachability (the gr_components oracle
    // shape), singletons via the LEFT JOIN coalesce.
    "sim_knn_components" -> knnComponentsOracle(0, auto = true),
    // The scaled-resolution components twin (see the query comment).
    "sim_knn_components_scaled" -> knnComponentsOracle(NumPlanesScaled),
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

}
