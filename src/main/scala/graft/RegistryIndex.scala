package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Compressed/persisted vector-index family of the extension registry
  * (split out of [[RegistrySimilarity]] once the family outgrew it):
  * PQ/ADC and trained-PQ scoring, SQ8 scalar quantization, IVFADC
  * raw/trained/residual and exact re-ranking refine, the persisted
  * index lifecycle (build / append / serve / streaming ingest), and
  * the IVFADC recall eval. Shares the k-means chains, quantization CTE,
  * and constants with its parent trait — one definition site for the
  * model math both families replay. */
private[graft] trait RegistryIndex extends RegistrySimilarity {

  // refine: approximate top-25 from codes, exact re-scoring to top-5
  private val Rerank = 25

  protected val index: Map[String, Q] = Map(
    // The same eval harness over the COMPRESSED flagship index: how
    // much recall does IVF pruning × PQ code-only scoring give up vs
    // exact search — the accuracy half of the compression trade, as
    // oracle-checked data.
    // NOTE (r22): materializing the two top-k sides (localCheckpoint)
    // before grading — the r21 "kill per-stage AQE re-plans" recipe —
    // was built and MEASURED: 2.04 → 2.92 s (min of two stash-A/B
    // bench runs); the two extra checkpoint jobs cost more than the
    // 442-line combined plan's re-optimization saves here. Reverted;
    // numbers in OPTIMIZATION_r22.md.
    "sim_recall_eval_ivfadc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, NumQueries, TopK),
        Similarity.ivfadcTopK(emb, NumQueries, TopK, NumCentroids,
          NumProbes),
        TopK).orderBy("query_id")
    }),
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
    // MMR composed over the IVFADC pool — the deployed-scale pairing
    // the mmrFromPool contract promises: the pool is the ADC search's
    // top-MmrPool (rel = adot, the code-only score), the greedy
    // diversification computes only the redundancy term from real
    // vectors. The oracle chains the full IVFADC replay into the
    // pool-agnostic MMR tail (one `cd` CTE is the seam on both sides).
    "sim_mmr_ivfadc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.mmrFromPool(emb,
        Similarity.ivfadcTopK(emb, NumQueries, MmrPool, NumCentroids,
          NumProbes)
          .select(col("query_id"), col("cand_id"),
            col("adot").as("rel")),
        TopK, MmrLamNum, MmrLamDen)
        .orderBy("query_id", "rank")
    })
  )

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
    s"""sc AS MATERIALIZED (
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
       |n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
       |c AS MATERIALIZED (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
       |  WHERE vec_id < $NumCentroids),
       |bn AS MATERIALIZED (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
       |    ${dotSql(s"(q[$sub*s+1 : $sub*s+$sub])", s"(q[$sub*s+1 : $sub*s+$sub])")} AS nc
       |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)
       |  WHERE vec_id < 16),
       |${ivfadcOracleTail(sub)}""".stripMargin
  }

  protected val indexOracles: Map[String, String] = Map(
    // Recall/MRR of IVFADC vs brute force: the full probe+ADC replay
    // (shared CTE builders) feeds the same overlap/ppm tail.
    "sim_recall_eval_ivfadc" -> {
      val sub = 8
      s"""WITH $quantCte,
         |n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |c AS MATERIALIZED (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
         |  WHERE vec_id < $NumCentroids),
         |bn AS MATERIALIZED (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
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
         |bn AS MATERIALIZED (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
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
        s"""v$s AS MATERIALIZED (SELECT vec_id, q[$sub*$s+1 : $sub*$s+$sub] AS q FROM v),
           |${kmeansChainFor(s"p$s", s"v$s", sub, 16, KMeansIter)}""".stripMargin
      }.mkString(",\n")
      val bnUnion = (0 until sub).map { s =>
        s"SELECT $s AS s, cid AS code, cv, ${dotSql("cv", "cv")} AS nc FROM p${s}c$KMeansIter"
      }.mkString("\n  UNION ALL ")
      s"""WITH $quantCte,
         |$chains,
         |bn AS MATERIALIZED (
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
    // IVFADC replay chained into the pool-agnostic MMR tail: the `cd`
    // seam carries (query_id, cand_id, rel = adot) exactly like the
    // Spark-side mmrFromPool call over ivfadcTopK's output.
    "sim_mmr_ivfadc" -> {
      val sub = 8
      s"""WITH $quantCte,
         |n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |c AS MATERIALIZED (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
         |  WHERE vec_id < $NumCentroids),
         |bn AS MATERIALIZED (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
         |    ${dotSql(s"(q[$sub*s+1 : $sub*s+$sub])",
        s"(q[$sub*s+1 : $sub*s+$sub])")} AS nc
         |  FROM v CROSS JOIN generate_series(0, ${sub - 1}) g(s)
         |  WHERE vec_id < 16),
         |${ivfadcOracleCtes(sub)},
         |cd AS MATERIALIZED (SELECT query_id, cand_id, adot AS rel
         |  FROM r WHERE "rank" <= $MmrPool),
         |${mmrTailSql(TopK, MmrLamNum, MmrLamDen)}""".stripMargin
    },
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
         |n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |c AS MATERIALIZED (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
         |  WHERE vec_id < $NumCentroids),
         |bn AS MATERIALIZED (SELECT s, vec_id AS code, q[$sub*s+1 : $sub*s+$sub] AS cv,
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
         |n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
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
         |n AS MATERIALIZED (SELECT vec_id, q, ${dotSql("q", "q")} AS nq FROM v),
         |c AS MATERIALIZED (SELECT vec_id AS cid, q AS cv, nq AS nc FROM n
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
        s"""v$s AS MATERIALIZED (SELECT vec_id, q[$sub*$s+1 : $sub*$s+$sub] AS q FROM v),
           |${kmeansChainFor(s"p$s", s"v$s", sub, 16, KMeansIter)}""".stripMargin
      }.mkString(",\n")
      val bnUnion = (0 until sub).map { s =>
        s"SELECT $s AS s, cid AS code, cv, ${dotSql("cv", "cv")} AS nc FROM p${s}c$KMeansIter"
      }.mkString("\n  UNION ALL ")
      s"""WITH $quantCte,
         |$kmeansChainCtes,
         |$chains,
         |n AS MATERIALIZED (SELECT vec_id, q, nq FROM vn),
         |c AS MATERIALIZED (SELECT cid, cv, ${dotSql("cv", "cv")} AS nc FROM c$KMeansIter),
         |bn AS MATERIALIZED (
         |  $bnUnion),
         |${ivfadcOracleTail(sub)}""".stripMargin
    }
  )
}
