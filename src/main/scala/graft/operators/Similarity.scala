package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`) —
  * brute-force top-k as the exactness baseline and a random-hyperplane
  * LSH bucketed variant as the scale path (SURVEY.md §7.2 M5).
  *
  * Determinism: embeddings are quantized to integers
  * (`floor(double(x) * 1000)`) before any arithmetic, so every dot
  * product is exact BIGINT math — identical in Spark, DuckDB, and across
  * partitionings (float summation order never matters). Cosine values are
  * then derived from those integers with a fixed expression shape, so
  * they are bit-identical too.
  *
  * Scale design:
  *  - the query set is small and explicitly `broadcast`; the candidate
  *    (big) side is never shuffled for the brute-force pass — the plan is
  *    scan → broadcast-nested-loop → per-partition top-k window;
  *  - the LSH variant buckets both sides by hyperplane-sign keys and
  *    joins on the bucket — a hash join on a short string key, which at
  *    100 TB replaces the O(n·q) scan with O(bucket) work per query;
  *  - hyperplanes are pseudo-random but deterministic (md5-derived ±1),
  *    so plans replay identically on every run / engine.
  */
object Similarity {

  /** Quantize an array<float> to array<bigint>: floor(double(x)*scale).
    * float→double is exact, double math is IEEE-identical everywhere. */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => floor(x.cast(DoubleType) * scale).cast(LongType))

  /** Sentinel `numPlanes` value selecting AUTO bucket resolution —
    * the scale-safe default for [[knnGraph]]/[[lshTopK]]. */
  val AutoPlanes: Int = 0
  /** Auto-sizing bounds/target: the derived plane count lives in
    * [MinAutoPlanes, MaxAutoPlanes] and aims for ≈ AutoTargetOccupancy
    * vectors per bucket per table. */
  val MinAutoPlanes: Int = 4
  val MaxAutoPlanes: Int = 16
  val AutoTargetOccupancy: Long = 16L

  /** AUTO bucket resolution from the corpus count — the sizing rule the
    * round-14 10×-step measurement derived (BASELINE.md): pair work in
    * an LSH bucket self-join is Σ occupancy² ≈ N·(N/2^planes) per
    * table, QUADRATIC in N at any fixed plane count. The smallest
    * planes p with `targetOccupancy · 2^p >= n` keeps per-bucket
    * occupancy (and so per-vector pair work) CONSTANT as the corpus
    * grows — work returns to ∝ N. Pure integer arithmetic so the
    * DuckDB oracle computes the identical value from `count(*)`
    * (no float log2 boundary cases). Capped at [[MaxAutoPlanes]]
    * (16 planes serves `targetOccupancy · 2^16 ≈ 1M` vectors; beyond
    * that raise the cap — bucket strings just get longer). */
  def autoPlanes(n: Long,
                 targetOccupancy: Long = AutoTargetOccupancy): Int = {
    var p = MinAutoPlanes
    while (p < MaxAutoPlanes && (targetOccupancy << p) < n) p += 1
    p
  }

  /** Resolve a caller `numPlanes`: [[AutoPlanes]] derives the count
    * from one cheap `count()` over the corpus (parquet metadata count —
    * no data scan), anything positive is a pinned override (spec
    * reproducibility, oracle twins at a fixed resolution). */
  private def resolvePlanes(emb: DataFrame, numPlanes: Int): Int =
    if (numPlanes == AutoPlanes) autoPlanes(emb.count()) else numPlanes

  /** Exact BIGINT dot — fused native kernel ([[graft.functions
    * .DotProduct]]); the HOF formulation below is its spec-pinned
    * reference. One dot per candidate pair is the hot loop of every
    * scorer here. */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotQ(a, b)

  /** The original HOF formulation (spec reference for the fused
    * expression — `aggregate` allocates a lambda frame per element). */
  def dotQHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Deterministic ±1 hyperplanes: plane j component i is +1 iff the
    * first hex digit of md5("j:i") is < 8 (seed 0; seeded tables prefix
    * the key with "seed:" so every LSH table draws independent planes).
    * Same construction is expressible in SQL for the oracle; the oracle
    * builders embed these as literals, so only Scala computes md5. */
  def planes(numPlanes: Int, dim: Int,
             seed: Int = 0): IndexedSeq[IndexedSeq[Long]] = {
    val mdHex = (s: String) => {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val key = (j: Int, i: Int) => if (seed == 0) s"$j:$i" else s"$seed:$j:$i"
    IndexedSeq.tabulate(numPlanes)(j =>
      IndexedSeq.tabulate(dim)(i =>
        if (mdHex(key(j, i)).head <= '7') 1L else -1L))
  }

  /** LSH bucket key: the sign bits of the quantized vector against each
    * hyperplane, concatenated into a bit-string. */
  def lshBucket(qvec: Column, planes: IndexedSeq[IndexedSeq[Long]]): Column =
    concat(planes.map(p =>
      when(dotQ(qvec, typedLit(p)) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Brute-force top-k by quantized dot product (cosine carried along),
    * for queries `vec_id < numQueries` against all other vectors.
    * The query side is broadcast; ranking is TWO-PHASE exact top-k via
    * [[graft.functions.TopKByDot]]: each map task reduces its slice of
    * scored rows to a ≤ k-entry heap per query (partial
    * ObjectHashAggregate), then only those bounded buffers shuffle on
    * `query_id` and merge. A `row_number` window here would instead
    * shuffle ALL n·q scored rows into q reducer partitions — the
    * exactness baseline must not die at scale either. Tiebreak is
    * identical (dot desc, cand_id asc; rank = 1-based position). */
  def bruteForceTopK(emb: DataFrame, numQueries: Long, k: Int): DataFrame = {
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
    val queries = q.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"), col("nq").as("nqq"))
    val cands = q.select(col("vec_id").as("cand_id"), col("q").as("cv"),
      col("nq").as("nqc"))
    val scored = cands.crossJoin(broadcast(queries))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("dot", dotQ(col("qv"), col("cv")))
      .withColumn("cosine", col("dot").cast(DoubleType) /
        (sqrt(col("nqq").cast(DoubleType)) * sqrt(col("nqc").cast(DoubleType))))
    scored
      .groupBy("query_id")
      .agg(graft.functions.TopKByDot.topK(k)(
        col("dot"), col("cand_id"), col("cosine")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cand_id").as("cand_id"),
        col("c.dot").as("dot"), col("c.cosine").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** k-NN GRAPH construction over the whole embedding corpus — every
    * vector's k nearest LSH-co-bucketed neighbors, the input relation
    * for graph-based corpus analysis (NN-descent seeding, mutual-kNN
    * clustering, graph-connectivity dedup audits, kNN-classification
    * smoke tests).
    *
    * Same multi-table sign-LSH candidate generation as [[lshTopK]],
    * but with EVERY vector as a query: candidates are pairs sharing a
    * bucket in ANY of the `numTables` tables, found by a SELF-JOIN on
    * the (table, bucket) key — a shuffle join both of whose sides
    * partition on the bucket key, never a broadcast (the "query side"
    * here is the corpus itself) and never all-pairs. Scoring and
    * ranking follow the [[lshTopK]] two-phase shape: per-(src, table,
    * bucket) bounded heaps (partial ObjectHashAggregate before any
    * exchange), cross-table dedup over ≤ numTables·k rows per node,
    * final ≤ k-row heap per node. Tiebreak (dot desc, dst_id asc) and
    * the emitted (dot, cosine, rank) match [[bruteForceTopK]], so
    * recall against the exact graph is measurable with [[recallAtK]].
    *
    * A node co-bucketed with fewer than k others just emits fewer
    * edges — the honest LSH contract; raise `numTables` for denser
    * guarantees. Deterministic (md5-derived planes), so the DuckDB
    * oracle replays the whole construction.
    *
    * SIZING RULE (measured — BASELINE.md round 14): pair work in the
    * bucket self-join is Σ occupancy² ≈ N·(N/2^numPlanes) per table —
    * QUADRATIC in N at fixed `numPlanes` (exp 1.35 across a 10× step
    * at the fixture-tuned 4 planes). Size numPlanes ≈
    * log₂(N / targetOccupancy) so occupancy stays constant and work
    * returns to ∝ N (the 11-plane form measured exp 0.52 and 24×
    * faster at the 20k-vector step). Fewer co-bucketed partners per
    * node is the recall trade that rule makes — compensate with
    * `numTables`, never with occupancy.
    *
    * The DEFAULT `numPlanes` is [[AutoPlanes]]: the resolution is
    * derived from the corpus count by [[autoPlanes]], so a caller with
    * defaults gets the scale-safe sizing automatically — the rule is
    * enforced in code, not by documentation. Pass a positive
    * `numPlanes` to pin a resolution (spec reproducibility). */
  def knnGraph(emb: DataFrame, k: Int, numPlanes: Int = AutoPlanes,
               dim: Int = 64, numTables: Int = 1): DataFrame = {
    val planesN = resolvePlanes(emb, numPlanes)
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("nq"),
        posexplode(graft.functions.LshBuckets.lshBuckets(
          col("q"), numTables, planesN, dim)).as(Seq("tbl", "bucket")))
    val a = q.select(col("vec_id").as("src_id"), col("q").as("sv"),
      col("nq").as("nqs"), col("tbl"), col("bucket"))
    val b = q.select(col("vec_id").as("dst_id"), col("q").as("dv"),
      col("nq").as("nqd"), col("tbl"), col("bucket"))
    val scored = a.join(b, Seq("tbl", "bucket"))
      .where(col("src_id") =!= col("dst_id"))
      .withColumn("dot", dotQ(col("sv"), col("dv")))
      .withColumn("cosine", col("dot").cast(DoubleType) /
        (sqrt(col("nqs").cast(DoubleType)) *
          sqrt(col("nqd").cast(DoubleType))))
    scored
      .groupBy("src_id", "tbl", "bucket")
      .agg(graft.functions.TopKByDot.topK(k)(
        col("dot"), col("dst_id"), col("cosine")).as("tk"))
      .select(col("src_id"), explode(col("tk")).as("c"))
      .groupBy(col("src_id"), col("c.cand_id").as("dst_id"))
      .agg(min(col("c.dot")).as("dot"), min(col("c.cosine")).as("cosine"))
      .groupBy("src_id")
      .agg(graft.functions.TopKByDot.topK(k)(
        col("dot"), col("dst_id"), col("cosine")).as("topk"))
      .select(col("src_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("src_id"), col("c.cand_id").as("dst_id"),
        col("c.dot").as("dot"), col("c.cosine").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * DIVERSIFIED re-rank: from each query's `pool`-deep relevance
    * candidates, greedily select `k` results trading relevance against
    * redundancy with what's already selected —
    *
    *   pick_r = argmax_c  λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)
    *
    * the re-rank every retrieval pipeline runs when near-duplicate
    * corpus entries would otherwise fill the whole top-k (and, in
    * training-data curation, the greedy facility-location-style
    * selection of diverse exemplars from a candidate pool). λ is the
    * exact rational `lamNum/lamDen`; scores are the integer
    * `lamNum·rel − (lamDen−lamNum)·maxsim` (the λ-scaled objective ×
    * lamDen — same argmax, zero float drift), rel and sim both
    * quantized dot products. Ties break on cand_id asc, the
    * [[bruteForceTopK]] convention.
    *
    * Emits (query_id, rank, cand_id, rel, maxsim, score): rank =
    * selection order 1..k, maxsim = the redundancy term at selection
    * time (0 for rank 1). If the pool holds fewer than `k` candidates
    * a query just stops early.
    *
    * Scale shape: the expensive part is building the POOL (any scorer:
    * brute-force here, IVFADC at 10⁹ vectors — the pool contract is
    * just (query_id, cand_id, rel)). The greedy loop itself touches
    * q·pool rows per round with a ≤ r-row selected side per query —
    * both joins are query-key-bounded, the per-round argmax is a
    * row_number window over ≤ pool rows per query, and each round's
    * selected set is node-checkpointed so the k-round lineage stays
    * flat. Nothing in the loop is corpus-sized. */
  def mmrTopK(emb: DataFrame, numQueries: Long, k: Int, pool: Int,
              lamNum: Long = 7L, lamDen: Long = 10L): DataFrame = {
    require(pool >= k, s"mmrTopK: k=$k pool=$pool")
    mmrFromPool(emb,
      bruteForceTopK(emb, numQueries, pool)
        .select(col("query_id"), col("cand_id"), col("dot").as("rel")),
      k, lamNum, lamDen)
  }

  /** MMR over an EXTERNAL candidate pool — the composition form the
    * pool contract promises: `poolDf` is `(query_id, cand_id, rel)`
    * from ANY scorer ([[bruteForceTopK]] via [[mmrTopK]]; [[ivfadcTopK]]
    * at 10⁹-vector deployments, where rel is the ADC score), and only
    * the REDUNDANCY term is computed here, exact quantized dots between
    * pool vectors pulled from `emb`. The greedy loop's scale shape is
    * unchanged (query-key-bounded joins, per-round checkpoint); the
    * pool builder's cost model is the caller's choice. */
  def mmrFromPool(emb: DataFrame, poolDf: DataFrame, k: Int,
                  lamNum: Long = 7L, lamDen: Long = 10L): DataFrame = {
    require(k >= 1, s"mmrFromPool: k=$k")
    require(lamNum >= 0 && lamDen >= lamNum,
      s"mmrFromPool: λ=$lamNum/$lamDen")
    val vecs = emb.select(col("vec_id").as("cand_id"),
      quantize(col("embedding")).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), col("cand_id"))
    val negW = lamDen - lamNum
    // MAINTAINED-STATE greedy: the candidate pool carries its running
    // max-similarity-to-selected. Round r folds exactly ONE new pick's
    // similarity into `maxsim` (`greatest` — the pairwise form of the
    // earlier per-round max over ALL selected rows, exact-identical on
    // BIGINT dots) and re-ranks; the earlier formulation re-joined the
    // whole selected set and re-aggregated every round — O(pool·r)
    // dot products in round r (O(pool·k²) total vs O(pool·k) here),
    // plus an anti-join, a groupBy and a vecs re-join per round. Each
    // round is one flat checkpoint whose window/join keys match the
    // previous round's materialized partitioning (query_id), so no
    // per-round exchange. Score, tie-break (rn over (score desc,
    // cand_id)), exclusion (the picked row leaves the pool, as the
    // anti-join did) and the emitted (rel, maxsim at pick time) are
    // unchanged — identical picks in identical order.
    // `maxsim` is NULL until the first fold (greatest skips nulls, so
    // fold 1 yields the bare dot): a literal-0 start would FLOOR the
    // running max at 0 where the true max-dot-to-selected is negative
    // — the first verify run caught exactly that (sim_mmr_ivfadc row 1
    // diverged). Score and the emitted column coalesce NULL to the
    // old round-1 constants (score = λ·rel, displayed maxsim = 0).
    def roundify(st: DataFrame): DataFrame = st
      .withColumn("score", lit(lamNum) * col("rel") -
        lit(negW) * coalesce(col("maxsim"), lit(0L)))
      .withColumn("rn", row_number().over(w))
    def pickOf(st: DataFrame, r: Int): DataFrame = st
      .where(col("rn") === 1)
      .select(col("query_id"), lit(r.toLong).as("rank"), col("cand_id"),
        col("rel"), coalesce(col("maxsim"), lit(0L)).as("maxsim"),
        col("score"), col("qv"))
    // NOTE (r22): eagerly checkpointing each round's pick (one row per
    // query) so state r−1 could be released as state r materializes —
    // the r21 advisor's storage-bound suggestion — was built and
    // MEASURED: the k extra tiny checkpoint jobs cost a consistent
    // +0.8 s on sim_mmr_ivfadc (2.31 → 3.12 s, min of two stash-A/B
    // bench runs; sim_mmr 1.29 → 1.38 s), with a per-round-literal
    // variant additionally paying 27 warm janino compiles per rep.
    // Reverted: the k-state retention stays (peak storage O(k·pool), a
    // documented trade at k ≈ 10), numbers in OPTIMIZATION_r22.md.
    val states = Seq.newBuilder[DataFrame]
    var stateR = roundify(poolDf
        .select(col("query_id"), col("cand_id"), col("rel"))
        .join(vecs, Seq("cand_id"))
        .withColumn("maxsim", lit(null).cast(LongType)))
      .localCheckpoint(true)
    states += stateR
    val picks = Seq.newBuilder[DataFrame]
    picks += pickOf(stateR, 1)
    for (r <- 2 to k) {
      val pickPrev = stateR.where(col("rn") === 1)
        .select(col("query_id"), col("qv").as("sv"))
      // the picks above read their round's checkpoint lazily until the
      // final union materializes, so superseded rounds are released
      // only after it (below), not per round
      stateR = roundify(stateR.where(col("rn") > 1)
        .join(pickPrev, Seq("query_id"))
        .select(col("query_id"), col("cand_id"), col("rel"), col("qv"),
          greatest(col("maxsim"), dotQ(col("qv"), col("sv")))
            .as("maxsim")))
        .localCheckpoint(true)
      states += stateR
      picks += pickOf(stateR, r)
    }
    val sel = picks.result().reduce(_ unionByName _).localCheckpoint(true)
    // every per-round checkpoint is internal state once the union is
    // materialized; the result retains only its own checkpoint
    states.result().foreach(Ckpt.release)
    sel.drop("qv")
  }

  /** IVF (inverted-file) approximate top-k — the second ANN scale path
    * next to [[lshTopK]]: vectors are coarse-quantized to their nearest
    * of `numCentroids` deterministic centroids (the first C vectors by
    * id — a stand-in for trained k-means centroids; the *plumbing* is
    * the contract), and each query probes only its `numProbes` nearest
    * centroid lists.
    *
    * Scale shape: the C centroids broadcast to every executor; coarse
    * assignment is a broadcast nested-loop + map-side-combined argmax
    * (max over a (score, cid) struct — lexicographic, tie → larger cid,
    * identical semantics in the DuckDB oracle); the probe join shuffles
    * on the centroid id, so per-query work drops from O(n) to
    * O(probed lists). */
  def ivfTopK(emb: DataFrame, numQueries: Long, k: Int,
              numCentroids: Int = 16, numProbes: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
    val codebook = v.where(col("vec_id") < numCentroids)
      .select(col("vec_id"), col("q"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    ivfProbe(v, codebook, numQueries, k, numProbes)
  }

  /** IVF top-k over a TRAINED codebook: identical probe machinery to
    * [[ivfTopK]] but the coarse quantizer is the [[kMeansCentroids]]
    * Lloyd's-trained codebook instead of the first-C-vectors stand-in —
    * the full train-then-serve ANN path. Training cost is `numIter`
    * broadcast passes (see [[kMeans]]); serving cost is unchanged. */
  def ivfTopKTrained(emb: DataFrame, numQueries: Long, k: Int,
                     numCentroids: Int = 16, numProbes: Int = 2,
                     numIter: Int = 2, dim: Int = 64): DataFrame = {
    // one materialization serves every Lloyd's training round AND the
    // probe/serve tail (kMeansPP contract); the codebook trains over
    // the same checkpointed q column it previously re-derived from emb
    val v = Ckpt.replace(
      emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
        .withColumn("nq", dotQ(col("q"), col("q"))))
    ivfProbe(v, kMeansCodebookQ(v.select(col("vec_id"), col("q")),
        numCentroids, numIter, dim),
      numQueries, k, numProbes)
  }

  /** Per-row array of `(score, cid)` structs against a driver-side
    * codebook — the cosine twin of [[assignLit]]'s distance structs.
    * `sqrt` is `java.lang.Math.sqrt` on both the driver and in Spark's
    * SQRT, so the precomputed norm divides bit-identically.
    * LITERAL-CODEBOOK ceiling: like [[assignLit]] this inlines k·dim
    * plan literals, so it is only for codebook-sized k (≤ ~10³ — see
    * [[LiteralAssignMaxK]]); IVF probe lists are ≤ 10³ centroids in
    * production, so no large-k twin is needed here. */
  private def scoreLit(cents: Seq[(Long, Seq[Long])]): Column =
    array(cents.sortBy(_._1).map { case (cid, cv) =>
      val norm = math.sqrt(cv.map(x => x * x).sum.toDouble)
      struct(
        (dotQ(col("q"), array(cv.map(lit): _*)).cast(DoubleType) / lit(norm))
          .as("score"),
        lit(cid).as("cid"))
    }: _*)

  /** The shared IVF probe path: coarse-assign every vector to its
    * best-scoring centroid, pick each query's `numProbes` nearest
    * lists, score only within probed lists, rank with the bounded
    * two-phase top-k aggregate. `v` = (vec_id, q, nq); the codebook is
    * driver-side (k·dim scalars), so BOTH the corpus assignment and
    * the probe-list selection are narrow in-row operations on literal
    * structs — `array_max` argmax for the list a vector joins (max
    * score, tie → max cid: lexicographic struct max), sorted-slice for
    * the lists a query probes — and the corpus reaches the candidate
    * join with NO prior shuffle. */
  private def ivfProbe(v: DataFrame, codebook: Seq[(Long, Seq[Long])],
                       numQueries: Long, k: Int, numProbes: Int): DataFrame = {
    val assigned = v.withColumn("cid",
      array_max(scoreLit(codebook)).getField("cid"))
    // reverse(array_sort(...)) orders (score desc, cid desc) — the same
    // total order the former row_number window used
    val queries = v.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nq").as("nqq"),
        explode(slice(reverse(array_sort(scoreLit(codebook))),
          1, numProbes)).as("probe"))
      .select(col("query_id"), col("qv"), col("nqq"),
        col("probe.cid").as("cid"))
    val pairs = assigned.join(broadcast(queries), Seq("cid"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("dot", dotQ(col("qv"), col("q")))
      .withColumn("cosine", col("dot").cast(DoubleType) /
        (sqrt(col("nqq").cast(DoubleType)) * sqrt(col("nq").cast(DoubleType))))
    // Final rank via the bounded-heap two-phase aggregate (same as
    // bruteForceTopK): a probed IVF list is O(n·probes/centroids) rows —
    // a per-query row_number window would funnel all of them into one
    // task per query; the partial ObjectHashAggregate caps the exchange
    // at ≤k entries per map task. The candidate's centroid id rides
    // along as the aggregate's tag. Ordering identical: dot desc,
    // cand_id asc.
    pairs
      .groupBy("query_id")
      .agg(graft.functions.TopKByDotTag.topK(k)(
        col("dot"), col("vec_id"), col("cosine"), col("cid")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cand_id").as("cand_id"),
        col("c.tag").as("cid"), col("c.dot").as("dot"),
        col("c.cosine").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: every vector is keyed by
    * its hyperplane bucket; only within-bucket pairs (a < b) are scored
    * and pairs with cosine ≥ `threshold` survive. The bucket join is
    * the scale path — no O(n²) cross join; at 100 TB the shuffle is on
    * the short bucket key and pair work is O(bucket²) per bucket. */
  def embedNearDupPairs(emb: DataFrame, threshold: Double,
                        numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val ps = planes(numPlanes, dim)
    // NOTE (measured): do NOT pre-repartition on `bucket` here. With few
    // buckets the join is skew-bound, and AQE's skew-join splitting only
    // applies when the join owns its exchanges; a user repartition pins
    // the distribution and serializes the hot buckets (+40% at sf0.1).
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
      .withColumn("bucket", lshBucket(col("q"), ps))
    val a = q.select(col("vec_id").as("vec_a"), col("q").as("qa"),
      col("nq").as("na"), col("bucket"))
    val b = q.select(col("vec_id").as("vec_b"), col("q").as("qb"),
      col("nq").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("dot", dotQ(col("qa"), col("qb")))
      .withColumn("cosine", col("dot").cast(DoubleType) /
        (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
      .where(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "bucket", "dot", "cosine")
  }

  /** Narrow L2-argmin assignment against a DRIVER-SIDE codebook —
    * Lloyd's assignment step with exact BIGINT distance
    * |v|² − 2·v·c + |c|² (== Σ(v−c)²; the |v|² term is per-vector
    * constant but kept so the argmin key replays verbatim in SQL, and
    * the lexicographic (dist, cid) tie-break — tie → smaller cid — is
    * identical in DuckDB): one
    * inline struct per centroid, `array_min` takes the lexicographic
    * (dist, cid) minimum — the same argmin + tie-break as a
    * crossJoin/groupBy formulation, but as a single codegen projection
    * over the corpus: NO crossJoin row blow-up, NO groupBy(vec_id)
    * shuffle, NO join-back. `nq` is constant per row across centroids,
    * so the distance drops it: argmin(nc − 2·dot) ≡ argmin(nq − 2·dot
    * + nc). The codebook is k·dim scalars — independent of CORPUS
    * scale, but NOT of k: every scalar is a plan literal feeding
    * whole-stage codegen, and Janino's 64 KB method ceiling caps the
    * pattern around k·dim ≈ a few 10⁵ literals. [[assignCol]] is the
    * dispatcher: it uses this formulation up to [[LiteralAssignMaxK]]
    * centroids (measured faster there — the codebook constant-folds
    * into the generated method) and the reference-object expression
    * ([[graft.functions.NearestCentroidExpr]]) beyond, where the
    * codebook rides the task-binary broadcast instead of the plan. */
  private def assignLit(cents: Seq[(Long, Seq[Long])]): Column = {
    val entries = cents.sortBy(_._1).map { case (cid, cv) =>
      val nc = cv.map(x => x * x).sum
      struct(
        (lit(nc) - lit(2L) * dotQ(col("q"), array(cv.map(lit): _*))).as("d"),
        lit(cid).as("cid"))
    }
    array_min(array(entries: _*)).getField("cid")
  }

  /** Literal-codebook ceiling for [[assignCol]]: below this the inlined
    * [[assignLit]] projection wins (measured — BASELINE.md records the
    * literal path beating the join formulation at codebook-sized k);
    * above it the plan would grow toward Janino's method limits, so the
    * codebook moves out of the plan into
    * [[graft.functions.NearestCentroidExpr]]'s reference object. 1024
    * keeps the literal zone well inside the measured-win region while
    * the SemDeDup-style "k is millions" regime takes the bounded-plan
    * path automatically. */
  val LiteralAssignMaxK = 1024

  /** L2-argmin assignment dispatcher over a driver-side codebook: same
    * semantics at any k (exact BIGINT argmin of (‖c‖²−2·q·c, cid), tie
    * → smaller cid; parity pinned by SimilaritySpec), formulation
    * chosen by codebook size — see [[assignLit]] vs
    * [[graft.functions.NearestCentroidExpr]]. */
  def assignCol(cents: Seq[(Long, Seq[Long])]): Column =
    if (cents.size <= LiteralAssignMaxK) assignLit(cents)
    else graft.functions.NearestCentroid.nearest(col("q"), cents)

  /** Large-k forced variant for specs and the big-k registry query —
    * bypasses the dispatcher's literal zone so the reference-object
    * path is exercised at fixture-sized codebooks too. */
  def assignColRef(cents: Seq[(Long, Seq[Long])]): Column =
    graft.functions.NearestCentroid.nearest(col("q"), cents)

  /** HIERARCHICAL (two-level) assignment — the path past the large-k
    * COMPUTE ceiling that [[graft.functions.NearestCentroidExpr]]'s
    * scaladoc names: a flat argmin pays k·dim multiplies per row, so at
    * "k is millions" even a memory-resident codebook is compute-bound.
    * Here the CODEBOOK ITSELF is clustered into `numSupers` super-
    * centroids (one exact-integer Lloyd's round over the k codebook
    * rows — k rows, not the corpus; the model trains in milliseconds),
    * each codebook entry is binned to its nearest super, and a row
    * assigns in two bounded steps: nearest super (S distances), then
    * nearest centroid WITHIN that super's bin (k/S avg distances) —
    * S + k/S per row, minimized at S = √k. The result is the standard
    * IVF-style approximation of the flat argmin (exact whenever the
    * true nearest centroid's bin wins the super probe; with S = k and
    * singleton bins it IS the flat argmin — spec-pinned). Everything is
    * exact BIGINT with the shared tie-breaks, so the two-level rule
    * replays verbatim in the oracle, super training included.
    *
    * Returns `(vec_id, sid, cid)` — the super ids double as a
    * shard/partition key for downstream within-cluster work. */
  def assignHierarchical(emb: DataFrame, numCentroids: Int,
                         numSupers: Int, numIter: Int = 1,
                         dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val codebook = v.where(col("vec_id") < numCentroids)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    // train supers over the CODEBOOK rows (a driver-sized relation —
    // the training corpus is the model, so rounds cost k rows each)
    val cbDf = codebook.toDF("vec_id", "q")
    val supers = kMeansCodebooksQInit(cbDf, None, numSupers, numIter,
      dim).last
    // bin every codebook entry to its super — driver-side exact math,
    // the same argmin the oracle's assignment CTE replays
    def flatAssign(q: Seq[Long]): Long = supers.map { case (sid, sv) =>
      val nc = sv.map(x => x * x).sum
      val dot = q.zip(sv).map { case (a, b) => a * b }.sum
      (nc - 2 * dot, sid)
    }.min._2
    val bins: Map[Long, Seq[(Long, Seq[Long])]] =
      codebook.groupBy { case (_, q) => flatAssign(q) }
        .map { case (sid, ms) => sid -> ms }
    // rows choose among supers that actually own members (a Lloyd's
    // round can leave a super empty; an empty bin has no argmin)
    val liveSupers = supers.filter { case (s, _) => bins.contains(s) }
    // two bounded steps per row; the within-bin argmin runs through the
    // reference-object expression (bins can be arbitrarily large)
    val sid = assignColRef(liveSupers)
    val cid = bins.toSeq.sortBy(_._1).map { case (s, members) =>
      (s, graft.functions.NearestCentroid.nearest(col("q"), members))
    }.foldRight(lit(-1L): Column) { case ((s, c), acc) =>
      when(col("sid") === s, c).otherwise(acc)
    }
    v.withColumn("sid", sid).withColumn("cid", cid)
      .select("vec_id", "sid", "cid")
  }

  /** Plain codebook assignment as a first-class operator — `(vec_id,
    * cid)` for every vector, codebook = the first `numCentroids`
    * vectors (the same stand-in convention as [[ivfTopK]]). `forceRef`
    * exercises the large-k path regardless of size. At 100 TB this is
    * the SemDeDup clustering primitive: ONE narrow projection over the
    * corpus, no join, no shuffle, any k that fits executor memory. */
  def assignToCodebook(emb: DataFrame, numCentroids: Int,
                       forceRef: Boolean = false): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val cents = v.where(col("vec_id") < numCentroids)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val cid = if (forceRef) assignColRef(cents) else assignCol(cents)
    v.select(col("vec_id"), cid.as("cid"))
  }

  /** Deterministic exact-integer Lloyd's k-means over the quantized
    * vectors — the TRAINER behind [[ivfTopK]]'s coarse quantizer (whose
    * scaladoc calls its first-C-vectors centroids "a stand-in for
    * trained k-means centroids"; this is the training). Init =
    * the first `numCentroids` vectors by id (deterministic, the same
    * stand-in), then `numIter` rounds of: broadcast-assign every vector
    * to its L2-nearest centroid, recompute each centroid as the
    * per-dimension INTEGER mean (truncating `div` — Spark `div` and
    * DuckDB `//` agree on all signs) of its members; a cluster left
    * empty keeps its previous centroid. Everything is exact BIGINT, so
    * the whole training loop replays bit-for-bit in SQL (the oracle
    * unrolls the iterations as CTEs).
    *
    * [[kMeans]] explodes the result to per-dimension rows `(cid, i,
    * c_val, cluster_size)` for the oracle; [[ivfTopKTrained]] and
    * [[semanticDedup]] serve from the codebook directly.
    *
    * Scale shape: each round is ONE corpus scan — [[assignLit]]'s
    * narrow projection (no crossJoin blow-up, no groupBy(vec_id)
    * shuffle, no join-back) feeding a groupBy(cid) whose map-side
    * partials cap the exchange at ≤ k·(dim+2) counters per task.
    * Lineage stays flat because the model round-trips through the
    * driver each round — it's k·dim scalars regardless of corpus
    * size — and `numIter` is a small explicit constant (codebooks
    * train in a handful of rounds). */
  def kMeansCodebook(emb: DataFrame, numCentroids: Int = 16,
                     numIter: Int = 2, dim: Int = 64): Seq[(Long, Seq[Long])] =
    kMeansCodebookQ(
      emb.select(col("vec_id"), quantize(col("embedding")).as("q")),
      numCentroids, numIter, dim)

  /** [[kMeansCodebook]] over an ALREADY-QUANTIZED `(vec_id, q)` frame
    * of any dimension — the form [[pqModelTrained]] trains per-subspace
    * sub-codebooks through (each subspace is just a `slice` projection
    * of the corpus; the trainer neither knows nor cares). */
  def kMeansCodebookQ(vIn: DataFrame, numCentroids: Int,
                      numIter: Int, dim: Int): Seq[(Long, Seq[Long])] =
    kMeansCodebooksQ(vIn, numCentroids, numIter, dim).last

  /** Every intermediate codebook of the training run — element 0 is
    * the init (first-C), element `numIter` the final model. The
    * TRAINER QUALITY contract lives on this: [[kMeansInertia]] over
    * consecutive elements must be non-increasing (Lloyd's objective
    * law, PropertySpec-pinned), which turns "the trainer improves the
    * clustering" from scaladoc prose into a tested property. */
  def kMeansCodebooksQ(vIn: DataFrame, numCentroids: Int,
                       numIter: Int, dim: Int): Seq[Seq[(Long, Seq[Long])]] =
    kMeansCodebooksQInit(vIn, None, numCentroids, numIter, dim)

  /** [[kMeansCodebooksQ]] with an EXPLICIT initial codebook (`None` →
    * the first-C convention). [[kMeansPP]] passes the farthest-point
    * init; the Lloyd's rounds are identical either way. */
  def kMeansCodebooksQInit(vIn: DataFrame,
                           init: Option[Seq[(Long, Seq[Long])]],
                           numCentroids: Int, numIter: Int,
                           dim: Int): Seq[Seq[(Long, Seq[Long])]] = {
    val spark = vIn.sparkSession
    import spark.implicits._
    val v = vIn.select(col("vec_id"), col("q"))
    // The model is k·dim scalars — it LIVES on the driver (what
    // MLlib's KMeans does with its centers): each Lloyd's round is ONE
    // corpus scan — narrow literal-codebook assignment, then a
    // groupBy(cid) whose map-side partials cap the exchange at
    // ≤ k·(dim+2) counters per task — and every consumer (the next
    // round, IVF serving, SemDeDup clustering) inlines the codebook as
    // literals instead of replaying the training lineage per use.
    var cents: Seq[(Long, Seq[Long])] = init.getOrElse(v
      .where(col("vec_id") < numCentroids)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq)
    val history = Seq.newBuilder[Seq[(Long, Seq[Long])]]
    history += cents
    for (_ <- 0 until numIter) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col("q"), i + 1)).as(s"s$i"))
      val agg = v.withColumn("cid", assignCol(cents))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), sums: _*)
      val mean = array((0 until dim).map(i =>
        expr(s"s$i div n")): _*)
      val next = agg.select(col("cid"), mean.as("nv"))
        .as[(Long, Seq[Long])].collect().toMap
      // a cluster left empty keeps its previous centroid
      cents = cents.map { case (cid, pv) => (cid, next.getOrElse(cid, pv)) }
      history += cents
    }
    history.result()
  }

  /** The Lloyd's objective: Σ_v min_c ‖v − c‖², exact BIGINT — ONE
    * corpus scan (the same narrow argmin projection as assignment,
    * keeping `d` instead of `cid`, plus the row's ‖v‖² term the argmin
    * dropped). The trainer's quality law: non-increasing across
    * [[kMeansCodebooksQ]] rounds. Within-round-ε caveat: the truncating
    * integer mean sits within 1 per dimension of the real minimizer, so
    * the classic monotonicity argument carries an O(dim) slack in
    * principle; at quantize-scale (×1000) that slack is noise and the
    * property test asserts strict non-increase outright. */
  def kMeansInertia(vIn: DataFrame, cents: Seq[(Long, Seq[Long])]): Long = {
    val entries = cents.sortBy(_._1).map { case (cid, cv) =>
      val nc = cv.map(x => x * x).sum
      struct(
        (lit(nc) - lit(2L) * dotQ(col("q"), array(cv.map(lit): _*))).as("d"),
        lit(cid).as("cid"))
    }
    vIn.select((array_min(array(entries: _*)).getField("d") +
        dotQ(col("q"), col("q"))).as("d"))
      .agg(sum(col("d"))).head().getLong(0)
  }

  /** Deterministic FARTHEST-POINT (maxmin) init — the k-means++ family
    * member that needs no randomness, so it replays bit-for-bit in the
    * oracle: start from the smallest vec_id, then repeatedly pick the
    * vector with the MAXIMUM exact-BIGINT min-distance to the chosen
    * set (tie → smallest vec_id), excluding already-chosen ids.
    * Returned cids are the PICK ORDER (0-based), not vec_ids — the
    * centroid identity is "i-th chosen", which the SQL mirror
    * reproduces. First-C init can start all k centroids inside one
    * region of a clustered corpus and strand whole clusters; maxmin
    * provably spreads the seeds (one per cluster once k ≥ clusters) —
    * the PropertySpec law measures exactly that. Cost: k−1 passes over
    * a MAINTAINED min-distance relation — pick i folds exactly ONE new
    * centroid's distance into the running min (`least`, exact BIGINT —
    * pairwise min equals the old array_min over all chosen) and the
    * next argmax rides the SAME materialization as an `observe`
    * metric, so each pick is one flat-plan job with no exchange. The
    * earlier formulation rebuilt a k-term literal min-distance
    * projection per pick (O(k²·dim) total row work, a fresh
    * analyze/optimize/codegen of a growing plan per pick, and an AQE
    * aggregate exchange per pick — measured as 2 jobs/pick and 30
    * warm-rep codegen compiles on sim_kmeans_pp). Exclusion of
    * already-picked rows is a `taken` flag in the maintained relation
    * — same candidate set as the old isInCollection filter; the
    * argmax struct and tie-break are unchanged. k-means‖ batches
    * these scans when k is large. */
  def kMeansInitFarthest(vIn: DataFrame,
                         numCentroids: Int): Seq[(Long, Seq[Long])] = {
    val spark = vIn.sparkSession
    import spark.implicits._
    val v = vIn.select(col("vec_id"), col("q"))
    val first = v.orderBy("vec_id").limit(1)
      .as[(Long, Seq[Long])].head()
    var chosen = Vector(first)
    // nc − 2·q·c: the per-centroid term of ‖q−c‖² (the row's ‖q‖²
    // rides as the maintained `nq` column — adding the same row
    // constant before or after the min is exact-identical)
    def partialDist(cv: Seq[Long]): Column = {
      val nc = cv.map(x => x * x).sum
      lit(nc) - lit(2L) * dotQ(col("q"), typedLit(cv))
    }
    val pickAgg = max(when(!col("taken"), struct(col("d"),
      (lit(0L) - col("vec_id")).as("nid"), col("q")))).as("pick")
    // argmax via the observe metric, with the plain aggregate over the
    // materialized frame as the fallback (the hitsQ convention)
    def nextPick(obs: org.apache.spark.sql.Observation,
                 frame: DataFrame): (Long, Seq[Long]) = {
      val viaObs = Obs.poll(obs).flatMap(_.get("pick"))
      val m = viaObs match {
        case Some(r: org.apache.spark.sql.Row) => r
        case _ => frame.agg(pickAgg).head().getStruct(0)
      }
      (0L - m.getLong(1), m.getSeq[Long](2))
    }
    var cur: DataFrame = null
    while (chosen.size < numCentroids) {
      val (pid, pq) = chosen.last
      val obs = org.apache.spark.sql.Observation()
      val stepped = (if (cur == null)
        v.select(col("vec_id"), col("q"),
            dotQ(col("q"), col("q")).as("nq"))
          .select(col("vec_id"), col("q"), col("nq"),
            (partialDist(pq) + col("nq")).as("d"),
            (col("vec_id") === pid).as("taken"))
      else
        cur.select(col("vec_id"), col("q"), col("nq"),
          least(col("d"), partialDist(pq) + col("nq")).as("d"),
          (col("taken") || col("vec_id") === pid).as("taken")))
        .observe(obs, pickAgg)
      val mat =
        if (cur == null) stepped.localCheckpoint(true)
        else Ckpt.replace(stepped, cur)
      cur = mat
      chosen :+= nextPick(obs, mat)
    }
    // the maintained relation is internal state, not the result —
    // release the final round before returning driver-side centroids
    if (cur != null) Ckpt.release(cur)
    chosen.zipWithIndex.map { case ((_, q), i) => (i.toLong, q) }
  }

  /** Deterministic k-means‖ init (Bahmani et al. 2012, VLDB — "Scalable
    * k-means++"): the BATCHED replacement for [[kMeansInitFarthest]]'s
    * k−1 sequential corpus scans. Three phases:
    *
    *  1. OVERSAMPLE — `rounds` corpus scans, each picking the
    *     TOP-`batch` rows by exact-BIGINT min-distance² to the
    *     candidate set so far (d² DESC, vec_id ASC; chosen ids
    *     excluded). This is the deterministic analog of Bahmani's
    *     probabilistic `l·d²/φ` draw: the same "grab a spread batch
    *     per pass" mechanics with the draw replaced by a top-`batch`
    *     selection, so the whole init replays bit-for-bit in the
    *     oracle (zero randomness — the repo-wide convention). Corpus
    *     scans: `rounds` (constant), vs k−1 for maxmin — the scale-up
    *     the farthest-point scaladoc promised.
    *  2. WEIGH — one corpus scan assigns every vector to its nearest
    *     candidate ([[assignCol]]'s argmin with the (dist, pid)
    *     tie-break); candidate weight = owned-vector count (0 kept).
    *  3. REDUCE — weighted farthest-point over the CANDIDATES ONLY
    *     (≤ 1 + rounds·batch rows — k-scale, driver-side, no corpus
    *     scan): seed = max weight (tie → smaller pid), then repeatedly
    *     the candidate maximizing weight·min-dist²-to-chosen (tie →
    *     smaller pid) — Bahmani's "recluster the weighted candidates"
    *     step with the deterministic greedy in place of weighted
    *     k-means++.
    *
    * Per-round selection is `orderBy(d desc, vec_id).limit(batch)` —
    * Spark plans TakeOrderedAndProject (per-partition bounded heaps →
    * driver merge of `batch`-sized tops), so a round moves
    * O(partitions·batch) rows, never the corpus. Weight products fit
    * comfortably in BIGINT: d² ≤ dim·(2·scale)² ≈ 2.6e8 at the
    * quantize scale, × corpus counts up to ~3e10 stays < 2^63.
    *
    * Returned cids are the REDUCE pick order (0-based), matching the
    * [[kMeansInitFarthest]] convention that cid = "i-th chosen". */
  def kMeansInitParallel(vIn: DataFrame, numCentroids: Int,
                         rounds: Int, batch: Int): Seq[(Long, Seq[Long])] = {
    require(1 + rounds * batch >= numCentroids,
      s"oversampling 1+$rounds*$batch must reach k=$numCentroids")
    val spark = vIn.sparkSession
    import spark.implicits._
    val v = vIn.select(col("vec_id"), col("q"))
    val first = v.orderBy("vec_id").limit(1)
      .as[(Long, Seq[Long])].head()
    // phase 1: oversample — `rounds` batched top-`batch` selections
    var cand = Vector(first)
    for (_ <- 1 to rounds) {
      val minD = array_min(array(cand.map { case (_, cv) =>
        val nc = cv.map(x => x * x).sum
        lit(nc) - lit(2L) * dotQ(col("q"), typedLit(cv))
      }: _*)) + dotQ(col("q"), col("q"))
      val ids = cand.map(_._1)
      val got = v.where(!col("vec_id").isInCollection(ids))
        .select(col("vec_id"), col("q"), minD.as("d"))
        .orderBy(col("d").desc, col("vec_id"))
        .limit(batch)
        .select(col("vec_id"), col("q"))
        .as[(Long, Seq[Long])].collect()
      // A short batch means the corpus has fewer rows than the
      // oversample size: the reduce below could then face pool < k
      // (empty-minBy crash), and the oracle's POSITIONAL pid formula
      // (prior + row_number − 1) assumes full batches — fail loudly
      // here instead of desynchronizing pids downstream.
      require(got.length == batch,
        s"k-means|| oversample underflow: corpus has fewer than " +
          s"1+$rounds*$batch rows (round returned ${got.length} of " +
          s"$batch) — shrink rounds/batch to fit the corpus")
      cand ++= got
    }
    // phase 2: weigh — one corpus scan; pid = candidate pick order
    val asCodebook = cand.zipWithIndex
      .map { case ((_, q), i) => (i.toLong, q) }
    val w = v.select(assignCol(asCodebook).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("w"))
      .as[(Long, Long)].collect().toMap
    // phase 3: reduce — weighted farthest-point over ≤ 1+rounds·batch
    // candidate rows, entirely on the driver
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val pool = asCodebook.map { case (pid, q) =>
      (pid, q, w.getOrElse(pid, 0L)) }
    val seed = pool.minBy { case (pid, _, wt) => (-wt, pid) }
    var chosen = Vector(seed)
    var remaining = pool.filterNot(_._1 == seed._1)
    while (chosen.size < numCentroids) {
      val pick = remaining.minBy { case (pid, q, wt) =>
        (-wt * chosen.iterator.map(c => d2(q, c._2)).min, pid) }
      chosen :+= pick
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    chosen.zipWithIndex.map { case ((_, q, _), i) => (i.toLong, q) }
  }

  /** [[kMeans]] with the deterministic k-means‖ init — same Lloyd's
    * rounds, same output shape `(cid, i, c_val, cluster_size)`; cid is
    * [[kMeansInitParallel]]'s reduce pick order. */
  def kMeansPar(emb: DataFrame, numCentroids: Int = 16, numIter: Int = 2,
                dim: Int = 64, rounds: Int = 3, batch: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // one materialization serves the oversample rounds, the weigh
    // pass, the Lloyd's rounds, and the size pass (kMeansPP contract)
    val v = Ckpt.replace(
      emb.select(col("vec_id"), quantize(col("embedding")).as("q")))
    val codebook = kMeansCodebooksQInit(v,
      Some(kMeansInitParallel(v, numCentroids, rounds, batch)),
      numCentroids, numIter, dim).last
    val sizes = v.select(assignCol(codebook).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("cluster_size"))
    codebook.toDF("cid", "cv")
      .join(sizes, Seq("cid"), "left_outer")
      .select(col("cid"), coalesce(col("cluster_size"), lit(0L))
        .as("cluster_size"), posexplode(col("cv")).as(Seq("pos", "c_val")))
      .select(col("cid"), (col("pos") + 1).cast(LongType).as("i"),
        col("c_val"), col("cluster_size"))
  }

  /** [[kMeans]] with the farthest-point init — same Lloyd's rounds,
    * same output shape `(cid, i, c_val, cluster_size)`, but cid is the
    * pick-order index of [[kMeansInitFarthest]]. */
  def kMeansPP(emb: DataFrame, numCentroids: Int = 16, numIter: Int = 2,
               dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // the quantized corpus is materialized ONCE: the k−1 init picks,
    // every Lloyd's round, and the final size pass otherwise each
    // re-ran the parquet scan + quantize projection
    val v = Ckpt.replace(
      emb.select(col("vec_id"), quantize(col("embedding")).as("q")))
    val codebook = kMeansCodebooksQInit(v,
      Some(kMeansInitFarthest(v, numCentroids)),
      numCentroids, numIter, dim).last
    val sizes = v.select(assignCol(codebook).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("cluster_size"))
    codebook.toDF("cid", "cv")
      .join(sizes, Seq("cid"), "left_outer")
      .select(col("cid"), coalesce(col("cluster_size"), lit(0L))
        .as("cluster_size"), posexplode(col("cv")).as(Seq("pos", "c_val")))
      .select(col("cid"), (col("pos") + 1).cast(LongType).as("i"),
        col("c_val"), col("cluster_size"))
  }

  /** The trained codebook as a DataFrame — `(cid, cv)` — for operators
    * that consume it relationally ([[ivfTopKTrained]]'s probe path). */
  def kMeansCentroids(emb: DataFrame, numCentroids: Int = 16,
                      numIter: Int = 2, dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    kMeansCodebook(emb, numCentroids, numIter, dim).toDF("cid", "cv")
  }

  def kMeans(emb: DataFrame, numCentroids: Int = 16, numIter: Int = 2,
             dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // NOT checkpointed (unlike kMeansPP/kMeansPar/the trained chains):
    // first-C init is a pushed-down k-row collect and only 3 passes
    // follow — the eager materialization measured SLOWER at sf0.1
    // (1.06 → 1.39 s) than re-deriving the narrow quantize projection
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val codebook = kMeansCodebook(emb, numCentroids, numIter, dim)
    val sizes = v.select(assignCol(codebook).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("cluster_size"))
    codebook.toDF("cid", "cv")
      .join(sizes, Seq("cid"), "left_outer")
      .select(col("cid"), coalesce(col("cluster_size"), lit(0L))
        .as("cluster_size"), posexplode(col("cv")).as(Seq("pos", "c_val")))
      .select(col("cid"), (col("pos") + 1).cast(LongType).as("i"),
        col("c_val"), col("cluster_size"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the
    * [[kMeansCentroids]]-trained codebook, score cosine ONLY within
    * each cluster, and drop every vector that has a lower-id near-dup
    * (cosine ≥ `threshold`) in its cluster. Output: the survivors with
    * their cluster id — `(vec_id, cid)`.
    *
    * Scale shape: clustering replaces the LSH bucket key of
    * [[embedNearDupPairs]] as the pair-pruning partitioner — pair work
    * is O(cluster²) per cluster, the SemDeDup design point (k chosen
    * so clusters stay small; at 100 TB k is millions, here 16). The
    * assignment goes through [[assignCol]], so the large-k regime is
    * actually reachable: past [[LiteralAssignMaxK]] the codebook moves
    * out of the plan into the reference-object expression
    * ([[graft.functions.NearestCentroidExpr]]) instead of hitting
    * codegen literal limits. The
    * within-cluster self-join shuffles on `cid` and AQE splits hot
    * clusters; removal is one left-anti join, never a driver loop.
    * Identical vectors always co-cluster (same distance to every
    * centroid, same argmin tie-break), so exact dups can never hide
    * across a cluster boundary. */
  def semanticDedup(emb: DataFrame, threshold: Double,
                    numCentroids: Int = 16, numIter: Int = 2,
                    dim: Int = 64,
                    forceRefAssign: Boolean = false): DataFrame = {
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
    val codebook = kMeansCodebook(emb, numCentroids, numIter, dim)
    // narrow codebook clustering: the corpus reaches the within-cluster
    // self-join below with NO prior shuffle. `forceRefAssign` pins the
    // large-k reference-object path regardless of codebook size (the
    // dd_semantic_bigk registry query runs the END-TO-END SemDeDup
    // through it; assignCol would take that path on its own only past
    // LiteralAssignMaxK).
    val assign = if (forceRefAssign) assignColRef(codebook)
                 else assignCol(codebook)
    val m = v.withColumn("cid", assign)
    val a = m.select(col("cid"), col("vec_id").as("vec_a"),
      col("q").as("qa"), col("nq").as("na"))
    val b = m.select(col("cid"), col("vec_id").as("vec_b"),
      col("q").as("qb"), col("nq").as("nb"))
    val removed = a.join(b, Seq("cid"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dotQ(col("qa"), col("qb")).cast(DoubleType) /
        (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
      .where(col("cosine") >= threshold)
      .select(col("vec_b").as("vec_id")).distinct()
    m.join(removed, Seq("vec_id"), "left_anti").select("vec_id", "cid")
  }

  /** MULTI-TABLE LSH approximate top-k (OR-amplification): `numTables`
    * independent hyperplane tables, each bucketing the corpus by its
    * `numPlanes` sign bits; a candidate is scored when it shares a
    * bucket with the query in ANY table. A single sign-bucket table has
    * near-zero recall on near-orthogonal corpora — a true neighbor at
    * angle θ co-buckets with probability (1−θ/π)^numPlanes ≈ 2^-numPlanes
    * — and the union of L tables lifts that to 1−(1−p)^L, the standard
    * recall/work dial (the SimilaritySpec recall contract pins the
    * resulting quality against brute-force ground truth).
    *
    * Scale shape: each vector explodes to its L (table, bucket) keys —
    * the corpus shuffles L× on short keys, never all-pairs. Ranking
    * stays bounded end-to-end: a per-(query, table, bucket) bounded
    * heap first (a hot bucket can hold millions of candidates at
    * 100 TB; the partial ObjectHashAggregate caps every exchange at ≤ k
    * entries per map task — a per-query row_number window would funnel
    * them into one task), then cross-table dedup and the final heap
    * both run over ≤ numTables·k rows per query. The union top-k is
    * contained in the union of per-table top-ks, so the staging loses
    * nothing.
    *
    * Default `numPlanes` is [[AutoPlanes]] — resolution derived from
    * the corpus count ([[autoPlanes]]), the same enforced-in-code
    * sizing rule as [[knnGraph]]. Here the fixed-resolution failure is
    * per-QUERY work growing ∝ N/2^planes rather than a quadratic
    * self-join, but the fix is the same constant-occupancy rule. */
  def lshTopK(emb: DataFrame, numQueries: Long, k: Int,
              numPlanes: Int = AutoPlanes, dim: Int = 64,
              numTables: Int = 1): DataFrame = {
    val planesN = resolvePlanes(emb, numPlanes)
    // All numTables bucket keys from ONE fused codegen pass
    // (functions/LshBuckets) — the array(lshBucket, ...) formulation
    // paid numTables · numPlanes separate HOF dot products per row.
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("nq"),
        posexplode(graft.functions.LshBuckets.lshBuckets(
          col("q"), numTables, planesN, dim)).as(Seq("tbl", "bucket")))
    val queries = q.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nq").as("nqq"), col("tbl"), col("bucket"))
    val cands = q.select(col("vec_id").as("cand_id"), col("q").as("cv"),
      col("nq").as("nqc"), col("tbl"), col("bucket"))
    val scored = cands.join(broadcast(queries), Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("dot", dotQ(col("qv"), col("cv")))
      .withColumn("cosine", col("dot").cast(DoubleType) /
        (sqrt(col("nqq").cast(DoubleType)) * sqrt(col("nqc").cast(DoubleType))))
    scored
      .groupBy("query_id", "tbl", "bucket")
      .agg(graft.functions.TopKByDot.topK(k)(
        col("dot"), col("cand_id"), col("cosine")).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("c"))
      // cross-table dedup over ≤ numTables·k rows per query; a pair's
      // score is table-independent, so min == the one computed value
      .groupBy(col("query_id"), col("c.cand_id").as("cand_id"))
      .agg(min(col("c.dot")).as("dot"), min(col("c.cosine")).as("cosine"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByDot.topK(k)(
        col("dot"), col("cand_id"), col("cosine")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cand_id").as("cand_id"),
        col("c.dot").as("dot"), col("c.cosine").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** PRODUCT-QUANTIZATION approximate top-k (ADC scoring) — the third
    * ANN scale path next to [[lshTopK]] (prune by bucket) and
    * [[ivfTopK]] (prune by probe list): PQ prunes NOTHING and instead
    * COMPRESSES — every vector is encoded as `numSub` sub-codebook
    * codes (here 8 codes for a 64-dim vector; bytes in a real
    * deployment), and scoring reads only the codes. A query's
    * asymmetric distance is `Σ_s qv_slice_s · C_s[code_s]` — exact
    * query against the candidate's RECONSTRUCTION, the standard ADC of
    * Jégou et al., "Product Quantization for Nearest Neighbor Search"
    * (TPAMI 2011).
    *
    * Sub-codebooks are slices of the first `numCodes` vectors — the
    * same first-C stand-in convention as [[ivfTopK]] (the plumbing is
    * the contract; [[kMeansCodebook]] per subspace drops in for the
    * trained form, as sim_ivf_trained proves for IVF). Codebooks are
    * driver-side literals ([[assignLit]]'s pattern): encoding is one
    * narrow codegen projection, no join, no shuffle.
    *
    * Scale shape: the scored side carries `(vec_id, codes)` ONLY —
    * 8 small ints instead of 64 (256 bytes of floats at dim=64, 32×
    * compression; the reason PQ indexes fit in RAM at billions of
    * vectors). Queries broadcast; ranking is the same bounded
    * two-phase heap as [[bruteForceTopK]] — each map task reduces its
    * slice to ≤ k entries per query before any exchange. Ties in the
    * approximate score break on cand_id, so results are deterministic
    * and the oracle replays them exactly. */
  def pqTopK(emb: DataFrame, numQueries: Long, k: Int,
             numSub: Int = 8, subDim: Int = 8,
             numCodes: Int = 16): DataFrame = {
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    pqTopKWith(v, pqBooksFirstC(v, numSub, subDim, numCodes),
      numQueries, k)
  }

  /** [[pqTopK]] over TRAINED sub-codebooks — [[kMeansCodebookQ]] per
    * subspace instead of the first-C slice stand-in, proving the
    * drop-in the [[pqTopK]] scaladoc promises (the trained twin
    * relation sim_ivf_trained already proved for IVF). Serving is
    * byte-identical to [[pqTopK]]; only the model differs. Training
    * cost: `numIter` corpus scans TOTAL — [[pqModelTrained]] folds all
    * numSub subspace trainings into one explode+groupBy pass per
    * round, since every round re-reads the full embedding column
    * anyway. */
  def pqTopKTrained(emb: DataFrame, numQueries: Long, k: Int,
                    numSub: Int = 8, subDim: Int = 8,
                    numCodes: Int = 16, numIter: Int = 2): DataFrame = {
    // one materialization serves the per-round training scans and the
    // encode/query tails (kMeansPP contract)
    val v = Ckpt.replace(
      emb.select(col("vec_id"), quantize(col("embedding")).as("q")))
    pqTopKWith(v, pqModelTrained(v, numSub, subDim, numCodes, numIter),
      numQueries, k)
  }

  private def pqTopKWith(v: DataFrame, m: PqModel, numQueries: Long,
                         k: Int): DataFrame = {
    val encoded = pqEncodeDf(v, m, Seq("vec_id"))
    val queries = v.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        dotQ(col("q"), col("q")).as("nqq"))
      .withColumn("qtab", pqQueryTab(m))
      .select("query_id", "nqq", "qtab")

    encoded.select(col("vec_id").as("cand_id"), col("codes"))
      .crossJoin(broadcast(queries))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("adot", pqAdot(m))
      .withColumn("acos", col("adot").cast(DoubleType) /
        (sqrt(col("nqq").cast(DoubleType)) *
          sqrt(pqNrec(m).cast(DoubleType))))
      .groupBy("query_id")
      .agg(graft.functions.TopKByDot.topK(k)(
        col("adot"), col("cand_id"), col("acos")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cand_id").as("cand_id"),
        col("c.dot").as("adot"), col("c.cosine").as("acos"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** A PQ model: per-subspace codebooks `books(s) = (code, codeword
    * slice)` with their precomputed ‖C‖² — driver-side, codebook-sized
    * (numSub·numCodes·subDim scalars). */
  case class PqModel(books: IndexedSeq[IndexedSeq[(Long, Seq[Long])]],
                     norms: IndexedSeq[IndexedSeq[Long]],
                     numSub: Int, subDim: Int)

  private def pqModelOf(base: IndexedSeq[(Long, Seq[Long])],
                        numSub: Int, subDim: Int): PqModel = {
    val books = IndexedSeq.tabulate(numSub)(s => base.map { case (code, q) =>
      (code, q.slice(s * subDim, (s + 1) * subDim)) })
    PqModel(books,
      books.map(_.map { case (_, cv) => cv.map(x => x * x).sum }),
      numSub, subDim)
  }

  /** Trained sub-codebooks — ALL subspaces per round in ONE corpus
    * scan: rows explode to (s, slice) pairs, the per-subspace literal
    * argmin assigns each slice its code (a chained per-s branch, each
    * the same (‖C‖²−2·slice·C, code) lexicographic min as
    * [[assignLit]]), and a single groupBy(s, code) recomputes every
    * book's integer means together. Bit-identical to training each
    * subspace independently (subspaces never interact; same first-C
    * init, same truncating `div`, empty codes keep their previous
    * codeword — the sim_pq_trained oracle replays it as 8 independent
    * chains), but numIter scans TOTAL instead of numSub·numIter: at
    * 100 TB every training round re-reads the full embedding column
    * regardless of which slice it wants, so folding the subspaces into
    * one pass is a numSub-fold scan reduction. The exchange per round
    * carries ≤ numSub·numCodes·(subDim+2) counters per task —
    * map-side-combined, corpus-size-independent. numIter=0 degenerates
    * to [[pqBooksFirstC]] exactly (spec-pinned). */
  private[graft] def pqModelTrained(v: DataFrame, numSub: Int, subDim: Int,
                                    numCodes: Int, numIter: Int): PqModel = {
    val spark = v.sparkSession
    import spark.implicits._
    val sliced = v.select(posexplode(array((0 until numSub).map(s =>
      slice(col("q"), s * subDim + 1, subDim)): _*)).as(Seq("s", "sl")))
    var books: IndexedSeq[IndexedSeq[(Long, Seq[Long])]] =
      pqBooksFirstC(v, numSub, subDim, numCodes).books
    for (_ <- 0 until numIter) {
      val codeOf = (0 until numSub).map { s =>
        val entries = books(s).map { case (code, cv) =>
          val nc = cv.map(x => x * x).sum
          struct(
            (lit(nc) - lit(2L) * dotQ(col("sl"), typedLit(cv))).as("d"),
            lit(code).as("code"))
        }
        s -> array_min(array(entries: _*)).getField("code")
      }.foldRight(lit(-1L): Column) { case ((s, c), acc) =>
        when(col("s") === s, c).otherwise(acc)
      }
      val sums = (0 until subDim).map(i =>
        sum(element_at(col("sl"), i + 1)).as(s"s$i"))
      val agg = sliced.withColumn("code", codeOf)
        .groupBy(col("s"), col("code"))
        .agg(count(lit(1)).as("n"), sums: _*)
      val mean = array((0 until subDim).map(i =>
        expr(s"s$i div n")): _*)
      val next = agg.select(col("s"), col("code"), mean.as("nv"))
        .as[(Int, Long, Seq[Long])].collect()
        .groupBy(_._1)
        .map { case (s, rows) =>
          s -> rows.map(r => r._2 -> r._3).toMap }
      books = IndexedSeq.tabulate(numSub)(s => books(s).map {
        case (code, pv) =>
          (code, next.getOrElse(s, Map.empty[Long, Seq[Long]])
            .getOrElse(code, pv))
      })
    }
    pqModelOf0(books, numSub, subDim)
  }

  /** Build a [[PqModel]] from per-subspace books directly. */
  private def pqModelOf0(books: IndexedSeq[IndexedSeq[(Long, Seq[Long])]],
                         numSub: Int, subDim: Int): PqModel =
    PqModel(books,
      books.map(_.map { case (_, cv) => cv.map(x => x * x).sum }),
      numSub, subDim)

  /** First-C stand-in sub-codebooks: slices of the first `numCodes`
    * vectors (the plumbing contract; [[pqModelTrained]] is the trained
    * form). `v` = (vec_id, q). */
  private[graft] def pqBooksFirstC(v: DataFrame, numSub: Int, subDim: Int,
                                   numCodes: Int): PqModel = {
    val spark = v.sparkSession
    import spark.implicits._
    pqModelOf(v.where(col("vec_id") < numCodes)
      .select(col("vec_id"), col("q"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toIndexedSeq,
      numSub, subDim)
  }

  /** PQ-encode `df`: append `codes` (per-subspace argmin code), keeping
    * `carry` columns. Per-subspace argmin over the codebook:
    * lexicographic min of (‖C‖² − 2·slice·C, code) — the common
    * ‖slice‖² term cancels. Slices are hoisted to ONE projection
    * (numSub per row) so the per-code dots share them instead of
    * re-slicing numSub·numCodes times. */
  private def pqEncodeDf(df: DataFrame, m: PqModel,
                         carry: Seq[String]): DataFrame = {
    def encodeCol(s: Int): Column = {
      val entries = m.books(s).map { case (code, cv) =>
        struct(
          (lit(m.norms(s)(code.toInt)) -
            lit(2L) * dotQ(element_at(col("sl"), s + 1),
              typedLit(cv))).as("d"),
          lit(code).as("code"))
      }
      array_min(array(entries: _*)).getField("code")
    }
    df.select(carry.map(col) :+ array((0 until m.numSub).map(s =>
        slice(col("q"), s * m.subDim + 1, m.subDim)): _*).as("sl"): _*)
      .select(carry.map(col) :+
        array((0 until m.numSub).map(encodeCol): _*).as("codes"): _*)
  }

  /** ADC distance TABLES, built once per query row: qtab[s][c] =
    * qv_slice_s · C_s[c] (numSub×numCodes partial dots — work
    * proportional to QUERIES, not candidates). The broadcast then
    * carries the small tables instead of the query vector, and
    * per-candidate scoring is pure table lookups — the actual ADC of
    * Jégou 2011, and the reason PQ scoring beats recomputing dots.
    * Expects `qv`. */
  private def pqQueryTab(m: PqModel): Column =
    array((0 until m.numSub).map(s =>
      array(m.books(s).map { case (_, cv) =>
        dotQ(slice(col("qv"), s * m.subDim + 1, m.subDim),
          array(cv.map(lit): _*))
      }: _*)): _*)

  private def pqCodeAt(s: Int): Column =
    (element_at(col("codes"), s + 1) + 1).cast(IntegerType)

  /** Asymmetric dot from the lookup tables — expects `qtab`, `codes`. */
  private def pqAdot(m: PqModel): Column =
    (0 until m.numSub).map(s =>
      element_at(element_at(col("qtab"), s + 1), pqCodeAt(s)))
      .reduce(_ + _)

  /** ‖reconstruction‖² from the codes alone — expects `codes`. */
  private def pqNrec(m: PqModel): Column =
    (0 until m.numSub).map(s =>
      element_at(typedLit(m.norms(s)), pqCodeAt(s)))
      .reduce(_ + _)

  /** IVFADC — [[ivfTopK]]'s probe-list PRUNING composed with
    * [[pqTopK]]'s code-only COMPRESSION, the billion-vector design
    * point of Jégou et al. (TPAMI 2011, §V): a query touches only its
    * `numProbes` coarse lists, and within them candidates are scored
    * from their `numSub` PQ codes via the query's ADC lookup tables —
    * never from the stored vectors. (Codes quantize the raw slices, as
    * [[pqTopK]] does — FAISS's `by_residual=false` IVFPQ variant; the
    * coarse and PQ codebooks are the independent first-C stand-ins of
    * the two component operators.)
    *
    * Scale shape — why this is THE deployed ANN at 10⁹+ vectors: the
    * index payload per candidate is `(cid, codes)` — a centroid id plus
    * numSub small ints (bytes in production, 32× compression at
    * dim=64) — so whole shards of the inverted file fit in executor
    * memory; the probe join shuffles nothing but the broadcast query
    * tables; per-query work is O(probed-list rows) table lookups
    * instead of O(n) dot products; ranking is the bounded two-phase
    * heap end-to-end (≤ k entries per map task cross the exchange).
    * Both codebooks stay driver-side model state, exactly like the
    * components'. */
  def ivfadcTopK(emb: DataFrame, numQueries: Long, k: Int,
                 numCentroids: Int = 16, numProbes: Int = 2,
                 numSub: Int = 8, subDim: Int = 8,
                 numCodes: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
    val coarse = v.where(col("vec_id") < numCentroids)
      .select(col("vec_id"), col("q"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    ivfadcWith(v, coarse, pqBooksFirstC(v, numSub, subDim, numCodes),
      numQueries, k, numProbes)
  }

  /** FULLY-TRAINED IVFADC — the complete train-then-serve composition:
    * [[kMeansCodebook]] trains the coarse quantizer (as
    * sim_ivf_trained proved) AND [[pqModelTrained]] trains every
    * sub-codebook (as sim_pq_trained proved); serving is byte-identical
    * to [[ivfadcTopK]]. This is the deployed shape: both models come
    * out of training runs over the corpus, stay driver-side scalars,
    * and the index payload is still `(cid, codes)`. Training cost is
    * additive (numIter coarse scans + numIter folded-subspace scans)
    * and amortizes over every query the index ever serves. */
  def ivfadcTopKTrained(emb: DataFrame, numQueries: Long, k: Int,
                        numCentroids: Int = 16, numProbes: Int = 2,
                        numSub: Int = 8, subDim: Int = 8,
                        numCodes: Int = 16, numIter: Int = 2,
                        dim: Int = 64): DataFrame = {
    // one materialization serves BOTH training chains (coarse Lloyd's
    // rounds + per-subspace PQ rounds) and the probe+ADC serve tail
    // (kMeansPP contract)
    val v = Ckpt.replace(
      emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
        .withColumn("nq", dotQ(col("q"), col("q"))))
    ivfadcWith(v,
      kMeansCodebookQ(v.select(col("vec_id"), col("q")),
        numCentroids, numIter, dim),
      pqModelTrained(v.select("vec_id", "q"), numSub, subDim, numCodes,
        numIter),
      numQueries, k, numProbes)
  }

  /** SQ8 (scalar-quantized) approximate top-k — the fourth compression
    * point next to PQ: every dimension is independently quantized to
    * an 8-bit code against the corpus's per-dimension [min, max] range
    * (`code = (x−min)·255 div (max−min)`, truncating — exact BIGINT,
    * oracle-replayable), and scoring reads ONLY the codes plus the
    * broadcast 2·dim range scalars: `v̂_j = min_j + code_j·(max_j −
    * min_j) div 255`. The trade vs PQ: 8× compression instead of 32×
    * at dim=64, but NO codebook to train, exact per-dimension error
    * bounds (≤ range/255 per coordinate), and encode/decode are pure
    * arithmetic — the FAISS `SQ8` index, the first thing deployed when
    * PQ's training step is unwanted.
    *
    * Scale shape: the range statistics are ONE map-side-combined
    * aggregate (2·dim scalars to the driver — model state, like the
    * codebooks); encode is a narrow projection; the scored side
    * carries `(vec_id, codes)`; queries broadcast; ranking is the
    * bounded two-phase heap. A degenerate dimension (min == max)
    * reconstructs its constant exactly. */
  def sqTopK(emb: DataFrame, numQueries: Long, k: Int,
             dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
    val stats = v.select(
      array((0 until dim).map(i =>
        min(element_at(col("q"), i + 1))): _*).as("mins"),
      array((0 until dim).map(i =>
        max(element_at(col("q"), i + 1))): _*).as("maxs"))
      .as[(Seq[Long], Seq[Long])].head()
    val (mins, maxs) = stats
    val ranges = mins.zip(maxs).map { case (mn, mx) => mx - mn }

    // encode: per-dim truncating affine map to 0..255; range 0 → code 0.
    // HOF-with-array-literal form (r22): the earlier per-dim UNROLLED
    // expressions built a ~130-node tree per use and re-evaluated the
    // reconstruction 128× per row (adot and nrec each unrolled all 64
    // dims) — ProbeJobs attributed ~1.8 s of every warm bench rep to
    // DRIVER analysis/codegen of those trees. The zip_with/aggregate
    // form carries the model as two constant array literals, computes
    // the reconstruction ONCE per row, and is value-identical: the same
    // BIGINT subtract/multiply/div per dimension, summed in the same
    // ascending-dimension left fold.
    def arrL(xs: Seq[Long]): String = xs.mkString("array(", "L,", "L)")
    val (minsL, rangesL) = (arrL(mins), arrL(ranges))
    val codes = expr(
      s"zip_with(zip_with(q, $minsL, (x, m) -> x - m), $rangesL, " +
        "(d, r) -> IF(r = 0L, 0L, d * 255L div r))")
    // reconstruction from codes alone + the broadcast range scalars
    val recon = expr(
      s"zip_with(zip_with(codes, $minsL, (c, m) -> " +
        s"named_struct('c', c, 'm', m)), $rangesL, " +
        "(s, r) -> IF(r = 0L, s.m, s.m + s.c * r div 255L))")
    val encoded = v.select(col("vec_id").as("cand_id"), codes.as("codes"))

    val queries = v.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nq").as("nqq"))

    encoded.crossJoin(broadcast(queries))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("rec", recon)
      .withColumn("adot", expr(
        "aggregate(zip_with(qv, rec, (a, b) -> a * b), 0L, " +
          "(acc, x) -> acc + x)"))
      .withColumn("acos", col("adot").cast(DoubleType) /
        (sqrt(col("nqq").cast(DoubleType)) * sqrt(expr(
          "aggregate(rec, 0L, (acc, x) -> acc + x * x)")
          .cast(DoubleType))))
      .groupBy("query_id")
      .agg(graft.functions.TopKByDot.topK(k)(
        col("adot"), col("cand_id"), col("acos")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cand_id").as("cand_id"),
        col("c.dot").as("adot"), col("c.cosine").as("acos"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** RESIDUAL-encoded IVFADC — Jégou 2011 §V with `by_residual=true`,
    * the form FAISS deploys by default: PQ quantizes the RESIDUAL
    * `r = v − C[cid]` instead of the raw vector. Residuals concentrate
    * near zero once vectors are binned to their coarse list, so the
    * same code budget spends its resolution on how a vector DIFFERS
    * from its list's centroid — the accuracy reason deployed IVFADC
    * encodes residuals. Scoring reassembles exactly:
    * `q·v̂ = q·C[cid] + Σ_s qtab[s][code_s]` (one extra per-probe dot,
    * computed once per (query, probed list)), and the reconstruction
    * norm `‖C[cid] + r̂‖²` comes from three driver-side lookup tables
    * (‖C‖², C-slice·codeword, ‖codeword‖²) — still exact BIGINT, still
    * codes-only per candidate, same `(cid, codes)` index payload.
    * Residual sub-codebooks follow the first-C convention: the first
    * `numCodes` vectors' OWN residuals, computed by the same
    * expressions the corpus encode uses. */
  def ivfadcResidualTopK(emb: DataFrame, numQueries: Long, k: Int,
                         numCentroids: Int = 16, numProbes: Int = 2,
                         numSub: Int = 8, subDim: Int = 8,
                         numCodes: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
    val coarse = v.where(col("vec_id") < numCentroids)
      .select(col("vec_id"), col("q"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    require(coarse.map(_._1) == (0L until numCentroids.toLong),
      "first-C coarse codebook must have contiguous cids")
    val centsLit = typedLit(coarse.map(_._2))
    def centOf(cid: Column): Column =
      element_at(centsLit, (cid + 1).cast(IntegerType))

    // assignment + residual, shared by the corpus encode and the
    // residual-book base (the first numCodes vectors' residuals)
    val withR = v
      .withColumn("cid", array_max(scoreLit(coarse)).getField("cid"))
      .withColumn("r", zip_with(col("q"), centOf(col("cid")), (a, b) => a - b))
    val base = withR.where(col("vec_id") < numCodes)
      .select(col("vec_id"), col("r"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toIndexedSeq
    val m = pqModelOf(base, numSub, subDim)

    val inverted = pqEncodeDf(
      withR.select(col("vec_id"), col("cid"), col("r").as("q")),
      m, Seq("vec_id", "cid"))

    // driver-side reconstruction tables: ‖C[cid]‖² and
    // ctab[cid][s][code] = C[cid]_slice_s · B_s[code]
    val centNorms = coarse.map { case (_, cv) => cv.map(x => x * x).sum }
    val ctab: Seq[Seq[Seq[Long]]] = coarse.map { case (_, cv) =>
      (0 until numSub).map { s =>
        val cs = cv.slice(s * subDim, (s + 1) * subDim)
        m.books(s).map { case (_, bcv) =>
          cs.zip(bcv).map { case (a, b) => a * b }.sum
        }.toSeq
      }.toSeq
    }
    val ctabLit = typedLit(ctab)
    val ncLit = typedLit(centNorms)

    val queries = v.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nq").as("nqq"),
        explode(slice(reverse(array_sort(scoreLit(coarse))),
          1, numProbes)).as("probe"))
      .select(col("query_id"), col("nqq"), pqQueryTab(m).as("qtab"),
        col("probe.cid").as("cid"),
        dotQ(col("qv"), centOf(col("probe.cid"))).as("qcdot"))

    val crdot = (0 until numSub).map(s =>
      element_at(element_at(element_at(ctabLit,
        (col("cid") + 1).cast(IntegerType)), s + 1), pqCodeAt(s)))
      .reduce(_ + _)
    val nrec = element_at(ncLit, (col("cid") + 1).cast(IntegerType)) +
      lit(2L) * crdot + pqNrec(m)

    inverted.join(broadcast(queries), Seq("cid"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("adot", col("qcdot") + pqAdot(m))
      .withColumn("acos", col("adot").cast(DoubleType) /
        (sqrt(col("nqq").cast(DoubleType)) * sqrt(nrec.cast(DoubleType))))
      .groupBy("query_id")
      .agg(graft.functions.TopKByDotTag.topK(k)(
        col("adot"), col("vec_id"), col("acos"), col("cid")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cand_id").as("cand_id"),
        col("c.tag").as("cid"), col("c.dot").as("adot"),
        col("c.cosine").as("acos"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  private def ivfadcWith(v: DataFrame, coarse: Seq[(Long, Seq[Long])],
                         m: PqModel, numQueries: Long, k: Int,
                         numProbes: Int): DataFrame = {
    // The inverted file: every vector's coarse list (same cosine argmax
    // as ivfProbe) + its PQ codes — the vector itself is DROPPED here;
    // nothing downstream ever reads it again.
    val inverted = pqEncodeDf(
      v.withColumn("cid", array_max(scoreLit(coarse)).getField("cid")),
      m, Seq("vec_id", "cid"))
    ivfadcServeWith(v, inverted, coarse, m, numQueries, k, numProbes)
  }

  /** EXACT RE-RANKING refinement (FAISS `IndexRefine`) — the standard
    * accuracy-recovery pattern over any compressed index: take the
    * approximate top-`rerank` from [[ivfadcTopK]] (cheap, codes-only),
    * fetch TRUE vectors for just those `q·rerank` candidates, re-score
    * exactly, keep the top-`k`. The approximate stage bounds recall;
    * the exact stage makes precision perfect on whatever it recalled —
    * refined top-k ordering is exact over the candidate set.
    *
    * Scale shape: the candidate id set is `q·rerank` rows — broadcast
    * back onto the corpus scan as a semi-join, so true vectors are
    * fetched for candidates only (never a corpus shuffle); the exact
    * rescoring then joins two small relations and ranks with the
    * bounded heap. Total added cost over the approximate query is one
    * corpus scan with a broadcast filter. */
  def ivfadcRefineTopK(emb: DataFrame, numQueries: Long, k: Int,
                       rerank: Int = 25, numCentroids: Int = 16,
                       numProbes: Int = 2): DataFrame = {
    val approx = ivfadcTopK(emb, numQueries, rerank, numCentroids,
      numProbes).select("query_id", "cand_id")
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
    // true vectors for the recalled candidates only: broadcast the
    // small (query_id, cand_id) set into a hash join on the scan
    val cands = v.select(col("vec_id").as("cand_id"), col("q").as("cv"),
        col("nq").as("nqc"))
      .join(broadcast(approx), Seq("cand_id"))
    val queries = v.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nq").as("nqq"))
    cands.join(broadcast(queries), Seq("query_id"))
      .withColumn("dot", dotQ(col("qv"), col("cv")))
      .withColumn("cosine", col("dot").cast(DoubleType) /
        (sqrt(col("nqq").cast(DoubleType)) *
          sqrt(col("nqc").cast(DoubleType))))
      .groupBy("query_id")
      .agg(graft.functions.TopKByDot.topK(k)(
        col("dot"), col("cand_id"), col("cosine")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cand_id").as("cand_id"),
        col("c.dot").as("dot"), col("c.cosine").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** ANN INDEX PERSISTENCE (build half) — the index lifecycle every
    * deployment actually runs: encode ONCE, serve FOREVER. Writes
    * two parquet relations under `path`: the inverted file
    * `codes/(vec_id, cid, codes)` (the only corpus-sized one — numSub
    * small ints + a centroid id per vector) and the model
    * `model/(s, code, cv)` — sub-codebook rows keyed s ≥ 0 plus the
    * coarse codebook as s = −1 rows (r22: one relation instead of two
    * k-row ones, so every model reload is ONE read+collect job and a
    * build is one fewer commit — the append/ingest/serve paths reload
    * the model up to three times per lifecycle).
    * Build cost is [[ivfadcTopK]]'s encode pass; the corpus vectors
    * never need to be read again for serving. */
  def ivfadcIndexBuild(emb: DataFrame, path: String,
                       numCentroids: Int = 16, numSub: Int = 8,
                       subDim: Int = 8, numCodes: Int = 16): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
    val coarse = v.where(col("vec_id") < numCentroids)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val m = pqBooksFirstC(v, numSub, subDim, numCodes)
    pqEncodeDf(
      v.withColumn("cid", array_max(scoreLit(coarse)).getField("cid")),
      m, Seq("vec_id", "cid"))
      .write.mode("overwrite").parquet(s"$path/codes")
    (coarse.map { case (cid, cv) => (-1, cid, cv) } ++
      m.books.zipWithIndex
        .flatMap { case (b, s) => b.map { case (code, cv) => (s, code, cv) } })
      .toDF("s", "code", "cv")
      .write.mode("overwrite").parquet(s"$path/model")
  }

  /** The saved model, reloaded: (coarse codebook, PQ model). */
  private[graft] def ivfadcIndexModel(spark: org.apache.spark.sql.SparkSession,
                                      path: String)
      : (Seq[(Long, Seq[Long])], PqModel) = {
    import spark.implicits._
    val flat = spark.read.parquet(s"$path/model")
      .as[(Int, Long, Seq[Long])].collect()
    val coarse = flat.filter(_._1 == -1)
      .map(r => (r._2, r._3)).sortBy(_._1).toSeq
    val bookRows = flat.filter(_._1 >= 0)
    val numSub = bookRows.map(_._1).max + 1
    val books = IndexedSeq.tabulate(numSub)(s =>
      bookRows.filter(_._1 == s).sortBy(_._2)
        .map(r => (r._2, r._3)).toIndexedSeq)
    (coarse, pqModelOf0(books, numSub, books.head.head._2.length))
  }

  /** INCREMENTAL INDEX MAINTENANCE — encode ONLY the delta with the
    * index's SAVED model (never retrain, never re-encode the existing
    * corpus) and append it to the inverted file. Because encoding is a
    * pure function of (vector, model), an index built on a prefix and
    * appended with the rest is bit-identical to one built on the full
    * corpus — the registry roundtrip proves it under the shared
    * oracle. This is the ingest shape at 100 TB: the daily delta pays
    * one narrow encode pass; the existing billions of codes are never
    * touched. (Model drift is a REBUILD decision, not an append.) */
  def ivfadcIndexAppend(delta: DataFrame, path: String): Unit = {
    val spark = delta.sparkSession
    val (coarse, m) = ivfadcIndexModel(spark, path)
    val v = delta.select(col("vec_id"), quantize(col("embedding")).as("q"))
    pqEncodeDf(
      v.withColumn("cid", array_max(scoreLit(coarse)).getField("cid")),
      m, Seq("vec_id", "cid"))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** STREAMING INDEX INGEST — the live form of [[ivfadcIndexAppend]]:
    * each micro-batch of embeddings encodes against the saved model
    * (loaded ONCE, driver-side) and appends to the inverted file.
    * Append-only parquet, no merge, no state store — the encode is
    * stateless, so the only streaming machinery needed is foreachBatch.
    * After a drain the index is bit-identical to a batch build over
    * everything ingested. */
  def ivfadcIndexIngest(deltaStream: DataFrame, path: String): Unit = {
    val spark = deltaStream.sparkSession
    val (coarse, m) = ivfadcIndexModel(spark, path)
    val q = deltaStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val v = batch.select(col("vec_id"),
            quantize(col("embedding")).as("q"))
          pqEncodeDf(
            v.withColumn("cid",
              array_max(scoreLit(coarse)).getField("cid")),
            m, Seq("vec_id", "cid"))
            .write.mode("append").parquet(s"$path/codes")
          ()
        }
      }
      .option("checkpointLocation", s"$path/_ingest_checkpoint")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** ANN INDEX PERSISTENCE (serve half): reload the model scalars to
    * the driver and the inverted file as a DataFrame, then run the
    * identical probe+ADC+rank serving path — results are bit-identical
    * to [[ivfadcTopK]] over the source corpus (the registry roundtrip
    * shares its oracle). `emb` supplies only the QUERY vectors; the
    * index never re-reads the corpus. */
  def ivfadcIndexServe(emb: DataFrame, path: String, numQueries: Long,
                       k: Int, numProbes: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    val (coarse, m) = ivfadcIndexModel(spark, path)
    val inverted = spark.read.parquet(s"$path/codes")
    val v = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotQ(col("q"), col("q")))
    ivfadcServeWith(v, inverted, coarse, m, numQueries, k, numProbes)
  }

  /** The shared IVFADC serving tail over an (already-encoded) inverted
    * file: probe selection + ADC tables on the query side, broadcast
    * hash join on the list id, bounded-heap rank. */
  private def ivfadcServeWith(v: DataFrame, inverted: DataFrame,
                              coarse: Seq[(Long, Seq[Long])], m: PqModel,
                              numQueries: Long, k: Int,
                              numProbes: Int): DataFrame = {
    // Queries: numProbes nearest coarse lists (same sorted-slice as
    // ivfProbe) and the ADC tables; a candidate lives in exactly one
    // list, so no cross-probe dedup is needed.
    val queries = v.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qv"),
        col("nq").as("nqq"),
        explode(slice(reverse(array_sort(scoreLit(coarse))),
          1, numProbes)).as("probe"))
      .select(col("query_id"), col("nqq"), pqQueryTab(m).as("qtab"),
        col("probe.cid").as("cid"))

    inverted.join(broadcast(queries), Seq("cid"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("adot", pqAdot(m))
      .withColumn("acos", col("adot").cast(DoubleType) /
        (sqrt(col("nqq").cast(DoubleType)) *
          sqrt(pqNrec(m).cast(DoubleType))))
      .groupBy("query_id")
      .agg(graft.functions.TopKByDotTag.topK(k)(
        col("adot"), col("vec_id"), col("acos"), col("cid")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cand_id").as("cand_id"),
        col("c.tag").as("cid"), col("c.dot").as("adot"),
        col("c.cosine").as("acos"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** Retrieval-quality evaluation AS A QUERY: per-query recall@k and MRR
    * of an approximate top-k result relation against an exact one — the
    * contract every ANN index in this library is graded on
    * ([[SimilaritySpec]] prints these as scalars; this makes the grading
    * itself a first-class, oracle-checked relational operator, so index
    * regressions surface in CI data, not in prose).
    *
    * Inputs are any two (query_id, cand_id, rank) relations — brute vs
    * LSH, brute vs IVFADC, old index vs new. Outputs exact ppm integers:
    * recall_ppm = |approx ∩ exact|·10⁶ div k, and mrr_ppm = 10⁶ div
    * (approx rank of the best-ranked true hit), 0 when nothing overlaps.
    *
    * Scale shape: both sides are already top-k-bounded (≤ q·k rows), so
    * the overlap join and per-query aggregate are trivially small; the
    * expensive parts are the upstream searches, each already
    * scale-shaped. Queries with zero overlap stay in the output via the
    * exact-side LEFT join.
    *
    * Query-universe contract: the EXACT side defines the evaluated
    * query set — a query_id present only in `approx` is dropped, not
    * reported (there is no ground truth to grade it against). For the
    * "old index vs new" comparison, pass the reference index as
    * `exact`; full-outer semantics, if wanted, are one union away. */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val ex = exact.select(col("query_id"), col("cand_id"))
    val ap = approx.select(col("query_id"), col("cand_id"),
      col("rank").as("approx_rank"))
    val hits = ap.join(ex, Seq("query_id", "cand_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_hits"), min("approx_rank").as("first_hit"))
    ex.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"coalesce(n_hits, 0) * 1000000 div $k").as("recall_ppm"),
        when(col("first_hit").isNotNull, expr("1000000 div first_hit"))
          .otherwise(lit(0L)).as("mrr_ppm"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * N ranked retrieval lists — the standard hybrid-search combiner
    * (dense ANN + sparse BM25, or several ANN indexes with different
    * recall profiles). Each list contributes 1/(rrfK + rank) per
    * candidate; candidates surfaced by several rankers accumulate more
    * mass than any single ranker's tail, without ever comparing the
    * rankers' incomparable raw scores — that score-free property is why
    * RRF is the default fusion everywhere.
    *
    * Determinism: the contribution is the INTEGER `scale div (rrfK +
    * rank)` (scale = 10⁹, so ranks ≤ ~10⁹ keep distinct reciprocal
    * values apart); the fused score is an exact BIGINT sum — identical
    * in Spark and DuckDB, no float summation order. Ties break on
    * cand_id asc, the library-wide ranking convention.
    *
    * Inputs are any (query_id, cand_id, rank) relations — the
    * [[bruteForceTopK]]/[[lshTopK]]/[[ivfadcTopK]] output contract.
    * Emits (query_id, cand_id, rrf_score, n_lists, best_rank, rank):
    * n_lists = how many rankers surfaced the candidate, best_rank = its
    * best upstream rank, rank = fused 1-based position, cut at k.
    *
    * Scale shape: every input is already top-k-bounded (≤ q·k rows), so
    * the union, the (query_id, cand_id) sum, and the per-query
    * row_number window all touch ≤ q·Σkᵢ rows — nothing corpus-sized.
    * The expensive work is the upstream searches, each independently
    * scale-shaped; fusion itself is free at any corpus size. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60,
              scale: Long = 1000000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    val u = rankings
      .map(_.select(col("query_id"), col("cand_id"),
        col("rank").cast(LongType).as("rank")))
      .reduce(_.unionByName(_))
    val fused = u.groupBy("query_id", "cand_id")
      .agg(sum(expr(s"$scale div ($rrfK + rank)")).as("rrf_score"),
        count(lit(1)).as("n_lists"),
        min(col("rank")).as("best_rank"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("cand_id"))
    fused
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }
}
