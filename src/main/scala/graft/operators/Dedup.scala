package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication kernel — the training-data-pipeline operators layered on
  * top of the reference's surface (SURVEY.md §7.2 M5): exact dedup,
  * MinHash+LSH near-dup candidates, SimHash fingerprints, n-gram Jaccard.
  *
  * Scale design (100 TB posture):
  *  - exact dedup is one hash-partitioned window / group-by on the key —
  *    the single shuffle is unavoidable and AQE-skew-splittable;
  *  - MinHash is the classic shingle → k minhashes → band → bucket-join
  *    pipeline: signatures are computed with ONE map-side-combining
  *    group-by (k `min` aggregates, partial aggregation pushes to the
  *    mappers), and the candidate join shuffles on (band, signature) —
  *    never an O(n²) cross join;
  *  - SimHash is one group-by with 32 conditional-sum aggregates (again
  *    map-side partials) — no bit-explosion;
  *  - Jaccard is token-postinglist self-join — quadratic per shared token,
  *    so callers bound the id range / pre-filter with MinHash candidates.
  *
  * All hashing is md5 over deterministic strings so results are
  * reproducible across engines (DuckDB oracle parity) and across runs —
  * no dependence on Spark's murmur3 seed or JVM hashCode.
  */
object Dedup {

  /** Word n-shingles of a text column, deterministic (distinct by
    * default; `distinct = false` skips the dedup pass — correct for
    * duplicate-insensitive consumers like minhash `min`). Runs as ONE
    * fused codegen pass ([[graft.functions.WordShingles]]); the
    * original HOF formulation survives as [[shinglesHof]], spec-pinned
    * equivalent. */
  def shingles(textCol: Column, n: Int = 3,
               distinct: Boolean = true): Column =
    graft.functions.WordShingles.wordShingles(textCol, n, distinct)

  /** The HOF formulation (spec reference for the fused expression).
    * Spark's `sequence(a, b)` DESCENDS when a > b (DuckDB's
    * generate_series is empty instead), so short texts are guarded
    * explicitly. */
  def shinglesHof(textCol: Column, n: Int = 3,
                  distinct: Boolean = true): Column = {
    val w = split(trim(textCol), "\\s+")
    val sh = transform(sequence(lit(1), size(w) - (n - 1)),
      i => array_join(slice(w, i, lit(n)), " "))
    val guarded =
      when(size(w) >= n, sh).otherwise(array().cast(ArrayType(StringType)))
    if (distinct) array_distinct(guarded) else guarded
  }

  /** Exact dedup: keep the lowest-id row per duplicate group, carrying the
    * group's duplicate count. One shuffle on the dedup key. */
  def exactDedup(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val part = Window.partitionBy(keyCols.map(col): _*)
    df.withColumn("__rn", row_number().over(part.orderBy(col(idCol))))
      .withColumn("dup_count", count(lit(1)).over(part))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Largest prime below 2^32 — the modulus of the minhash permutation
    * family. */
  val MinhashPrime: Long = 4294967291L

  /** Deterministic affine-permutation parameters (a_j, b_j), derived
    * from md5 so Spark and the DuckDB oracle inline identical literals.
    * a_j ∈ [1, 2^29) keeps a_j · h < 2^61: no 64-bit overflow in either
    * engine (DuckDB BIGINT overflow is an error, not a wrap). */
  def minhashParams(numHashes: Int): IndexedSeq[(Long, Long)] = {
    def mdHex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    IndexedSeq.tabulate(numHashes) { j =>
      val hex = mdHex(s"minhash:$j")
      val a = java.lang.Long.parseLong(hex.substring(0, 7), 16) % ((1L << 29) - 1) + 1
      val b = java.lang.Long.parseLong(hex.substring(7, 14), 16) % (1L << 29)
      (a, b)
    }
  }

  /** MinHash signature: the whole kernel (tokenize → shingle →
    * polynomial shingle hash → k affine-permutation minima) runs as ONE
    * native codegen Expression per document
    * ([[graft.functions.MinhashSig]]) — a narrow map with NO shuffle,
    * no explode, no digests, no intermediate arrays. Signature values
    * are min((a_j·h + b_j) mod P) with md5-derived constants inlined
    * identically in the DuckDB oracle.
    *
    * (Measured history: explode→md5→groupBy was the original shape —
    * the agg shuffle was cheap but the per-shingle digest and the
    * exploded row stream were not; a nested-HOF `array_min(transform)`
    * variant was 2× worse again. The fused Expression beats both.)
    * Documents with fewer than 3 words yield no signature row, same as
    * the explode formulation. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int): DataFrame = {
    val params = minhashParams(numHashes)
    val sig = graft.functions.MinhashSig
      .minhashSig(col(textCol), 3, params)
    df.select(col(idCol), sig.as("__sig"))
      .where(col("__sig").isNotNull)
      .select(col(idCol) +:
        (0 until numHashes).map(j =>
          element_at(col("__sig"), j + 1).as(s"mh$j")): _*)
  }

  /** LSH banding over a minhash signature: split the k hashes into
    * `bands` bands, bucket-join documents sharing any (band, band-sig)
    * pair. Returns distinct candidate pairs (doc_a < doc_b). The join
    * shuffles on the band signature — the standard near-dup plan that
    * avoids all-pairs comparison at cluster scale. */
  def lshCandidatePairs(sig: DataFrame, idCol: String, numHashes: Int,
                        bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val bandArr = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)
          .as("sig"))
    }: _*)
    // Repartition on the join key BEFORE the self-join: both sides then
    // hang off one identical exchange, so Catalyst's ReusedExchange
    // computes the (expensive) upstream signatures exactly once instead
    // of once per join branch — and the join needs no further shuffle.
    val exploded = sig
      .select(col(idCol), explode(bandArr).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .repartition(col("band"), col("sig"))
    val a = exploded.toDF("doc_a", "band", "sig")
    val b = exploded.toDF("doc_b", "band", "sig")
    a.join(b, Seq("band", "sig"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** 32-bit SimHash over whitespace tokens. Bit b of a token is bit
    * (b mod 4) of hex digit (b div 4) of md5(token); the document bit is
    * the sign of the ±1 vote sum. Computed as 32 conditional-sum
    * aggregates in one group-by — no per-bit row explosion. */
  def simhash32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("t"))
    val aggs = (0 until 32).map { b =>
      val pos = 1 + b / 4
      val shift = b % 4
      sum(expr(
        s"CASE WHEN (shiftright(instr('0123456789abcdef', substr(md5(t), $pos, 1)) - 1, $shift) & 1) = 1 THEN 1 ELSE -1 END"
      )).as(s"s$b")
    }
    tok.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        (0 until 32).map(b =>
          when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Distinct-token Jaccard similarity for all pairs with id < maxId and
    * similarity >= threshold. Posting-list self-join on token (shuffle on
    * the token key); the id bound keeps the candidate space sane — at
    * scale, feed [[lshCandidatePairs]] output instead of an id range. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   maxId: Long, threshold: Double): DataFrame = {
    val tok = df.where(col(idCol) < maxId)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(split(trim(col(textCol)), "\\s+"))).as("t"))
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = tok.toDF("doc_a", "t")
      .join(tok.toDF("doc_b", "t"), Seq("t"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    val j = inter
      .join(broadcast(sz.toDF("doc_a", "na")), Seq("doc_a"))
      .join(broadcast(sz.toDF("doc_b", "nb")), Seq("doc_b"))
      .withColumn("n_union", col("na") + col("nb") - col("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / col("n_union"))
    j.where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")
  }

  /** Blocked EDIT-DISTANCE (fuzzy) pairing — the string-similarity dual
    * of the token-set Jaccard path: candidate pairs share a normalized
    * text prefix (the BLOCK), and only block-mates pay the quadratic
    * `levenshtein` comparison — the same sparse-candidates principle as
    * LSH banding, with a prefix in place of a hash band. Work is
    * Σ(block size²) · cmpLen², never corpus²; block skew is data skew
    * (boilerplate openings) and AQE's skew-join split applies to the
    * self-join's shuffle.
    *
    * Normalization: lowercase, whitespace-squeeze, then STRIP non-ASCII
    * (`[^ -~]`) — Spark's levenshtein counts UTF-16 units while DuckDB's
    * counts codepoints, so the cross-engine contract (and the oracle) is
    * pinned on the ASCII projection where the two agree. Comparison is
    * over the first `cmpLen` normalized chars (long documents differ
    * early or are near-dups; the head is the standard cheap proxy).
    *
    * `maxBlock` bounds the quadratic: a block larger than `maxBlock`
    * is MASS DUPLICATION (boilerplate or wholesale copies — the
    * round-18 sf10 measurement found a 16,500-doc block driving
    * 324.8M pairs, exponent 2.0 over two decades), and pairwise edit
    * distance is the wrong tool for it — the hash-based paths
    * (dd_exact, minhash/LSH) own that regime at O(n). Oversized
    * blocks are excluded BEFORE the self-join, capping per-block work
    * at maxBlock²; the cap is part of the operator contract and the
    * oracle applies the identical filter. */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 blockLen: Int, cmpLen: Int, maxDist: Int,
                 maxBlock: Int): DataFrame = {
    val clean = regexp_replace(
      regexp_replace(trim(lower(col(textCol))), "\\s+", " "),
      "[^ -~]", "")
    val d = df.select(col(idCol).as("doc_id"),
        substring(clean, 1, cmpLen).as("head"))
      .withColumn("block", substring(col("head"), 1, blockLen))
    // block-size gate: broadcast anti-join against the OVERSIZED blocks
    // only — each such key represents > maxBlock docs, so the broadcast
    // holds ≤ N/maxBlock short strings (43 keys at the sf10 measurement
    // that motivated the cap). Shape matters: a broadcast join needs no
    // partitioning, so the planner applies it BELOW the self-join's
    // exchange, and the SMJ's children stay Sort-over-ShuffleStage —
    // the exact pattern AQE's skew-join split matches (a window-count
    // gate here would interpose WindowExec and silently disable the
    // split PlanQualitySpec pins for the hot-but-bounded-block case).
    val bad = d.groupBy("block").count()
      .where(col("count") > maxBlock).select("block")
    // Explicit fan-out before the pair join: this stage is COMPUTE-
    // dense and byte-light (a 63 MB scan fans out to millions of
    // levenshtein calls), so byte-based partitioning is misled twice —
    // the scan packs into 1-2 input splits, and AQE would coalesce a
    // post-shuffle stage this small back to one task (measured: the
    // whole sf10 pairwise stage on a single core, 222 s). An explicit
    // numPartitions is the one form AQE must not coalesce; hashing on
    // block keeps block-mates co-located for the join.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sized = d.join(broadcast(bad), Seq("block"), "left_anti")
      .repartition(parts, col("block"))
      .select("block", "doc_id", "head")
    // Banded (threshold) levenshtein: O(maxDist·cmpLen) per pair instead
    // of O(cmpLen²), exact for distances ≤ maxDist, -1 beyond — the
    // beyond-band pairs are exactly the ones the filter drops.
    val l = sized.select(col("block"), col("doc_id").as("doc_a"),
      col("head").as("head_a"))
    val r = sized.select(col("block"), col("doc_id").as("doc_b"),
      col("head").as("head_b"))
    l.join(r, Seq("block"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("edit_dist",
        levenshtein(col("head_a"), col("head_b"), maxDist)
          .cast(LongType))
      .where(col("edit_dist") =!= -1L)
      .select("doc_a", "doc_b", "edit_dist")
  }

  /** Exact Jaccard verification over CANDIDATE pairs — the composition
    * a real pipeline runs at 100 TB: [[lshCandidatePairs]] proposes a
    * sparse candidate set (banded bucket join, never all-pairs), then
    * ONLY those pairs fetch their two distinct-token arrays and
    * intersect. No id-range crutch: total work is
    * O(candidates · doc length), independent of corpus pair count.
    * The two joins shuffle (pairs + token arrays) on the doc ids —
    * each document's tokens ship only to the pairs that need them. */
  def jaccardOfPairs(df: DataFrame, pairs: DataFrame, idCol: String,
                     textCol: String, threshold: Double): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
      array_distinct(split(trim(col(textCol)), "\\s+")).as("toks"))
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("toks").as("ta")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("toks").as("tb")),
        Seq("doc_b"))
      .withColumn("n_inter",
        size(array_intersect(col("ta"), col("tb"))).cast(LongType))
      .withColumn("n_union",
        (size(col("ta")) + size(col("tb"))).cast(LongType) - col("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / col("n_union"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")
  }

  /** DIRECTIONAL CONTAINMENT over candidate pairs — the subsumption
    * metric symmetric Jaccard misses: a short document wholly quoted
    * inside a long one scores `|A∩B| / |A| = 1` even though the
    * length gap crushes the Jaccard below any dedup threshold. Each
    * pair is scored in BOTH directions on distinct word sets, and
    * every crossing direction emits an ORIENTED row
    * `(contained_id, container_id, n_inter, n_contained, containment)`
    * — anti-join `contained_id` to drop subsumed docs, keeping the
    * supersets (the opposite survivor choice from
    * [[dropNearDuplicates]], which is the point: containment picks
    * the INFORMATION-maximal copy).
    *
    * Scale shape: identical to [[jaccardOfPairs]] — scoring touches
    * candidates only (never all pairs), two id-keyed joins attach the
    * token sets, and the direction split is a narrow projection of
    * already-scored rows (no rescan; Catalyst shares the scored
    * subtree under the union). */
  def containmentOfPairs(df: DataFrame, pairs: DataFrame, idCol: String,
                         textCol: String, threshold: Double): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
      array_distinct(split(trim(col(textCol)), "\\s+")).as("toks"))
    val scored = pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("toks").as("ta")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("toks").as("tb")),
        Seq("doc_b"))
      .withColumn("n_inter",
        size(array_intersect(col("ta"), col("tb"))).cast(LongType))
      .withColumn("n_a", size(col("ta")).cast(LongType))
      .withColumn("n_b", size(col("tb")).cast(LongType))
    def oriented(contained: String, container: String, n: String) =
      scored
        .withColumn("containment",
          col("n_inter").cast(DoubleType) / col(n))
        .where(col("containment") >= threshold)
        .select(col(contained).as("contained_id"),
          col(container).as("container_id"),
          col("n_inter"), col(n).as("n_contained"), col("containment"))
    oriented("doc_a", "doc_b", "n_a")
      .unionAll(oriented("doc_b", "doc_a", "n_b"))
  }

  /** Connected components over the verified duplicate-pair graph —
    * what a production dedup REPORTS: every document labeled with its
    * duplicate cluster (the component's minimum id) plus the cluster
    * size. [[dropNearDuplicates]] is the removal step; this is the
    * grouping step that makes cluster statistics (size, canonical doc)
    * possible.
    *
    * Algorithm: alternating LARGE-STAR / SMALL-STAR edge rewiring
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14). Each round rewires every node's neighborhood toward its
    * local minimum — large-star hangs all strictly-larger neighbors of
    * u off `min(Γ(u) ∪ {u})`, small-star then collapses the remaining
    * smaller-side edges onto the same minimum — so component minima
    * propagate along MANY hops per round, not one: round count is
    * O(log n) in the component size, independent of graph DIAMETER.
    * Plain min-label propagation (the previous formulation here) needs
    * diameter-many rounds, which aborts on chain-shaped duplicate
    * graphs — paraphrase chains A≈B≈C≈… produce exactly that shape.
    * Each half-round is one shuffled min-aggregate on the node key plus
    * a join back along the same key (the exchange is reusable), and the
    * per-round edge set never exceeds the input edge count (large-star
    * emits one edge per (u, larger-neighbor), small-star one per
    * (u, smaller-neighbor) — no quadratic blow-up). The driver-side
    * loop holds only two convergence scalars per round (edge count +
    * xor-of-row-hashes, riding the checkpoint job as `observe`
    * metrics — no data collect, no extra job), and each round's edges
    * are `localCheckpoint`ed so lineage stays flat; the exact
    * symmetric-difference check runs once, at the fixed point.
    *
    * Determinism: min-rewiring over an id set — order-independent. */
  def connectedComponents(docs: DataFrame, pairs: DataFrame, idCol: String,
                          maxIter: Int = 20): DataFrame = {
    // Convergence metrics ride each round's checkpoint job as `observe`
    // aggregates (r21): a round's edge set equals the previous one's
    // ONLY IF count and xor-of-row-hashes both match (both are exact
    // set invariants — a differing metric PROVES the sets differ, so
    // skipping the check there is exact, not probabilistic). The full
    // symmetric-difference check — previously a 2·|E| shuffle + count
    // job EVERY round — now runs only when the metrics match, i.e.
    // once, at the true fixed point (a hash-collision false candidate
    // would only cost one extra exact check, never a wrong result).
    def observed(df: DataFrame)
        : (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (df.observe(obs, count(lit(1)).as("cnt"),
        expr("bit_xor(xxhash64(src, dst))").as("xs")), obs)
    }
    // Bounded non-blocking poll + None fallback ([[Obs.poll]], the
    // shared r22 convention): metrics missing ⇒ that round just runs
    // the exact check, like before.
    def readObs(obs: org.apache.spark.sql.Observation)
        : Option[(Any, Any)] =
      Obs.poll(obs).map(m => (m("cnt"), m("xs")))
    // Canonical directed edges large→small; self-loops dropped.
    val (edges0, obs0) = observed(pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("src"),
        least(col("doc_a"), col("doc_b")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct())
    var edges = edges0.localCheckpoint(true)
    var prevMetrics = readObs(obs0)
    var converged = prevMetrics match {
      case Some((cnt: Long, _)) => cnt == 0L
      case _ => edges.isEmpty
    }
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR over the symmetric view, fused into ONE window pass
      // (r22): m(u) = min(Γ(u) ∪ {u}) rides every row of u's partition
      // as a window min, so the rewrite is a single exchange on src —
      // the r21 shape (groupBy(src) aggregate + join-back + distinct)
      // shuffled the symmetric view twice and paid a third exchange for
      // the distinct, ~3 AQE stage jobs per half-round. Every neighbor
      // v > u re-attaches as v→m(u); since v > u ≥ m(u), output stays
      // canonical (src > dst) with no self-loops. Duplicate (v, m) rows
      // across u-groups are NOT distinct'd here: small-star's window
      // min is duplicate-insensitive and the round's closing distinct
      // removes them, while the intermediate stays ≤ |E| rows (exactly
      // one emission per symmetric-view row with dst > src). Skew note:
      // the window places all of Γ(u) in one task (a converged star's
      // root sees its whole component) — the same single-task placement
      // the old join's probe side had; the window BUFFERS the partition
      // (spilling past memory) where the join streamed it, the price of
      // halving the per-round exchanges.
      val wSrc = Window.partitionBy("src")
      val large = edges.unionAll(
          edges.select(col("dst").as("src"), col("src").as("dst")))
        .withColumn("m", least(col("src"), min("dst").over(wSrc)))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
      // SMALL-STAR, same fusion: per u-group (all dst < src, so
      // Γ_small(u) is the whole partition), every neighbor re-attaches
      // to m = min(Γ_small(u)). The row attaining the min emits (u, m)
      // itself — the old separate smallMin union branch — and the rest
      // emit (dst, m); dst = m self-loops cannot arise. Identical
      // emission set to the r21 aggregate+join+union shape.
      val (smallObs, obs) = observed(
        large
          .withColumn("m", min("dst").over(wSrc))
          .select(
            when(col("dst") === col("m"), col("src"))
              .otherwise(col("dst")).as("src"),
            col("m").as("dst"))
          .distinct())
      val small = smallObs.localCheckpoint(true)
      // Converged when the round was a no-op: symmetric difference of
      // the (distinct) edge sets is empty. The exact aggregate —
      // previously a 2·|E| shuffle + count job EVERY round — runs only
      // when the ride-along metrics match (differing metrics prove a
      // change, exactly; see `observed`), i.e. once, at the fixed
      // point. It runs BEFORE the previous round's checkpoint is
      // released (it reads both edge sets); then Ckpt.release keeps
      // repeated invocations from accumulating edge-sized cache
      // entries.
      val curMetrics = readObs(obs)
      val candidate = (curMetrics, prevMetrics) match {
        case (Some(c), Some(p)) => c == p
        case _ => true // metrics unavailable → must check exactly
      }
      converged = candidate && {
        val changed = small.unionAll(edges)
          .groupBy("src", "dst").agg(count(lit(1)).as("c"))
          .where(col("c") === 1).count()
        changed == 0
      }
      Ckpt.release(edges)
      edges = small
      prevMetrics = curMetrics
      iter += 1
    }
    require(converged, s"connectedComponents: not converged in $maxIter " +
      "rounds — at O(log n) rounds per component this means a component " +
      s"of > 2^$maxIter nodes; raise maxIter")
    // At the fixed point every component is a star rooted at its
    // minimum: non-root nodes appear as src with their root as the one
    // dst; roots and isolated docs label themselves. `labels` is
    // consumed TWICE (sizes aggregate + the final join) — without the
    // checkpoint the whole `docs` subtree is evaluated once per
    // consumer, and callers pass EXPENSIVE docs relations (gr_components
    // derives its node universe from the gated pair generation: the
    // r22 ProbeJobs before-trace shows the lineitem pair-gen re-running
    // in the final job, 10.2 s task time at sf0.1). Checkpointing the
    // node-sized labels makes docs evaluate once and lets the final
    // edge-set checkpoint (now dead lineage) release immediately.
    val rooted = edges.groupBy("src").agg(min("dst").as("root"))
    val labels = Ckpt.replace(
      docs.select(col(idCol).as("node"))
        .join(rooted.withColumnRenamed("src", "node"), Seq("node"),
          "left_outer")
        .select(col("node"),
          coalesce(col("root"), col("node")).as("label")),
      edges)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("node").as(idCol), col("label").as("cluster_id"),
        col("cluster_size"))
  }

  /** Near-duplicate REMOVAL — the materialization step that ends a
    * dedup pipeline: given verified duplicate pairs (doc_a < doc_b),
    * drop every document that appears as the GREATER id of any pair.
    * Single-pass and deterministic (no iterative connected components:
    * within an LSH-banded candidate set the lower-id member of every
    * pair always survives, so each dup group keeps at least its minimal
    * element). One left-anti hash join against the distinct doc_b side
    * — at 100 TB the pair set is sparse, so the anti-join's build side
    * is small relative to the corpus scan. */
  def dropNearDuplicates(df: DataFrame, pairs: DataFrame,
                         idCol: String): DataFrame =
    df.join(pairs.select(col("doc_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** CANONICAL-REPRESENTATIVE selection — the quality-aware ending of
    * a dedup pipeline: [[dropNearDuplicates]] keeps each dup group's
    * arbitrary minimal id, but a production corpus wants the BEST copy
    * (highest quality score, longest text, newest crawl…). Given
    * verified duplicate pairs, this clusters them with
    * [[connectedComponents]] and elects per cluster the doc maximizing
    * `scoreCol` (tie → smallest id), emitting the full redirect map:
    * `(id, cluster_id, cluster_size, canonical_id, is_canonical)` —
    * filter `is_canonical` for the deduped corpus, or join
    * `canonical_id` to rewrite references.
    *
    * Determinism: the election is `max(struct(score, -id))` — a single
    * lexicographic max, order-independent, no `first()` anywhere.
    *
    * Scale shape: on top of the components' cost, one id-keyed join to
    * attach scores, a map-side-combining per-cluster struct-max (state
    * = one struct per cluster), and a join back on cluster_id. Scores
    * ride as one extra column — the corpus text never shuffles. */
  def clusterCanonical(docs: DataFrame, pairs: DataFrame, idCol: String,
                       scoreCol: String, maxIter: Int = 20): DataFrame = {
    val comp = connectedComponents(docs, pairs, idCol, maxIter)
    val scored = comp.join(docs.select(col(idCol), col(scoreCol)), idCol)
    val best = scored.groupBy("cluster_id")
      .agg(max(struct(col(scoreCol).as("s"), (-col(idCol)).as("nid")))
        .as("b"))
      .select(col("cluster_id"), (-col("b.nid")).as("canonical_id"))
    comp.join(best, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        col("canonical_id"),
        (col(idCol) === col("canonical_id")).as("is_canonical"))
  }

  /** Benchmark DECONTAMINATION as a DROP (the enforcement twin of
    * [[contaminationAudit]]): remove every training document sharing at
    * least one distinct word `n`-gram with the eval corpus. Same plan
    * shape as the audit — eval shingles broadcast, corpus explodes
    * narrowly, hit ids collapse to a (tiny) distinct set — finished by
    * one LEFT ANTI hash join, so the corpus itself never shuffles. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    val evalGrams = eval
      .select(explode(shingles(col(textCol), n)).as("g")).distinct()
    val hitDocs = train
      .select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .select(idCol).distinct()
    train.join(hitDocs, Seq(idCol), "left_anti")
  }

  /** Benchmark DECONTAMINATION audit — the n-gram-overlap check every
    * serious training-data pipeline runs before release (e.g. GPT-3
    * App. C / PaLM §6.1: drop training documents sharing n-grams with
    * the eval suite): every training document is labeled with how many
    * of its distinct word `n`-grams also occur in the eval corpus, plus
    * the keep/drop verdict. Zero-hit documents ARE in the output (count
    * 0, contaminated false) — the audit covers the whole corpus.
    *
    * Scale shape: the eval side is a benchmark suite — thousands of
    * documents, not billions — so its distinct shingle set is
    * BROADCAST; the training corpus then runs one narrow explode, one
    * broadcast-hash LEFT join (no shuffle of the corpus), and one
    * re-aggregation keyed on doc_id with map-side combine. Nothing
    * about this plan changes when the training side grows 1000×. If
    * the eval set ever outgrew broadcast, the same plan degrades to a
    * shuffle join on the shingle — semantics identical. */
  def contaminationAudit(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 3): DataFrame = {
    val evalGrams = eval
      .select(explode(shingles(col(textCol), n)).as("g")).distinct()
    val trainGrams = train.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), n)).as("g"))
    // INNER broadcast join: the aggregate sees only matching grams (a
    // tiny fraction of the corpus); zero-hit docs re-enter via the
    // audit's own left join below.
    val hits = trainGrams
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("contaminated"))
  }

  /** [[decontaminate]] with a BLOOM-FILTER PREFILTER on the corpus side —
    * the composition every petabyte-scale decontamination actually runs:
    *
    *   1. BUILD: the eval suite's distinct shingles fill a bloom sketch
    *      (distributed partial sketches, OR-merged; ~10 bits/item at
    *      fpp=0.03 — a few hundred KB where the exact broadcast relation
    *      would be tens of MB of strings).
    *   2. PROBE: the corpus explodes its shingles and drops every gram
    *      the sketch rejects — a whole-stage-codegen'd bitmask test
    *      running BEFORE any exchange, so only candidate grams (true
    *      hits + the fpp fraction) ever reach a join.
    *   3. VERIFY: surviving grams broadcast-join the exact eval shingle
    *      set, killing false positives, then collapse to hit doc ids.
    *
    * The output is EXACTLY [[decontaminate]]'s — the bloom only prunes,
    * never decides — which is why this query shares the exact oracle.
    * At 100 TB the win is step 2: with a 3% fpp and a typically <1%
    * true-contamination rate, ~96% of the exploded corpus grams are
    * eliminated by a branch-free probe instead of a hash-table lookup,
    * and the verify join's probe side shrinks by the same factor. */
  def decontaminateBloom(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 3,
                         expectedEvalGrams: Long = 1 << 20,
                         fpp: Double = 0.03): DataFrame = {
    import graft.functions.BloomMightContain._
    val evalGrams = eval
      .select(explode(shingles(col(textCol), n)).as("g")).distinct()
    val bloom = buildOverStrings(evalGrams, "g", expectedEvalGrams, fpp)
    val hitDocs = train
      .select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .filter(bloomMightContain(bloom, col("g")))
      .join(broadcast(evalGrams), Seq("g"))
      .select(idCol).distinct()
    train.join(hitDocs, Seq(idCol), "left_anti")
  }

  /** Positional word `w`-gram windows of a document: (pos, md5(gram))
    * for every 1-based token position — the shared scan stage of the
    * sub-document dedup family below. Only the doc id, an int position,
    * and a 16-byte digest leave the scan; gram TEXT never reaches an
    * exchange. The digest is the RAW md5 (unhex of the hex form —
    * equality and collision behavior identical to grouping on the hex
    * string, at half the key bytes on the duplicate-count exchange). */
  private def windowDigests(df: DataFrame, idCol: String, textCol: String,
                            w: Int): DataFrame = {
    // The token array is PROJECTED FIRST and the window lambda reads the
    // attribute: inlining `split` into the lambda body would re-run the
    // regex tokenization once per window position — O(tokens²) per
    // document (measured 4.4× slower at sf0.1). The Generate boundary
    // keeps CollapseProject from re-inlining the non-cheap split.
    val toks = df.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("wtk"))
    val grams = transform(sequence(lit(1), size(col("wtk")) - (w - 1)),
      i => unhex(md5(array_join(slice(col("wtk"), i, lit(w)), " "))))
    val guarded = when(size(col("wtk")) >= w, grams)
      .otherwise(array().cast(ArrayType(BinaryType)))
    toks.select(col("doc_id"), posexplode(guarded).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("g"))
  }

  /** The (doc_id, pos) rows whose `w`-window text occurs more than
    * once corpus-wide — the shared duplicate-detection stage of
    * [[substringSpans]] / [[substringStats]], and (with the
    * first-occurrence columns) of [[substringDrop]].
    *
    * Shape: ONE pass. The duplicate decision is a window count over
    * the digest key instead of the earlier aggregate-then-join-back —
    * that formulation ran [[windowDigests]] TWICE (the join's probe
    * side re-tokenized and re-hashed the whole corpus; measured as two
    * Scan+Generate subtrees in the sf0.1 plan) and broadcast the
    * duplicated-digest set, a size cliff on boilerplate-heavy corpora.
    * Here the digests shuffle once, keyed on g, and both the count and
    * (for the drop variant) the corpus-wide first occurrence come out
    * of the same whole-partition window frame — no second text pass,
    * no join, no broadcast. Exactness: count(*) over the g-partition
    * equals the old groupBy(g) count; min(struct(doc_id,pos)) over the
    * same frame equals the old per-g min — identical rows survive.
    *
    * Skew (r22, measured and kept as-is): a hot digest — license
    * boilerplate repeated across the corpus — lands its entire
    * partition in ONE window task, which buffers it (spilling via
    * UnsafeExternalSorter past memory; a straggler, not an OOM). Two
    * skew-bounded rewrites were built and benchmarked against a
    * boilerplate-heavy fixture ([[graft.ProbeSubstringSkew]]) before
    * being REJECTED on measurement: (a) a salted (g, salt) two-level
    * count ran 2-3.4× slower end-to-end, because on low-duplication
    * corpora the per-slice relation is data-sized and its extra
    * exchange + window are a full second pass; (b) a count-then-join
    * over one reused exchange (complete-mode hash aggregate + cnt>1
    * inner join) was flat at sf0.1 but 1.9× slower at a 62M-row
    * fixture — a hash aggregate over nearly-unique 16-byte digests
    * loses to the sort the window gets anyway, on exactly the common
    * (low-duplication) case. Every bounded shape measured costs ~2× on
    * typical data to cap a straggler that degrades gracefully (buffer
    * spill), so the single-pass window stays; numbers in
    * OPTIMIZATION_r22.md. */
  private def dupWindowPositions(df: DataFrame, idCol: String,
                                 textCol: String, w: Int,
                                 withFirst: Boolean): DataFrame = {
    val pos = windowDigests(df, idCol, textCol, w)
    val wg = Window.partitionBy("g")
    if (!withFirst)
      pos.withColumn("cnt", count(lit(1)).over(wg))
        .where(col("cnt") > 1).select("doc_id", "pos")
    else
      pos.withColumn("cnt", count(lit(1)).over(wg))
        .withColumn("first", min(struct(col("doc_id"), col("pos"))).over(wg))
        .where(col("cnt") > 1)
        .select(col("doc_id"), col("pos"),
          col("first.doc_id").as("f_doc"), col("first.pos").as("f_pos"))
  }

  /** Duplicated-SUBSTRING span detection — the sub-document dedup family
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better": boilerplate, licenses, and quoted passages repeat
    * inside otherwise-unique documents, where document-level MinHash
    * never fires). A token window of `w` words is DUPLICATED when its
    * text occurs more than once corpus-wide (any document, including
    * its own); runs of consecutive duplicated windows merge into maximal
    * spans (doc_id, span_start, span_end, n_windows) in token
    * coordinates — the repair decision (trim / drop / keep-first) is the
    * caller's.
    *
    * The reference implementation is a suffix array over the
    * concatenated corpus — inherently single-machine. The Spark-first
    * re-expression: (1) one narrow scan emits (doc, pos, md5(window))
    * digests; (2) ONE shuffle keyed on the 16-byte digest both counts
    * each window's corpus-wide occurrences and keeps the hit positions
    * (a whole-partition window count — see [[dupWindowPositions]] for
    * why this replaced the aggregate-then-join-back shape); (3) a
    * per-document sort merges runs (gaps-and-islands: pos −
    * row_number). Every stage is key-bounded; nothing is proportional
    * to corpus² anywhere.
    *
    * Exactness: grouping is on md5 digests on BOTH engines (the repo's
    * standard hashing convention), so the oracle criterion is identical
    * string-for-string. */
  def substringSpans(df: DataFrame, idCol: String, textCol: String,
                     w: Int): DataFrame = {
    val hit = dupWindowPositions(df, idCol, textCol, w, withFirst = false)
    val win = Window.partitionBy("doc_id").orderBy("pos")
    hit.withColumn("grp", col("pos") - row_number().over(win))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min("pos").cast(LongType).as("span_start"),
        (max("pos") + (w - 1)).cast(LongType).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** The REPAIR step of the sub-document dedup family: rebuild each
    * document with every duplicated `w`-window span REMOVED, except the
    * corpus-wide first occurrence (lexicographic (doc_id, pos)) of each
    * window, which survives — the "keep one copy of the boilerplate"
    * policy of Lee et al. 2022. Emits (doc_id, n_tokens, n_removed,
    * text_clean); text_clean re-joins kept tokens with single spaces
    * (the tokenization convention of the whole family).
    *
    * Token-level contract: a token is dropped iff it is covered by at
    * least one NON-FIRST duplicated window. Where a first-occurrence
    * window overlaps a non-first one, the shared tokens are dropped —
    * the survivor of record is the first window's digest, not its
    * specific tokens.
    *
    * Scale shape: same three key-bounded stages as [[substringSpans]],
    * plus a per-document interval list (islands already merged — at
    * most tokens/2 entries, bounded by document length, never corpus
    * size) collected and applied in one narrow HOF rebuild pass. The
    * document text itself still never reaches an exchange: the join
    * back to the corpus is on doc_id with interval payloads only. */
  def substringDrop(df: DataFrame, idCol: String, textCol: String,
                    w: Int): DataFrame = {
    val nf = dupWindowPositions(df, idCol, textCol, w, withFirst = true)
      .where(!(col("doc_id") === col("f_doc") &&
        col("pos") === col("f_pos")))
      .select("doc_id", "pos")
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val spans = nf.withColumn("grp", col("pos") - row_number().over(win))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min("pos").as("s"), (max("pos") + (w - 1)).as("e"))
    val ivs = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("ivs"))
    val toks = df.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("wtk"))
    toks.join(ivs, Seq("doc_id"), "left_outer")
      .withColumn("ivs2",
        coalesce(col("ivs"), array().cast("array<struct<s:int,e:int>>")))
      .withColumn("kept",
        filter(sequence(lit(1), size(col("wtk"))),
          i => !exists(col("ivs2"),
            iv => i >= iv("s") && i <= iv("e"))))
      .select(col("doc_id"),
        size(col("wtk")).cast(LongType).as("n_tokens"),
        (size(col("wtk")) - size(col("kept"))).cast(LongType)
          .as("n_removed"),
        array_join(transform(col("kept"),
          i => element_at(col("wtk"), i)), " ").as("text_clean"))
  }

  /** Per-document duplicated-token accounting over the same windows as
    * [[substringSpans]]: how many of a document's tokens are covered by
    * at least one duplicated `w`-window, as an exact ppm ratio — the
    * corpus-health metric that decides whether sub-document dedup is
    * worth running at all.
    *
    * Coverage is the union of the (overlapping) windows [pos, pos+w−1]:
    * sorted by pos, each duplicated window contributes
    * min(w, pos − prev_pos) new tokens — one `lag` pass, no interval
    * merge materialized. Documents with zero duplicated windows are in
    * the output with zeros (LEFT join from the corpus side). */
  def substringStats(df: DataFrame, idCol: String, textCol: String,
                     w: Int): DataFrame = {
    val hit = dupWindowPositions(df, idCol, textCol, w, withFirst = false)
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val cov = hit
      .withColumn("prev", lag("pos", 1).over(win))
      .withColumn("add",
        when(col("prev").isNull, lit(w))
          .otherwise(least(lit(w), col("pos") - col("prev"))))
      .groupBy("doc_id")
      .agg(sum(col("add").cast(LongType)).as("n_dup_tokens"))
    df.select(col(idCol).as("doc_id"),
        size(split(trim(col(textCol)), "\\s+")).cast(LongType)
          .as("n_tokens"))
      .join(cov, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        when(col("n_tokens") > 0,
          expr("coalesce(n_dup_tokens, 0) * 1000000 div n_tokens"))
          .otherwise(lit(0L)).as("dup_ppm"))
  }
}
