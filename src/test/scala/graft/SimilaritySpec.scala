package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("quantize floors to scaled longs") {
    val out = emb((0L, Seq(1.0f, -0.5f, 0.0015f)))
      .select(Similarity.quantize($"embedding").as("q"))
      .as[Seq[Long]].head()
    assert(out == Seq(1000L, -500L, 1L))
  }

  test("mmrTopK diversifies: a redundant near-copy of the first pick " +
      "loses round 2 to an orthogonal equal-relevance candidate") {
    // Query 0 = (.7,.7) — quantize floors the float32 .7 to 699, so
    // rel = 699000 for all three candidates: 1 = (1,0), 2 = (.99,.01)
    // (a near copy of 1), 3 = (0,1). With the three-way rel tie, pure
    // relevance ranking would pick 1 then 2 (id tiebreak). MMR round 1
    // picks 1 (same tiebreak); round 2 scores 2 at 7·699000 −
    // 3·sim(2,1) ≈ 1.9e6 but 3 at 7·699000 − 0 = 4893000 → the
    // orthogonal candidate wins despite the id tiebreak favoring the
    // near-copy.
    val e = emb(
      (0L, Seq(0.7f, 0.7f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0.99f, 0.01f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f)))
    val got = Similarity.mmrTopK(e, 1, 2, 3).orderBy("rank")
      .select("rank", "cand_id", "rel", "maxsim", "score")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 1L, 699000L, 0L, 4893000L),
      (2L, 3L, 699000L, 0L, 4893000L)))
  }

  test("mmrTopK stops early when a query's pool runs dry") {
    // One query, two candidates, k = 3: rounds 1-2 select both, round
    // 3 has an empty remainder and adds nothing.
    val e = emb(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    val got = Similarity.mmrTopK(e, 1, 3, 3)
    assert(got.count() == 2)
  }

  test("bruteForceTopK ranks by dot product with id tiebreak") {
    // query 0 = (1,0); candidates along decreasing x-projection
    val df = emb(
      (0L, Seq(1f, 0f)),
      (1L, Seq(2f, 0f)),    // dot 2e6
      (2L, Seq(1f, 1f)),    // dot 1e6
      (3L, Seq(0f, 1f)),    // dot 0
      (4L, Seq(-1f, 0f)))   // dot -1e6
    val out = Similarity.bruteForceTopK(df, 1L, 3)
      .select("query_id", "cand_id", "rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(out.toSeq == Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
  }

  test("cosine of parallel vectors is 1.0") {
    val df = emb((0L, Seq(1f, 2f, 2f)), (1L, Seq(2f, 4f, 4f)))
    val cos = Similarity.bruteForceTopK(df, 1L, 1)
      .select("cosine").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-9)
  }

  test("planes are deterministic ±1 and lshTopK only scores same-bucket") {
    val ps = Similarity.planes(4, 8)
    assert(ps == Similarity.planes(4, 8))
    assert(ps.flatten.forall(v => v == 1L || v == -1L))

    val df = emb(
      (0L, Seq(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (1L, Seq(1f, 1f, 1f, 1f, 1f, 1f, 1f, 0.9f)),   // same orthant → same bucket
      (2L, Seq(-1f, -1f, -1f, -1f, -1f, -1f, -1f, -1f))) // opposite bucket
    val out = Similarity.lshTopK(df, 1L, 10, 4, 8)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)))
    assert(!out.contains((0L, 2L)))
  }

  test("kMeans: recovers separated clusters; centroids are integer means") {
    // Two tight clusters around (+1000…) and (−1000…); seeds 0 and 1
    // land one in each, so two rounds of Lloyd's must pull each
    // centroid to its cluster's exact integer mean.
    val dim = 4
    val a = Seq(1.0f, 1.0f, 1.0f, 1.0f)
    val b = Seq(-1.0f, -1.0f, -1.0f, -1.0f)
    val df = emb(
      (0L, a), (1L, b),
      (2L, a.map(_ * 1.002f)), (3L, a.map(_ * 0.998f)),
      (4L, b.map(_ * 1.002f)), (5L, b.map(_ * 0.998f)))
    val out = Similarity.kMeans(df, numCentroids = 2, numIter = 2, dim = dim)
      .select("cid", "i", "c_val", "cluster_size")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 2 * dim)
    // float32 quantize: 1.002f≈1.00199997→1001, 0.998f≈0.99800003→998;
    // mean (1000+1001+998) div 3 = 999
    assert(out.filter(_._1 == 0L).map(_._3).toSeq == Seq.fill(dim)(999L))
    // negatives floor AWAY from zero: −1000, −1002, −999 → −3001 div 3
    // truncates toward zero = −1000
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq.fill(dim)(-1000L))
    assert(out.forall(_._4 == 3L))
  }

  test("kMeans: an emptied cluster keeps its previous centroid") {
    // All vectors quantize to the SAME point, so every round every
    // vector ties between the two (identical) centroids and the
    // tie-break (smaller cid) drains cluster 1 — its centroid must
    // persist through both rounds, not null out.
    val df = emb(
      (0L, Seq(1f, 1f)), (1L, Seq(1.0004f, 1.0004f)),
      (2L, Seq(1.0002f, 1.0002f)), (3L, Seq(1.0001f, 1.0001f)))
    val out = Similarity.kMeans(df, numCentroids = 2, numIter = 2, dim = 2)
      .select("cid", "i", "c_val", "cluster_size")
      .as[(Long, Long, Long, Long)].collect()
    val c1 = out.filter(_._1 == 1L)
    assert(c1.map(_._3).toSeq == Seq(1000L, 1000L), s"got: ${c1.toSeq}")
    assert(c1.forall(_._4 == 0L))
    val c0 = out.filter(_._1 == 0L)
    assert(c0.forall(_._4 == 4L))
  }

  test("fused DotProduct equals the HOF formulation on fixture vectors") {
    val q = fixtureEmb.limit(64)
      .select(Similarity.quantize(col("embedding")).as("q"))
    val rows = q.select(
        Similarity.dotQ(col("q"), col("q")).as("fused"),
        Similarity.dotQHof(col("q"), col("q")).as("ref"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, r) => assert(f == r) }
  }

  test("fused LshBuckets equals the per-table lshBucket formulation") {
    // The fused kernel (one loop over a flattened plane array) is
    // pinned against the compositional column formulation it replaced,
    // on real fixture vectors across every table.
    val (tables, planes, dim) = (16, 4, 64)
    val q = fixtureEmb.limit(64)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val unfused = (0 until tables).map(t =>
      Similarity.lshBucket(col("q"), Similarity.planes(planes, dim, t)))
    val rows = q.select(
        graft.functions.LshBuckets.lshBuckets(col("q"), tables, planes, dim)
          .as("fused"),
        array(unfused: _*).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, r) => assert(f == r) }
  }

  test("ivfTopK: probed lists find the near neighbor, skip far lists") {
    // centroids = vec 0 and 1 (numCentroids = 2): two opposite lists
    val df = emb(
      (0L, Seq(1f, 1f, 1f, 1f)),     // centroid/list A (also the query)
      (1L, Seq(-1f, -1f, -1f, -1f)), // centroid/list B
      (2L, Seq(1f, 1f, 1f, 0.5f)),   // assigned to A — must be found
      (3L, Seq(-1f, -1f, -1f, -0.5f))) // assigned to B
    val out = Similarity.ivfTopK(df, 1L, 10, numCentroids = 2,
        numProbes = 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 2L)))
    assert(!out.contains((0L, 3L)), "far list must not be probed")
    // with numProbes = 2 every list is probed → the far vector appears
    val all = Similarity.ivfTopK(df, 1L, 10, numCentroids = 2,
        numProbes = 2)
      .select("cand_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L))
  }

  test("ivfTopK recovers an exact duplicate at rank 1") {
    val base = Seq.tabulate(8)(i => (i.toFloat + 1) / 8f)
    val df = emb(
      (0L, base), (1L, base.map(-_)), // two centroids
      (5L, Seq.fill(8)(0.3f)), (6L, base))
    val top = Similarity.ivfTopK(df, 1L, 1, numCentroids = 2,
        numProbes = 1)
      .select("query_id", "cand_id", "cosine")
      .as[(Long, Long, Double)].collect().head
    assert(top._1 == 0L && top._2 == 6L)
    assert(math.abs(top._3 - 1.0) < 1e-9)
  }

  // ---- recall contract -------------------------------------------------
  // The approximate paths are hash-matched against oracles that REPLAY
  // the same approximation, which proves determinism but not quality.
  // This pins recall@k against bruteForceTopK ground truth on the real
  // fixture, at the registry's own parameters — approximation quality
  // as a tested property, not a hope. Fixture and parameters are
  // deterministic, so the measured recall is a constant; the bounds sit
  // below it with margin but far above what a broken bucketing (e.g.
  // scoring only one bucket, or probing zero lists) could reach.

  private lazy val fixtureEmb =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private def topkSets(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private lazy val bruteTruth = topkSets(
    Similarity.bruteForceTopK(fixtureEmb, 8L, 5))

  private def meanRecall(approx: Map[Long, Set[Long]]): Double = {
    val per = bruteTruth.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty[Long]).count(truth).toDouble / truth.size
    }
    per.sum / per.size
  }

  test("recall contract: lshTopK recall@5 vs brute-force ground truth") {
    // registry parameters: 8 queries, k=5, 4 planes, dim 64, 16 tables
    // (the OR-amplification width is the recall dial: a single 4-plane
    // sign table co-buckets a near-orthogonal true neighbor with
    // probability ≈ 2^-4, far below any useful contract).
    val r = meanRecall(topkSets(
      Similarity.lshTopK(fixtureEmb, 8L, 5, 4, 64, numTables = 16)))
    info(f"lshTopK recall@5 = $r%.3f")
    assert(r >= 0.5, f"lshTopK recall@5 $r%.3f below contract 0.5")
  }

  test("recall contract: ivfTopK recall@5 vs brute-force ground truth") {
    // registry parameters: 8 queries, k=5, 16 centroids, 2 probes
    val r = meanRecall(topkSets(Similarity.ivfTopK(fixtureEmb, 8L, 5, 16, 2)))
    info(f"ivfTopK recall@5 = $r%.3f")
    assert(r >= 0.5, f"ivfTopK recall@5 $r%.3f below contract 0.5")
  }

  test("pqTopK is EXACT when every vector is a concatenation of " +
       "codeword slices (ADC reconstruction error = 0)") {
    // 16 deterministic base vectors (the stand-in codebooks) + 4 built
    // from base slices: every subspace slice of every vector IS a
    // codeword, so the asymmetric distance equals the true dot and PQ
    // must reproduce brute force bit-for-bit — rank, adot, and acos.
    def baseVal(i: Int, j: Int): Float = (((i * 31 + j * 17) % 13) - 6) / 10f
    val base = (0 until 16).map(i => (i.toLong,
      Seq.tabulate(64)(j => baseVal(i, j))))
    val composed = (16 until 20).map { i =>
      (i.toLong, (0 until 8).flatMap(s =>
        base((i + 3 * s) % 16)._2.slice(s * 8, s * 8 + 8)))
    }
    val df = emb(base ++ composed: _*)
    val pq = Similarity.pqTopK(df, 4L, 5)
      .select("query_id", "cand_id", "adot", "acos", "rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(df, 4L, 5)
      .select("query_id", "cand_id", "dot", "cosine", "rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(pq == brute)
  }

  test("recall contract: pqTopK recall@5 vs brute-force ground truth") {
    // registry parameters: 8 queries, k=5, 8 subspaces × 16 codes.
    // 16 stand-in codewords reconstruct random 64-dim vectors coarsely
    // — the contract pins the floor that catches broken encoding or
    // scoring (scoring a constant, or one subspace, lands near 1/n).
    val r = meanRecall(topkSets(Similarity.pqTopK(fixtureEmb, 8L, 5)))
    info(f"pqTopK recall@5 = $r%.3f")
    assert(r >= 0.15, f"pqTopK recall@5 $r%.3f below contract 0.15")
  }

  test("recall contract: widening the search budget does not lose recall") {
    // The approximation knobs must trade work for recall monotonically
    // at fixture scale: more planes → smaller buckets is NOT monotone,
    // but more IVF probes strictly widens the candidate set, so recall
    // can only rise. This guards the probe-join plumbing (a probe list
    // accidentally dropped would show here).
    val r2 = meanRecall(topkSets(Similarity.ivfTopK(fixtureEmb, 8L, 5, 16, 2)))
    val r4 = meanRecall(topkSets(Similarity.ivfTopK(fixtureEmb, 8L, 5, 16, 4)))
    val r16 = meanRecall(topkSets(Similarity.ivfTopK(fixtureEmb, 8L, 5, 16, 16)))
    info(f"ivfTopK recall@5: probes=2 $r2%.3f, probes=4 $r4%.3f, probes=16 $r16%.3f")
    assert(r4 >= r2 && r16 >= r4)
    // probing ALL lists is exhaustive search — recall must be exact
    assert(r16 == 1.0, f"full-probe IVF must equal brute force, got $r16%.3f")
  }

  test("semanticDedup drops within-cluster near-dups, keeps lowest id") {
    // Two well-separated clusters; 4 and 5 duplicate 2 and 3. The dup
    // of 2 sits in the +cluster, the dup of 3 in the −cluster — both
    // must go; nothing may be dropped across the cluster boundary.
    // NOT scalar multiples of the seeds: a uniformly scaled copy is
    // parallel (cosine exactly 1.0) and would itself be deduped.
    val a = Seq(1f, 1f, 1f, 1f)
    val b = Seq(-1f, -1f, -1f, -1f)
    val a2 = Seq(1.2f, 0.8f, 1.1f, 0.9f)   // cos(a, a2) ≈ 0.988
    val b2 = a2.map(-_)
    val df = emb(
      (0L, a), (1L, b),
      (2L, a2), (3L, b2),
      (4L, a2), (5L, b2))
    val out = Similarity.semanticDedup(df, 0.9999, numCentroids = 2,
        numIter = 1, dim = 4)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    // survivors carry their cluster assignment
    assert(out(0L) == out(2L) && out(1L) == out(3L) && out(0L) != out(1L))
  }

  test("semanticDedup with no near-dups is the identity") {
    val out = Similarity.semanticDedup(fixtureEmb, 0.999,
        numCentroids = 16, numIter = 2)
      .select("vec_id").as[Long].collect()
    assert(out.length == fixtureEmb.count())
  }

  test("recall contract: trained-codebook IVF; full probe stays exact") {
    // registry parameters: 16 centroids, 2 Lloyd's iterations, 2 probes
    val r2 = meanRecall(topkSets(
      Similarity.ivfTopKTrained(fixtureEmb, 8L, 5, 16, 2)))
    info(f"ivfTopKTrained recall@5 = $r2%.3f")
    assert(r2 >= 0.5, f"ivfTopKTrained recall@5 $r2%.3f below contract 0.5")
    // probing every trained list is exhaustive regardless of how the
    // training shaped the lists — the serving plumbing must be lossless
    val r16 = meanRecall(topkSets(
      Similarity.ivfTopKTrained(fixtureEmb, 8L, 5, 16, 16)))
    assert(r16 == 1.0, f"full-probe trained IVF must be exact, got $r16%.3f")
  }

  test("pqTopKTrained: zero training rounds degenerate to pqTopK exactly; " +
       "real rounds actually move the sub-codebooks") {
    val pq = Similarity.pqTopK(fixtureEmb, 8L, 5)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val t0 = Similarity.pqTopKTrained(fixtureEmb, 8L, 5, numIter = 0)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(t0 == pq) // same init convention, no rounds → same model
    val v = fixtureEmb.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("q"))
    val trained = Similarity.pqModelTrained(v, 8, 8, 16, 2)
    val firstC = Similarity.pqBooksFirstC(v, 8, 8, 16)
    assert(trained.books.flatten != firstC.books.flatten,
      "two Lloyd's rounds left every sub-codebook untouched")
    // model shape is preserved: 8 books × 16 codes, codes 0..15
    assert(trained.books.forall(b => b.map(_._1) == (0L until 16L)))
  }

  test("recall contract: pqTopKTrained recall@5 vs brute-force ground " +
       "truth") {
    val r = meanRecall(topkSets(
      Similarity.pqTopKTrained(fixtureEmb, 8L, 5, numIter = 2)))
    info(f"pqTopKTrained recall@5 = $r%.3f")
    // the fixture is near-orthogonal random noise, where Lloyd's rounds
    // cannot beat the first-C stand-in (measured 0.225 vs 0.250) — the
    // contract pins the serving plumbing's quality floor, not a
    // training win that random data cannot exhibit
    assert(r >= 0.2, f"pqTopKTrained recall@5 $r%.3f below contract 0.2")
  }

  test("ivfadcTopK with an exhaustive probe budget degenerates to pqTopK " +
       "exactly (pruning off == pure ADC)") {
    // probing all 16 coarse lists admits every candidate, so the only
    // difference from pqTopK is the cid tag riding along
    val full = Similarity.ivfadcTopK(fixtureEmb, 8L, 5, 16, 16)
      .select("query_id", "cand_id", "adot", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(fixtureEmb, 8L, 5)
      .select("query_id", "cand_id", "adot", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(full == pq)
  }

  test("ivfadcTopKTrained: zero rounds degenerate to ivfadcTopK exactly " +
       "(both models share the first-C init)") {
    val t0 = Similarity.ivfadcTopKTrained(fixtureEmb, 8L, 5, numIter = 0)
      .as[(Long, Long, Long, Long, Double, Long)].collect().toSet
    val un = Similarity.ivfadcTopK(fixtureEmb, 8L, 5)
      .as[(Long, Long, Long, Long, Double, Long)].collect().toSet
    assert(t0 == un)
  }

  test("recall contract: ivfadcTopKTrained recall@5 vs brute-force " +
       "ground truth") {
    val r = meanRecall(topkSets(
      Similarity.ivfadcTopKTrained(fixtureEmb, 8L, 5, numIter = 2)))
    info(f"ivfadcTopKTrained recall@5 = $r%.3f")
    assert(r >= 0.2, f"ivfadcTopKTrained recall@5 $r%.3f below contract 0.2")
  }

  test("index roundtrip: build-to-parquet then serve == direct " +
       "ivfadcTopK, bit for bit") {
    val path = graft.Scratch.dir("sim_spec_index")
    Similarity.ivfadcIndexBuild(fixtureEmb, path)
    val served = Similarity.ivfadcIndexServe(fixtureEmb, path, 8L, 5)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    val direct = Similarity.ivfadcTopK(fixtureEmb, 8L, 5)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    assert(served == direct)
  }

  test("incremental append serves bit-identically to a full batch build " +
       "(delta encoded with the saved model only)") {
    val full = graft.Scratch.dir("sim_spec_idx_full")
    val inc = graft.Scratch.dir("sim_spec_idx_inc")
    Similarity.ivfadcIndexBuild(fixtureEmb, full)
    Similarity.ivfadcIndexBuild(fixtureEmb.where(col("vec_id") < 32), inc)
    Similarity.ivfadcIndexAppend(
      fixtureEmb.where(col("vec_id") >= 32), inc)
    val a = Similarity.ivfadcIndexServe(fixtureEmb, full, 8L, 5)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    val b = Similarity.ivfadcIndexServe(fixtureEmb, inc, 8L, 5)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    assert(a == b)
  }

  test("ivfadcRefineTopK: exact scores on recalled candidates; recall " +
       "never below the unrefined approximate top-k") {
    val refined = Similarity.ivfadcRefineTopK(fixtureEmb, 8L, 5, 25, 16, 2)
    // exactness of the rescoring: every emitted (query, cand) pair must
    // carry the true dot — check against brute-force scores
    val exact = Similarity.bruteForceTopK(fixtureEmb, 8L, 64)
      .select("query_id", "cand_id", "dot")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val rs = refined.select("query_id", "cand_id", "dot")
      .as[(Long, Long, Long)].collect()
    assert(rs.nonEmpty && rs.forall { case (q, c, d) =>
      exact.get((q, c)).contains(d) })
    val rRefined = meanRecall(topkSets(refined))
    val rPlain = meanRecall(topkSets(
      Similarity.ivfadcTopK(fixtureEmb, 8L, 5, 16, 2)))
    info(f"refine recall@5 = $rRefined%.3f vs unrefined $rPlain%.3f")
    assert(rRefined >= rPlain)
  }

  test("recall contract: ivfadcTopK recall@5 vs brute-force ground truth") {
    val r = meanRecall(topkSets(
      Similarity.ivfadcTopK(fixtureEmb, 8L, 5, 16, 2)))
    info(f"ivfadcTopK recall@5 = $r%.3f")
    // pruning × compression stack their losses; the deterministic
    // fixture measures well above this floor
    assert(r >= 0.25, f"ivfadcTopK recall@5 $r%.3f below contract 0.25")
  }

  test("sqTopK is EXACT on a corpus whose coordinates sit at the range " +
       "endpoints (codes 0/255 reconstruct min/max exactly)") {
    // ±1 coordinates: every dim's range is [-1000, 1000]; code 255
    // reconstructs -1000 + 255*2000 div 255 = 1000 exactly
    val rows = (0L until 24L).map(i =>
      (i, Seq.tabulate(16)(j =>
        if (((i >> (j % 5)) & 1L) == 1L) 1f else -1f)))
    val df = emb(rows: _*)
    val got = Similarity.sqTopK(df, 4L, 5, dim = 16)
      .select("query_id", "cand_id", "adot", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(df, 4L, 5)
      .select("query_id", "cand_id", "dot", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("recall contract: sqTopK recall@5 vs brute-force ground truth " +
       "(8-bit per-dim error is tiny at fixture ranges)") {
    val r = meanRecall(topkSets(Similarity.sqTopK(fixtureEmb, 8L, 5)))
    info(f"sqTopK recall@5 = $r%.3f")
    assert(r >= 0.8, f"sqTopK recall@5 $r%.3f below contract 0.8")
  }

  test("ivfadcResidualTopK is EXACT on a corpus of centroid copies " +
       "(residuals vanish, reconstruction == vector)") {
    // 16 distinct base patterns (the coarse centroids AND the residual
    // book base) + 16 copies: every residual is exactly zero, so ADC
    // must reproduce the exact dot for every candidate in a probed list
    val basePats = (0L until 16L).map(i =>
      (i, Seq.tabulate(64)(j =>
        (((i * 13 + j * 7) % 19).toFloat - 9f) / 4f)))
    val copies = basePats.map { case (i, v) => (i + 16L, v) }
    val df = emb((basePats ++ copies): _*)
    val got = Similarity.ivfadcResidualTopK(df, 4L, 5, 16, 16)
      .select("query_id", "cand_id", "adot", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(df, 4L, 5)
      .select("query_id", "cand_id", "dot", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("recall contract: ivfadcResidualTopK recall@5 vs brute-force " +
       "ground truth") {
    val r = meanRecall(topkSets(
      Similarity.ivfadcResidualTopK(fixtureEmb, 8L, 5, 16, 2)))
    info(f"ivfadcResidualTopK recall@5 = $r%.3f")
    // near-orthogonal random noise is residual encoding's worst case —
    // residuals are as noisy as the vectors and the 16 stand-in
    // residual codewords carry no structure (measured 0.150 vs raw
    // IVFADC's 0.425 here). The floor pins the plumbing; the
    // centroid-copy exactness law above pins the semantics, where
    // residual structure exists by construction.
    assert(r >= 0.1,
      f"ivfadcResidualTopK recall@5 $r%.3f below contract 0.1")
  }

  test("assignCol parity: reference-object path == literal path " +
       "(same argmin, same tie-break)") {
    val rows = (0L until 60L).map(i =>
      (i, Seq.tabulate(8)(j => ((i * 7 + j * 13) % 29 - 14).toFloat)))
    val df = emb(rows: _*)
    val ref = Similarity.assignToCodebook(df, 12, forceRef = true)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val lit = Similarity.assignToCodebook(df, 12, forceRef = false)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(ref == lit)
    assert(ref.map(_._2).distinct.size > 1) // the fixture actually spreads
  }

  test("NearestCentroidExpr breaks exact distance ties toward the " +
       "smaller cid, like assignLit's lexicographic array_min") {
    // vec 2 = (0,1) is equidistant from centroids 0 = (1,0) and
    // 1 = (-1,0): both paths must pick cid 0
    val df = emb((0L, Seq(1f, 0f)), (1L, Seq(-1f, 0f)), (2L, Seq(0f, 1f)))
    for (force <- Seq(true, false)) {
      val got = Similarity.assignToCodebook(df, 2, forceRef = force)
        .orderBy("vec_id").as[(Long, Long)].collect().toSeq
      assert(got == Seq((0L, 0L), (1L, 1L), (2L, 0L)), s"forceRef=$force")
    }
  }

  test("assignHierarchical degenerates to the flat argmin when every " +
       "super is a singleton bin (S = k, zero training rounds)") {
    val rows = (0L until 60L).map(i =>
      (i, Seq.tabulate(8)(j => ((i * 7 + j * 13) % 29 - 14).toFloat)))
    val df = emb(rows: _*)
    val hier = Similarity.assignHierarchical(df, 12, 12, numIter = 0,
        dim = 8)
      .select("vec_id", "cid")
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val flat = Similarity.assignToCodebook(df, 12)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(hier == flat)
  }

  test("assignHierarchical plan is one narrow projection: no join, no " +
       "exchange — the two-level argmin is all in-row") {
    val rows = (0L until 80L).map(i =>
      (i, Seq.tabulate(8)(j => ((i * 11 + j * 5) % 23 - 11).toFloat)))
    val df = emb(rows: _*)
    val out = Similarity.assignHierarchical(df, 40, 6, numIter = 1,
      dim = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hier assignment shuffled:\n$plan")
    assert(!plan.contains("Join"), s"hier assignment joined:\n$plan")
    // sanity: assignments land inside the codebook and bins are real
    val got = out.as[(Long, Long, Long)].collect()
    assert(got.length == 80 && got.forall(r => r._3 >= 0 && r._3 < 40))
    assert(got.map(_._2).distinct.length > 1)
  }

  test("assignCol dispatcher: past LiteralAssignMaxK the plan stays one " +
       "narrow shuffle-free projection (codebook not inlined as literals)") {
    val k = Similarity.LiteralAssignMaxK + 50
    val rows = (0L until (k + 26).toLong).map(i => (i, Seq(
      i.toFloat, ((i * 3) % 97).toFloat,
      ((i * 5) % 89).toFloat, ((i * 7) % 83).toFloat)))
    val df = emb(rows: _*)
    val out = Similarity.assignToCodebook(df, k) // dispatcher, not forced
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment plan shuffled:\n$plan")
    assert(!plan.contains("Join"), s"assignment plan joined:\n$plan")
    // vectors are pairwise distinct, every vector is a centroid → each
    // assigns to itself, through the reference-object path
    val got = out.as[(Long, Long)].collect()
    assert(got.length == k + 26)
    assert(got.filter(_._1 < k).forall(p => p._1 == p._2))
  }

  test("recallAtK: exact ppm overlap and MRR of the first true hit; " +
      "zero-overlap queries stay in the output") {
    import spark.implicits._
    // q1: approx found 2 of 3, first true hit at approx rank 2.
    // q2: perfect. q3: nothing overlaps.
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L))
      .toDF("query_id", "cand_id", "rank")
    val approx = Seq(
      (1L, 99L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 98L, 1L), (3L, 97L, 2L), (3L, 96L, 3L))
      .toDF("query_id", "cand_id", "rank")
    val got = graft.operators.Similarity.recallAtK(exact, approx, 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2000000L / 3L, 500000L),
      (2L, 3L, 1000000L, 1000000L),
      (3L, 0L, 0L, 0L)))
  }

  test("rrfFuse: a candidate both rankers surface out-scores either " +
      "tail; reciprocal ties break on cand_id") {
    import spark.implicits._
    // List A: 10@1, 11@2, 12@3. List B: 11@1, 13@2. Integer sums at
    // rrfK=60: 11 = 1e9//61 + 1e9//62 = 32522474 wins; then the
    // 16393442 tie (10 from A@1, 13 from... no — 13@2 = 16129032) —
    // order is 11, 10 (16393442), 13 (16129032), 12 (15873015).
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "cand_id", "rank")
    val b = Seq((0L, 11L, 1L), (0L, 13L, 2L))
      .toDF("query_id", "cand_id", "rank")
    val got = Similarity.rrfFuse(Seq(a, b), 3).orderBy("rank")
      .select("cand_id", "rrf_score", "n_lists", "best_rank", "rank")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (11L, 1000000000L / 61 + 1000000000L / 62, 2L, 1L, 1L),
      (10L, 1000000000L / 61, 1L, 1L, 2L),
      (13L, 1000000000L / 62, 1L, 2L, 3L)))
  }

  test("rrfFuse: fusing a ranking with itself preserves its order " +
      "(RRF is rank-monotone over identical lists)") {
    val brute = Similarity.bruteForceTopK(fixtureEmb, 4, 5)
    val fused = Similarity.rrfFuse(Seq(brute, brute), 5)
      .select("query_id", "cand_id", "rank")
    val base = brute.select("query_id", "cand_id", "rank")
    assert(fused.except(base).isEmpty && base.except(fused).isEmpty)
  }

  test("knnGraph restricted to a query set equals lshTopK — the graph " +
      "is the all-queries generalization of the search") {
    val knn = Similarity.knnGraph(fixtureEmb, 5, 4, 64, 8)
      .where(col("src_id") < 8)
      .select(col("src_id").as("query_id"), col("dst_id").as("cand_id"),
        col("dot"), col("cosine"), col("rank"))
    val lsh = Similarity.lshTopK(fixtureEmb, 8, 5, 4, 64, 8)
    assert(knn.except(lsh).isEmpty && lsh.except(knn).isEmpty)
  }

  test("mutual-kNN components partition the corpus: every vector " +
      "appears once and cluster_size matches the actual group size") {
    val g = Similarity.knnGraph(fixtureEmb, 5, 4, 64, 8)
      .select("src_id", "dst_id")
    val mutual = g.join(
      g.select(col("dst_id").as("src_id"), col("src_id").as("dst_id")),
      Seq("src_id", "dst_id"), "left_semi")
    val cc = graft.operators.Dedup.connectedComponents(
      fixtureEmb.select(col("vec_id").as("doc_id")),
      mutual.select(col("src_id").as("doc_a"), col("dst_id").as("doc_b")),
      "doc_id")
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    val n = fixtureEmb.count()
    assert(cc.map(_._1).distinct.length.toLong == n)
    cc.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.forall(_._3 == rows.size), s"cluster $cid size")
      assert(cid == rows.map(_._1).min, s"cluster $cid not min-labeled")
    }
  }

  test("autoPlanes: constant-occupancy sizing — smallest p with " +
      "occupancy·2^p >= n, clamped to [4, 16]") {
    // the fixture scale ladder: 500 → 5, 2000 → 7, 20000 → 11 (the
    // resolution the sf1 measurement derived — BASELINE.md round 14)
    assert(Similarity.autoPlanes(500L) == 5)
    assert(Similarity.autoPlanes(2000L) == 7)
    assert(Similarity.autoPlanes(20000L) == 11)
    // clamps: tiny corpora floor at MinAutoPlanes, huge at MaxAutoPlanes
    assert(Similarity.autoPlanes(1L) == 4)
    assert(Similarity.autoPlanes(0L) == 4)
    assert(Similarity.autoPlanes(Long.MaxValue / 4) == 16)
    // exact power-of-two boundary: occupancy<<p == n picks p, not p+1
    assert(Similarity.autoPlanes(16L << 6) == 6)
    assert(Similarity.autoPlanes((16L << 6) + 1) == 7)
  }

  test("knnGraph default (AutoPlanes) equals the pinned derived " +
      "resolution — auto is a sizing rule, not a semantic change") {
    val derived = Similarity.autoPlanes(fixtureEmb.count())
    val auto = Similarity.knnGraph(fixtureEmb, 5, numTables = 8)
    val pinned = Similarity.knnGraph(fixtureEmb, 5, derived, 64, 8)
    assert(auto.except(pinned).isEmpty && pinned.except(auto).isEmpty)
  }

  test("knnGraph: per-node ranks are dense from 1 and neighbors are " +
      "distinct; no self-edges") {
    val g = Similarity.knnGraph(fixtureEmb, 5, 4, 64, 8)
      .select("src_id", "dst_id", "rank")
      .as[(Long, Long, Long)].collect()
    assert(g.nonEmpty)
    assert(g.forall { case (s, d, _) => s != d })
    g.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.size),
        s"node $s ranks ${rows.map(_._3).toSeq}")
      assert(rows.map(_._2).distinct.size == rows.size, s"node $s dups")
    }
  }
}
