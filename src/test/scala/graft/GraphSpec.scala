package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Star graph with symmetric edges: hub 0 ↔ spokes 1..4. The hub must
    * out-rank every spoke, and all spokes tie by symmetry. */
  test("pageRankQ: hub of a star out-ranks the spokes; spokes tie") {
    val edges = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
      .toDF("src", "dst")
    val got = Graph.pageRankQ(edges, 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hub = got.head._2
    val spokes = got.tail.map(_._2)
    assert(got.map(_._1).toSeq == (0L to 4L))
    assert(spokes.distinct.size == 1, s"spokes should tie: ${got.toSeq}")
    assert(hub > spokes.head, s"hub $hub ≤ spoke ${spokes.head}")
  }

  test("pageRankQ: rank mass is conserved up to floor-division loss") {
    val edges = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
      .toDF("src", "dst")
    val total = Graph.pageRankQ(edges, 3).agg(org.apache.spark.sql
      .functions.sum("rank_q")).head().getLong(0)
    // Each of the 5 nodes loses < 1 unit per div, per round, per term;
    // with ≤ 8 edges and 3 rounds the loss is ≪ 1e-6 of the mass.
    assert(total <= Graph.Scale && total > Graph.Scale - 1000L,
      s"mass $total vs ${Graph.Scale}")
  }

  test("pageRankQ on a regular graph (cycle) is uniform at every round") {
    // 6-cycle with both directions: outdeg 2 everywhere — exact symmetry.
    val n = 6L
    val edges = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), ((i + 1) % n, i))).toDF("src", "dst")
    val got = Graph.pageRankQ(edges, 4).select("rank_q").distinct().count()
    assert(got == 1, "regular graph must stay uniform")
  }

  test("coOrderedParts emits symmetric distinct pairs") {
    val li = Seq((1L, 10L), (1L, 11L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("l_orderkey", "l_partkey")
    val got = Graph.coOrderedParts(li).as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L), (11L, 10L), (10L, 12L), (12L, 10L)))
  }

  test("pageRankQ dedups duplicated input edges on the partition pass " +
      "(same ranks as pre-distinct input), with NO extra exchange") {
    val base = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
    val dup = (base ++ base ++ base.take(3)).toDF("src", "dst")
    val clean = base.toDF("src", "dst")
    val a = Graph.pageRankQ(dup, 2).orderBy("node").collect().map(_.toSeq)
    val b = Graph.pageRankQ(clean, 2).orderBy("node").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // hash(src) satisfies the (src,dst) clustered distribution, so the
    // distinct on top of the repartition must NOT add a second shuffle:
    // exactly ONE exchange below the first aggregate of the edge prep.
    val prep = dup.repartition(org.apache.spark.sql.functions.col("src"))
      .distinct()
    val plan = prep.queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(plan).length
    assert(n == 1, s"edge prep must shuffle exactly once, saw $n:\n$plan")
  }

  test("pageRankWeightedQ: mass follows edge multiplicity — the " +
      "heavier spoke out-ranks the lighter one; uniform weights " +
      "reduce to the simple-graph ranks") {
    // Hub 0 with spokes 1 (weight 3) and 2 (weight 1), symmetric.
    val weighted = (Seq.fill(3)(Seq((0L, 1L), (1L, 0L))).flatten ++
      Seq((0L, 2L), (2L, 0L))).toDF("src", "dst")
    val got = Graph.pageRankWeightedQ(weighted, 3).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) > got(2L),
      s"weight-3 spoke must out-rank weight-1 spoke: $got")
    assert(got(0L) > got(1L), s"hub still dominates: $got")
    // With all multiplicities equal, weighted == simple.
    val uni = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
      .toDF("src", "dst")
    val w = Graph.pageRankWeightedQ(uni, 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val p = Graph.pageRankQ(uni, 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(w.toSeq == p.toSeq)
  }

  test("triangleCounts: K4 gives every node 3 triangles; a path gives " +
      "none; minSupport drops weak edges before any triangle forms") {
    // K4 on nodes 1..4 (canonical pairs), one occurrence each.
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("src", "dst")
    val gotK4 = Graph.triangleCounts(k4).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // complete graph: clustering coefficient exactly 1 (ppm) everywhere
    assert(gotK4.toSeq == (1L to 4L).map(n => (n, 3L, 3L, 1000000L)))
    // Path 1-2-3-4: no triangles, but every node present with 0.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val gotPath = Graph.triangleCounts(path).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(gotPath.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)))
    // Triangle 1-2-3 where edge (2,3) occurs once but the others twice:
    // minSupport = 2 removes (2,3) → no triangle, nodes 2,3 keep their
    // surviving degree-1 edges to node 1.
    val weak = Seq((1L, 2L), (1L, 2L), (1L, 3L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val gotWeak = Graph.triangleCounts(weak, minSupport = 2L)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotWeak.toSeq == Seq((1L, 2L, 0L), (2L, 1L, 0L), (3L, 1L, 0L)))
    // And with the threshold at 1 the triangle is counted for all three.
    val gotAll = Graph.triangleCounts(weak).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(gotAll.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("pageRankQ result is lineage-severed: downstream actions read " +
      "the materialized rank vector, never re-run the iterations") {
    val edges = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
      .toDF("src", "dst")
    val out = Graph.pageRankQ(edges, 2)
    val plan = out.queryExecution.executedPlan.toString
    // localCheckpoint(eager) already ran the loop; the returned frame
    // must be a bare scan of the checkpointed partitions — no joins or
    // exchanges left to replay, and the edge/degree persists released.
    assert(plan.contains("ExistingRDD"), s"plan was:\n$plan")
    assert(!plan.contains("Join"), s"plan was:\n$plan")
  }

  test("pageRankQ iters=20: per-iteration checkpoints keep lineage " +
      "flat, and the uniform distribution is an exact fixed point") {
    // 4-cycle: outdeg 1 everywhere, so uniform rank is an EXACT integer
    // fixed point: Scale/4 = base + (17 * Scale/4) div 20 holds with no
    // rounding. 20 iterations is the convergence-run regime the
    // per-iteration localCheckpoint exists for — without it this test
    // plans a 20-deep nested join tree; with it every round plans
    // against a flat LogicalRDD and the whole run stays sub-second.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRankQ(edges, 20).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val uniform = Graph.Scale / 4
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L).map((_, uniform)))
  }

  test("hitsQ: symmetric star — center takes S/2 authority, spokes " +
      "S/8 each, hubs stay uniform (the exact fixed point)") {
    // Center 0 ↔ spokes 1..4. Authority gathers: center receives all
    // four spoke hubs, each spoke only the center's. The exact integer
    // fixed point from uniform init: auth(0) = S/2, auth(s) = S/8,
    // hub(v) = S/5 for all v — reached after round 1 and stable, so
    // iters=3 must land exactly there (floor divisions are exact here).
    val edges = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
      .toDF("src", "dst")
    val got = Graph.hitsQ(edges, 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s = Graph.Scale
    assert(got.toSeq == Seq(
      (0L, s / 5, s / 2),
      (1L, s / 5, s / 8), (2L, s / 5, s / 8),
      (3L, s / 5, s / 8), (4L, s / 5, s / 8)))
  }

  test("hitsQ: directed cycle is an exact uniform fixed point, and " +
      "both L1 masses conserve exactly") {
    // 1→2→3→4→1: indeg = outdeg = 1 everywhere, so raw gathers are a
    // permutation of the vector and normalization is the identity —
    // uniform S/4 survives every round with zero floor loss.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.hitsQ(edges, 5).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val u = Graph.Scale / 4
    assert(got.toSeq == Seq((1L, u, u), (2L, u, u), (3L, u, u), (4L, u, u)))
  }

  test("hitsQ symmetric fast path equals the two-cache path on a " +
      "symmetric graph") {
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val a = Graph.hitsQ(edges, 3).orderBy("node").collect().map(_.toSeq)
    val b = Graph.hitsQ(edges, 3, symmetric = true).orderBy("node")
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("hitsQ result is lineage-severed like pageRankQ") {
    val edges = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
      .toDF("src", "dst")
    val plan = Graph.hitsQ(edges, 2).queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"plan was:\n$plan")
    assert(!plan.contains("Join"), s"plan was:\n$plan")
  }

  test("personalizedPageRankQ: mass stays near the seed component; a " +
      "component with no seed ranks 0 everywhere") {
    // Two disconnected 2-cliques (symmetric edges); seed = node 0 only.
    val edges = Seq((0L, 1L), (1L, 0L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.personalizedPageRankQ(edges, seeds, 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 10L, 11L))
    assert(got.map(_._2).toSeq == Seq(1L, 0L, 0L, 0L))
    val ranks = got.map(_._3)
    // The seed component holds ALL the mass (the 2-cycle is bipartite,
    // so which of the two nodes holds more oscillates by round — only
    // the component split is round-stable); the seedless component
    // receives nothing at any round.
    assert(ranks(0) > 0L && ranks(1) > 0L, s"got ${ranks.toSeq}")
    assert(ranks(0) + ranks(1) > Graph.Scale - 1000L, s"got ${ranks.toSeq}")
    assert(ranks(2) == 0L && ranks(3) == 0L, s"got ${ranks.toSeq}")
  }

  test("personalizedPageRankQ with ALL nodes as seeds reduces exactly " +
      "to pageRankQ") {
    val edges = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
      .toDF("src", "dst")
    val seeds = (0L to 4L).toDF("node")
    val ppr = Graph.personalizedPageRankQ(edges, seeds, 3)
      .select("node", "rank_q").orderBy("node").collect().map(_.toSeq)
    val pr = Graph.pageRankQ(edges, 3)
      .select("node", "rank_q").orderBy("node").collect().map(_.toSeq)
    assert(ppr.toSeq == pr.toSeq)
  }

  test("personalizedPageRankQ: seeds that are not graph nodes are " +
      "ignored; an all-foreign seed set fails loudly") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val got = Graph.personalizedPageRankQ(edges,
      Seq(0L, 99L).toDF("node"), 2).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L), (1L, 0L)))
    val err = intercept[IllegalArgumentException] {
      Graph.personalizedPageRankQ(edges, Seq(99L).toDF("node"), 2)
    }
    assert(err.getMessage.contains("no seed is a graph node"))
  }

  test("labelPropagationQ splits two bridged triangles into two " +
      "communities (where components would merge them)") {
    // Triangle {0,1,2} — bridge 2-10 — triangle {10,11,12}. Symmetric.
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.labelPropagationQ(edges, 4).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 10L, 11L, 12L))
    val comm = got.map(_._2)
    assert(comm.take(3).distinct.size == 1, s"left clique: ${got.toSeq}")
    assert(comm.drop(3).distinct.size == 1, s"right clique: ${got.toSeq}")
    assert(comm(0) != comm(3), s"communities must differ: ${got.toSeq}")
    assert(got.map(_._3).forall(_ == 3L), s"sizes: ${got.toSeq}")
  }

  test("labelPropagationQ on a clique converges to the min id and is " +
      "stable; result plan is lineage-severed") {
    val nodes = Seq(5L, 6L, 7L, 8L)
    val edges = (for { a <- nodes; b <- nodes if a != b } yield (a, b))
      .toDF("src", "dst")
    val df = Graph.labelPropagationQ(edges, 3)
    val got = df.orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq ==
      nodes.map(n => (n, 5L, 4L)),
      s"got ${got.toSeq}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"plan was:\n$plan")
    assert(!plan.contains("Join"), s"plan was:\n$plan")
  }

  test("edgeJaccard: exact common-neighbor counts and ppm overlap on " +
      "K4 with a pendant path") {
    // K4 on 0..3, pendant path 3-4-5 (same fixture as the kCore test).
    val und = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)) ++
      Seq((3L, 4L), (4L, 5L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.edgeJaccard(edges).orderBy("node_a", "node_b")
      .select("node_a", "node_b", "common", "jaccard_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (0L, 1L, 2L, 1000000L), (0L, 2L, 2L, 1000000L),
      (0L, 3L, 2L, 666666L),  // d0=3, d3=4: 2·10⁶ div 3
      (1L, 2L, 2L, 1000000L), (1L, 3L, 2L, 666666L),
      (2L, 3L, 2L, 666666L),
      (3L, 4L, 0L, 0L), (4L, 5L, 0L, 0L)),
      s"got ${got.toSeq}")
  }

  test("kCore: K4 with a pendant path — the path peels over two " +
      "rounds, the clique survives at degree 3") {
    // K4 on 0..3, pendant path 3-4-5. Symmetric edges.
    val und = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)) ++
      Seq((3L, 4L), (4L, 5L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2, rounds = 3).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L to 3L).map(n => (n, 3L)),
      s"got ${got.toSeq}")
  }

  test("kCore AutoCoreK derives k from density: K4+pendant-path has " +
      "m=8, n=6 → k=max(2, 8/6+1)=2, and autoCoreK covers the bounds") {
    // density rule itself
    assert(Graph.autoCoreK(8, 6) == 2)    // floor(1.33)+1 = 2
    assert(Graph.autoCoreK(12, 4) == 4)   // K4+: floor(3)+1
    assert(Graph.autoCoreK(3, 6) == 2)    // sparse → the floor-2 clamp
    assert(Graph.autoCoreK(0, 0) == 2)    // empty graph guard
    // end-to-end: AutoCoreK on the K4+path fixture == pinned k=2
    val und = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)) ++
      Seq((3L, 4L), (4L, 5L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.kCore(edges, Graph.AutoCoreK, rounds = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L to 3L).map(n => (n, 3L)), s"got ${got.toSeq}")
  }

  test("kCore: k above the max degree empties the graph") {
    val und = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    assert(Graph.kCore(edges, k = 3, rounds = 2).count() == 0)
  }

  test("kCore: repeated invocations release their per-round edge " +
      "checkpoints (call-scoped cache discipline)") {
    val und = (for { a <- 0L to 5L; b <- 0L to 5L if a < b } yield (a, b))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    def run(): Unit = Graph.kCore(edges, 3, 3).collect()
    run() // steady state
    val before = spark.sparkContext.getPersistentRDDs.size
    run(); run()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2,
      s"persisted RDD count grew $before -> $after")
  }

  test("bfsHops: single seed on a path — exact hop layers inside the " +
      "round budget, sentinel -1 beyond") {
    val und = (0L to 4L).map(i => (i, i + 1))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, rounds = 3).orderBy("node")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 1L), (1L, 1L, 1L), (2L, 2L, 1L),
      (3L, 3L, 1L), (4L, -1L, 0L), (5L, -1L, 0L)),
      s"got ${got.toSeq}")
  }

  test("bfsHops: directed input — sink-only nodes appear, reached " +
      "along in-edges or with the sentinel") {
    // 2 and 4 never occur as src; a src-only node universe would drop
    // them from the output entirely.
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, rounds = 2).orderBy("node")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 1L), (1L, 1L, 1L), (2L, 2L, 1L),
      (3L, -1L, 0L), (4L, -1L, 0L)),
      s"got ${got.toSeq}")
  }

  test("bfsHops: two seeds meet in the middle; non-node seeds are " +
      "ignored") {
    val und = (0L to 4L).map(i => (i, i + 1))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val seeds = Seq(0L, 5L, 99L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, rounds = 4).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 2L),
      (4L, 1L), (5L, 0L)), s"got ${got.toSeq}")
  }

  test("ssspRounds: a cheap multi-hop route beats an expensive direct " +
      "edge once the round budget admits it") {
    // 0→3 directly costs 10; 0→1→2→3 costs 3. Symmetric edges.
    val und = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    val edges = und.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .toDF("src", "dst", "cost")
    val seeds = Seq(0L).toDF("node")
    val r1 = Graph.ssspRounds(edges, seeds, rounds = 1).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // One relaxation: only direct edges from the seed are reachable.
    assert(r1.toSeq == Seq((0L, 0L), (1L, 1L), (2L, -1L), (3L, 10L)),
      s"got ${r1.toSeq}")
    val r3 = Graph.ssspRounds(edges, seeds, rounds = 3).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Three relaxations: the 3-hop route relaxes 0→3 down to cost 3.
    assert(r3.toSeq == Seq((0L, 0L, 1L), (1L, 1L, 1L), (2L, 2L, 1L),
      (3L, 3L, 1L)), s"got ${r3.toSeq}")
  }

  test("ssspRounds: unreached nodes carry the sentinel; unit costs " +
      "reduce to bfsHops") {
    val und = (0L to 4L).map(i => (i, i + 1, 1L))
    val edges = und.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .toDF("src", "dst", "cost")
    val seeds = Seq(0L).toDF("node")
    val sssp = Graph.ssspRounds(edges, seeds, rounds = 3).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bfs = Graph.bfsHops(edges.select("src", "dst"), seeds, rounds = 3)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sssp.toSeq == bfs.toSeq,
      s"unit-cost sssp ${sssp.toSeq} != bfs ${bfs.toSeq}")
    assert(sssp.toSeq.filter(_._2 == -1L).map(_._1) == Seq(4L, 5L))
  }

  test("ssspRounds collapses duplicate (src,dst) edges to min cost " +
      "before caching (bfsHops distinct parity)") {
    // Parallel edges 0→1 at costs 7 and 2: min-cost must win, and the
    // duplicate must not inflate results (dist(1) = 2, via one round).
    val edges = Seq((0L, 1L, 7L), (0L, 1L, 2L), (1L, 2L, 1L))
      .toDF("src", "dst", "cost")
    val got = Graph.ssspRounds(edges, Seq(0L).toDF("node"), rounds = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 0L), (1L, 2L), (2L, 3L)),
      s"got ${got.toSeq}")
  }

  test("gr_reach_recursive: backbone reachability is consistent with " +
      "gr_bfs (subset of reached, distances bound from above), and " +
      "the plan executes through UnionLoopExec, not driver iteration") {
    val sf = "/root/testdata/sf0.001"
    val rec = RegistryGraph.queries("gr_reach_recursive")(spark, sf)
    // Plan guard: the self-referencing CTE must plan as the engine's
    // union-loop operator — if the analyzer ever silently rewrote or
    // the version dropped support, this is where it shows.
    val phys = rec.queryExecution.executedPlan.toString
    assert(phys.contains("UnionLoop"),
      s"expected UnionLoopExec in the physical plan, got:\n$phys")
    val got = rec.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // The backbone is a subgraph of the gated graph on the same seeds
    // and rounds: every backbone-reached node must be gr_bfs-reached,
    // with the backbone distance an UPPER bound of the gated-graph
    // hop distance (dropping edges can only lengthen paths).
    val bfs = RegistryGraph.queries("gr_bfs")(spark, sf)
      .where($"reached" === 1L).select("node", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty, "recursive reach returned no rows")
    val violations = got.collect {
      case (n, d) if !bfs.contains(n) => s"$n not bfs-reached"
      case (n, d) if bfs(n) > d => s"$n: bfs ${bfs(n)} > backbone $d"
    }
    assert(violations.isEmpty, violations.mkString("; "))
    // Seeds (dist 0) agree exactly: the seed families are identical.
    assert(got.filter(_._2 == 0L).keySet == bfs.filter(_._2 == 0L).keySet)
  }
}
