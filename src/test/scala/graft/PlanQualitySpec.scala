package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Events, Joins}

/** Plan-quality guards: these assert the PHYSICAL plan properties the
  * 100 TB design depends on — filter pushdown into the parquet scan,
  * column pruning, broadcast joins for small dims, and exchange reuse in
  * self-joins. A regression here means a query still returns correct
  * rows but would fall over at scale. */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val plan = planString(Registry.queries("q1_agg")(spark, dir))
    assert(plan.contains("PushedFilters: ["),
      "scan should carry pushed filters")
    assert(plan.contains("l_shipdate"), "shipdate must reach the scan")
    assert(!plan.toLowerCase.contains("pushedfilters: []"),
      "pushed filter list must be non-empty")
  }

  test("p2_projection prunes the scan to exactly the projected columns") {
    val plan = planString(Registry.queries("p2_projection")(spark, dir))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("c_custkey") &&
      readSchema.contains("c_name") && readSchema.contains("c_mktsegment"))
    assert(!readSchema.contains("c_acctbal") &&
      !readSchema.contains("c_nationkey"),
      s"unused columns must not be read: $readSchema")
  }

  test("J1 and the E1 filer join broadcast the small side") {
    val j1 = planString(Registry.queries("j1_filer_join")(spark, dir))
    assert(j1.contains("BroadcastHashJoin"), "J1 must broadcast the dim")
    val e1 = planString(Registry.queries("e1_schedule_d")(spark, dir))
    assert(e1.contains("BroadcastHashJoin"),
      "E1 filer join must broadcast the cover projection")
    assert(!j1.contains("SortMergeJoin"))
  }

  test("q5 six-table join: all-broadcast at fixture scale, no cartesian") {
    val plan = planString(
      SparkEntry.queries("q5_local_supplier")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "pruned dims must broadcast")
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"cycle-closing nation conjunct must stay an equi-join:\n$plan")
  }

  test("q6 filter-aggregate: every predicate reaches the parquet scan") {
    val plan = planString(SparkEntry.queries("q6_forecast")(spark, dir))
    val scanLine = plan.linesIterator
      .find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("l_shipdate") &&
      scanLine.contains("l_discount") && scanLine.contains("l_quantity"),
      s"all three predicates must push down: $scanLine")
  }

  test("q5 and rangeJoin under DISABLED broadcasts: shuffle joins, no nested loop") {
    // The 100 TB posture claim made concrete: when no side fits a
    // broadcast (threshold -1 simulates big-big), every equi-join must
    // degrade to a shuffle join — a plan that flips to
    // BroadcastNestedLoop/Cartesian here would die at scale.
    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val q5 = planString(SparkEntry.queries("q5_local_supplier")(spark, dir))
      assert(!q5.contains("Cartesian") && !q5.contains("NestedLoop"),
        s"q5 must stay equi-joined without broadcasts:\n$q5")
      assert(q5.contains("SortMergeJoin") || q5.contains("ShuffledHashJoin"),
        "q5 should fall back to shuffle joins")
      val rj = planString(Joins.rangeJoin(
        spark.range(2000).selectExpr("id AS pid", "id * 3 AS t"),
        "t",
        spark.range(500).selectExpr("id AS iv", "id * 10 AS s", "id * 10 + 15 AS e"),
        "s", "e", 20L))
      assert(!rj.contains("Cartesian") && !rj.contains("NestedLoop"),
        s"bucketed range join must stay hash-joinable without broadcasts:\n$rj")
    } finally {
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("minhash signature plan is shuffle-free (fused Expression)") {
    // the raw operator, without the registry's final ORDER BY (which
    // legitimately range-partitions)
    val df = graft.operators.Dedup.minhashSignature(
      Tables.load(spark, dir, "documents"), "doc_id", "text", 8)
    val plan = planString(df)
    assert(!plan.contains("Exchange"),
      s"signature computation must be a narrow map:\n$plan")
  }

  test("LSH band self-join reuses one exchange for both branches") {
    val plan = planString(Registry.queries("dd_lsh_pairs")(spark, dir))
    assert(plan.contains("ReusedExchange") ||
      plan.contains("TableCacheQueryStage"),
      "signature computation must not run once per join branch")
  }

  test("sim_brute_topk shuffles bounded heaps, not all scored rows") {
    val df = graft.operators.Similarity.bruteForceTopK(
      Tables.load(spark, dir, "embeddings"), numQueries = 8, k = 5)
    val plan = planString(df)
    // The old shape — row_number over Window.partitionBy(query_id) —
    // funnels every scored row through one exchange into q partitions.
    assert(!plan.contains("Window"),
      s"no global window rank over the scored corpus:\n$plan")
    // The two-phase shape: a partial ObjectHashAggregate FEEDS the
    // query_id exchange, so the exchange input is per-map-task ≤k heaps.
    // The tree prints root-first, so the exchange's child (the partial
    // aggregate) appears on a LATER line than the exchange itself.
    val lines = plan.linesIterator.toVector
    val exI = lines.indexWhere(_.contains("Exchange hashpartitioning(query_id"))
    assert(exI >= 0, s"expected a query_id exchange:\n$plan")
    assert(lines.drop(exI + 1).exists(_.contains("ObjectHashAggregate")),
      s"exchange must consume partial aggregates, not scored rows:\n$plan")
  }

  test("sim_lsh_topk and sim_ivf_topk rank via bounded heaps, no query window") {
    val emb = Tables.load(spark, dir, "embeddings")
    val lsh = planString(graft.operators.Similarity.lshTopK(
      emb, numQueries = 8, k = 5, numPlanes = 4, dim = 64))
    // lshTopK has no window at all — candidate ranking is the two-phase
    // aggregate keyed on (query_id, bucket).
    assert(!lsh.contains("Window"),
      s"lshTopK must not rank scored rows through a window:\n$lsh")
    assert(lsh.contains("ObjectHashAggregate"),
      s"lshTopK must rank via the bounded-heap aggregate:\n$lsh")
    val ivf = planString(graft.operators.Similarity.ivfTopK(
      emb, numQueries = 8, k = 5))
    // ivfTopK keeps one window for PROBE selection (≤ numCentroids rows
    // per query — corpus-independent); the corpus-bound candidate
    // ranking must not be a query_id window.
    val windows = ivf.linesIterator.filter(_.contains("Window")).toSeq
    assert(!windows.exists(_.contains("query_id")),
      s"ivfTopK must not rank candidates through a query_id window:\n$ivf")
    assert(ivf.contains("ObjectHashAggregate"),
      s"ivfTopK must rank via the bounded-heap aggregate:\n$ivf")
  }

  test("TrainPrep: sample/mix are narrow maps; packing shuffles once per shard") {
    import graft.operators.TrainPrep
    val docs = Tables.load(spark, dir, "documents")
    // sampling and mixing must not shuffle — they are scan-side filters
    val sample = planString(TrainPrep.sampleByHash(docs, "doc_id", 20))
    assert(!sample.contains("Exchange"),
      s"hash sampling must be a narrow map:\n$sample")
    val mix = planString(TrainPrep.mixWeighted(Seq(
      (docs.select(col("doc_id")), 80),
      (docs.select((col("doc_id") + 1000L).as("doc_id")), 20)), "doc_id"))
    assert(!mix.contains("Exchange"),
      s"weighted mix must be filters + union, no shuffle:\n$mix")
    // packing windows per shard: exactly one hash exchange, on the shard
    val packFull = planString(TrainPrep.packSequences(
      docs, "doc_id", "text", "lang", 256))
    // AQE's toString echoes the pre-adaptive plan after "Initial Plan" —
    // audit only the final executed plan.
    val pack = packFull.split("== Initial Plan ==").head
    val exchanges = pack.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("lang"),
      s"packing must shuffle once on the shard key:\n$pack")
  }

  test("temperatureMix: allocation broadcasts to the corpus, the corpus " +
      "never sorts or windows") {
    import graft.operators.TrainPrep
    val docs = Tables.load(spark, dir, "documents")
    val full = planString(
      TrainPrep.temperatureMix(docs, "doc_id", "source", 30L))
    val plan = full.split("== Initial Plan ==").head
    // The per-row keep decision must be hash-vs-broadcast-rate: the
    // domain allocation (with its tiny windows) joins back BROADCAST,
    // and no window/sort partitions the corpus by domain — domain skew
    // must not concentrate work.
    assert(plan.contains("BroadcastHashJoin"),
      s"allocation must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the allocation join:\n$plan")
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    // The only Window is the largest-remainder row_number over the
    // domain-count aggregate (group-count-sized), never over doc rows.
    assert(windowLines.forall(!_.contains("doc_id")),
      s"no corpus-partitioned window allowed:\n$plan")
  }

  test("mmrTopK returns a lineage-severed selection; the greedy rounds " +
      "never re-run downstream") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, dir, "embeddings")
    val out = Similarity.mmrTopK(emb, 4L, 3, 6)
    val plan = out.queryExecution.executedPlan.toString
    // Each round checkpointed; the returned frame reads the final
    // union's partitions — no joins or windows left to replay.
    assert(plan.contains("ExistingRDD"), s"plan was:\n$plan")
    assert(!plan.contains("Join"), s"plan was:\n$plan")
  }

  test("quantilesApproxEval: the grade join is broadcast, never a " +
      "corpus shuffle join") {
    val events = Tables.load(spark, dir, "events")
    val full = planString(Events.quantilesApproxEval(events, 100))
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch estimates must broadcast back:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"grade join must not shuffle the events:\n$plan")
  }

  test("events path/scd2/rollup plans: bounded top-k, reused exchanges, " +
       "one Expand pass") {
    import graft.operators.Events
    val ev = Tables.load(spark, dir, "events")
    def finalPlan(p: String) = p.split("== Initial Plan ==").head
    def hashExchanges(p: String) = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq

    // pathTransitions / sessionPaths: global top-k must be a bounded
    // heap (TakeOrderedAndProject), never a range-exchange global sort.
    val pt = finalPlan(planString(Events.pathTransitions(ev, 20)))
    assert(pt.contains("TakeOrderedAndProject"),
      s"pathTransitions top-k must be TakeOrderedAndProject:\n$pt")
    assert(!pt.contains("rangepartitioning"),
      s"pathTransitions must not globally sort:\n$pt")
    val sp = finalPlan(planString(Events.sessionPaths(ev, 1800L, 20)))
    assert(sp.contains("TakeOrderedAndProject"),
      s"sessionPaths top-k must be TakeOrderedAndProject:\n$sp")
    // session window on user_id; the (user, session) collect reuses its
    // partitioning (subset key), so only the path count re-shuffles.
    assert(hashExchanges(sp).size == 2,
      s"sessionPaths: window + path count = two hash exchanges:\n$sp")

    // scd2: the run groupBy(user, version) and the stitch window are
    // both satisfied by the session window's hashpartitioning(user_id)
    // — the whole interval build rides ONE exchange (scaladoc claim).
    val scd = finalPlan(planString(Events.scd2(ev)))
    val scdEx = hashExchanges(scd)
    assert(scdEx.size == 1 && scdEx.head.contains("user_id"),
      s"scd2 must shuffle once, on user_id:\n$scd")

    // rollupMulti: grouping sets = one Expand + one aggregate exchange.
    val ru = finalPlan(planString(Events.rollupMulti(ev)))
    assert(ru.contains("Expand"),
      s"rollupMulti must plan ROLLUP as Expand:\n$ru")
    assert(hashExchanges(ru).size == 1,
      s"rollupMulti: one aggregate exchange:\n$ru")
  }

  test("latestSnapshot: partial struct-max aggregates before the one " +
       "exchange — no per-user window sort") {
    import graft.operators.Events
    val df = Events.latestSnapshot(Tables.load(spark, dir, "events"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("partial_max"),
      s"latest snapshot must combine map-side:\n$plan")
    // struct aggregates plan as SortAggregate (bare-key sort) — fine;
    // what must NOT appear is a window over full user histories
    assert(!plan.contains("Window"),
      s"latest snapshot must not window user histories:\n$plan")
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1 && hashEx.head.contains("user_id"),
      s"one exchange on user_id:\n$plan")
  }

  test("pqTopK: narrow encode (no pre-join exchange), broadcast queries, " +
       "candidate side carries codes only") {
    import graft.operators.Similarity
    val df = Similarity.pqTopK(
      Tables.load(spark, dir, "embeddings"), 8L, 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // queries broadcast; the only hash exchange is the top-k agg's on
    // query_id — encoding itself never shuffles
    assert(plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1 && hashEx.head.contains("query_id"),
      s"only the top-k agg may shuffle (on query_id):\n$plan")
    // the scored stream projects (cand_id, codes): the 64-wide vector
    // must not survive past the encode projection into the join
    val joinLine = plan.linesIterator
      .find(_.contains("BroadcastNestedLoopJoin"))
    assert(joinLine.isDefined, s"expected broadcast NL join:\n$plan")
    val candProject = plan.linesIterator
      .find(l => l.contains("Project") && l.contains("AS codes"))
    assert(candProject.exists(!_.contains("embedding")),
      s"candidate projection must reduce to codes:\n$candProject")
  }

  test("ivfadcTopK: inverted file reaches the probe join as (cid, codes) " +
       "with no prior exchange; queries broadcast; one bounded-heap shuffle") {
    import graft.operators.Similarity
    val df = Similarity.ivfadcTopK(
      Tables.load(spark, dir, "embeddings"), 8L, 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // probe join: broadcast HASH join on the coarse list id
    val joinLine = plan.linesIterator.find(_.contains("BroadcastHashJoin"))
    assert(joinLine.exists(_.contains("cid")),
      s"expected broadcast hash join on cid:\n$plan")
    // the only hash exchange is the final top-k agg's on query_id — the
    // inverted file is assigned+encoded in narrow projections
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1 && hashEx.head.contains("query_id"),
      s"only the top-k agg may shuffle (on query_id):\n$plan")
    // the candidate projection into the join carries codes, not the
    // 64-wide vector
    val candProject = plan.linesIterator
      .find(l => l.contains("Project") && l.contains("AS codes"))
    assert(candProject.exists(!_.contains("embedding")),
      s"inverted-file projection must reduce to (cid, codes):\n$candProject")
  }

  test("ivfadcRefineTopK: candidate vectors fetched via broadcast joins " +
       "(no corpus shuffle); one bounded-heap exchange") {
    import graft.operators.Similarity
    val df = Similarity.ivfadcRefineTopK(
      Tables.load(spark, dir, "embeddings"), 8L, 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // both refine joins (candidate-id semi fetch, query attach) are
    // broadcast hash joins — the corpus never shuffles for refinement
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected broadcast joins for the refine fetch:\n$plan")
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("query_id")),
      s"only top-k aggs may shuffle (on query_id):\n$plan")
  }

  test("tokenBudget shuffles catalogs, not text: one source-keyed " +
       "exchange whose rows exclude the document body") {
    import graft.operators.TrainPrep
    val docs = Tables.load(spark, dir, "documents")
    val df = TrainPrep.tokenBudget(docs, "doc_id", "text", "source",
      "n_chars", 600L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("source"),
      s"tokenBudget must shuffle once on the source key:\n$plan")
    // the window input project computes n_tokens from text BELOW the
    // exchange; text itself must not ride the shuffle
    assert(!exchanges.head.contains("text"),
      s"document text must not be a shuffle key:\n${exchanges.head}")
    val windowLine = plan.linesIterator.find(_.contains("Window ["))
    assert(windowLine.exists(!_.contains("text#")),
      s"text must be projected away before the window:\n$windowLine")
  }

  test("ascii_backslash is callable from plain SQL (extension injection)") {
    val r = spark.sql("SELECT ascii_backslash('café') AS e")
      .collect().head.getString(0)
    assert(r == "caf\\xe9")
  }

  test("optimizer rule collapses nested ascii_backslash (injected Rule)") {
    import graft.functions.AsciiBackslash.asciiBackslash
    import spark.implicits._
    val df = Seq("café").toDF("s")
      .select(asciiBackslash(asciiBackslash(col("s"))).as("e"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("ascii_?backslash".r.findAllIn(optimized.toLowerCase).size <= 1,
      s"nested escape should collapse to one:\n$optimized")
    assert(df.collect().head.getString(0) == "caf\\xe9")
  }

  test("bucketed tables co-locate: big-big equi-join runs with NO exchange") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    Joins.writeBucketed(li, "pq_li_bucketed", "l_orderkey", 8)
    Joins.writeBucketed(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "pq_ord_bucketed", "l_orderkey", 8)
    // force the non-broadcast path: the point is the exchange-free
    // shuffle join, not a broadcast
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("pq_li_bucketed")
        .join(spark.table("pq_ord_bucketed"), Seq("l_orderkey"))
      val plan = planString(joined).split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() ==
        li.join(ord, li("l_orderkey") === ord("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS pq_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS pq_ord_bucketed")
    }
  }

  test("saltedJoin: equal to plain join, hot key spread across salts") {
    import spark.implicits._
    // skewed fact: one hot key with 1000 rows
    val fact = ((1 to 1000).map(i => (7L, i.toLong)) ++
      Seq((1L, 1L), (2L, 2L))).toDF("k", "payload")
    val dim = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (9L, "unmatched"))
      .toDF("k", "name")
    val salted = Joins.saltedJoin(fact, dim, "k", salts = 8)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.orderBy("k", "payload").collect().toSeq ==
      plain.orderBy("k", "payload").collect().toSeq)
    // the hot key's rows must occupy several salt partitions
    val spread = fact
      .withColumn("__salt",
        pmod(hash(fact.columns.map(col): _*), lit(8)))
      .where($"k" === 7L).select("__salt").distinct().count()
    assert(spread >= 4, s"salt spread too low: $spread")
  }

  test("dd_decontaminate broadcasts the eval shingle set") {
    val plan = planString(
      SparkEntry.queries("dd_decontaminate")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side must broadcast — the corpus must not shuffle:\n$plan")
  }

  test("dd_decontaminate_bloom: codegen probe filters BELOW the verify " +
       "broadcast join — pruned grams never reach the exchange") {
    val df = SparkEntry.queries("dd_decontaminate_bloom")(spark, dir)
    val plan = planString(df)
    assert(plan.contains("bloommightcontainexpr") ||
           plan.contains("BloomMightContain"),
      s"bloom probe must appear in the physical plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"exact verify join must broadcast the eval shingles:\n$plan")
    // the probe is a Filter operator, i.e. it runs in the scan stage,
    // not after the join
    val probeIdx = plan.toLowerCase.indexOf("bloommightcontain")
    val bhjIdx = plan.indexOf("BroadcastHashJoin")
    assert(probeIdx > bhjIdx, // plan prints top-down: deeper = later text
      s"probe must sit below (after, in print order) the verify join:\n$plan")
  }

  test("fuzzyPairs: the pair join's fan-out is an explicit non-" +
      "coalescible repartition, and skew insurance is the block cap") {
    import spark.implicits._
    // The round-18 sf10 measurement replaced fuzzyPairs' skew story:
    // the pairwise stage is compute-dense and byte-light, so (a) AQE's
    // byte-based coalescing collapsed it to ONE task (222 s single-
    // core), and (b) byte-based skew-split never saw the hot block as
    // skewed bytes either. The operator now carries its own insurance:
    // an oversized-block CAP (quadratic work bounded at maxBlock² per
    // block — DedupSpec pins the exclusion) plus an explicit
    // REPARTITION_BY_NUM on the block key, the one exchange form AQE
    // is forbidden to coalesce, so block-mates spread over the full
    // partition count no matter how few bytes they are.
    def hex(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes).map("%02x".format(_)).mkString
    val hot = (0 until 3000).map(i =>
      (i.toLong, s"zzzz ${hex(i)} ${hex(i + 100000L)}"))
    val cold = (0 until 60).map(i =>
      (100000L + i, s"${"%04d".format(i)} ${hex(i + 200000L)}"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.fuzzyPairs(
      docs, "doc_id", "text", blockLen = 4, cmpLen = 24, maxDist = 3,
      maxBlock = 10000)
    val plan = planString(pairs)
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"pair join must fan out via an explicit numPartitions " +
        s"repartition (AQE must not coalesce it):\n$plan")
    // and the fan-out carries the session's full partition count
    val parts = spark.sessionState.conf.numShufflePartitions
    assert(plan.contains(s"hashpartitioning(block#") &&
           plan.contains(s", $parts), REPARTITION_BY_NUM"),
      s"fan-out must hash block over all $parts partitions:\n$plan")
  }

  test("tx_bm25_topk: the query vocabulary broadcast-filters the " +
      "exploded corpus BEFORE the (doc, term) exchange") {
    val plan = planString(Registry.queries("tx_bm25_topk")(spark, dir))
    // The vocab semi-filter must be a broadcast hash join (never a
    // shuffle of the full exploded corpus against a 12-term relation) …
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
    // … sitting BELOW the first aggregate exchange: between the scan's
    // Generate (token explode) and the first HashAggregate there must
    // be a broadcast join, i.e. the join appears after Generate but
    // before the (doc_id, term) partial aggregate in bottom-up order.
    val gen = plan.lastIndexOf("Generate")     // deepest = corpus explode
    val bj = plan.lastIndexOf("BroadcastHashJoin")
    assert(gen > bj, // toString prints top-down: deeper = later index
      s"vocab join must sit directly above the corpus explode:\n$plan")
    // And the ranking tail is the bounded-heap rewrite, not Sort+Window.
    assert(plan.contains("TopKPerKey "), s"plan was:\n$plan")
  }

  test("gr_pagerank: repeated invocations do not accumulate persisted " +
      "edge/degree RDDs (call-scoped persists)") {
    def run(): Unit = Registry.queries("gr_pagerank")(spark, dir).collect()
    run() // steady state (first run may leave its checkpoint RDD)
    val before = spark.sparkContext.getPersistentRDDs.size
    run(); run()
    val after = spark.sparkContext.getPersistentRDDs.size
    // Each invocation may retain its node-sized localCheckpoint until
    // the DataFrame is GC'd (≤ 1 RDD per run); the edge + degree
    // persists (2 per run) must NOT remain — a leak shows up as
    // growth ≥ 4 over two runs.
    assert(after - before <= 2,
      s"persisted RDD count grew $before -> $after: edge/degree " +
        "persists are leaking")
  }

  // ------------------------------------------------------------------
  // Skew stress: the 2level/salted paths exist FOR hot keys, but the
  // registry fixtures are uniform. These build a skewed fixture (one
  // key holding ~30% of rows), assert value parity with the plain
  // forms, and check the structural bound that makes the skewed form
  // safe — the partition key includes the bucket/salt, and the hot
  // key's rows actually spread across those sub-keys.
  // ------------------------------------------------------------------

  test("skew: sessionize2Level on a 30%-hot user matches plain " +
      "sessionize; the window exchange keys on (user, bucket) and the " +
      "hot user's largest sub-partition is day-bounded") {
    import spark.implicits._
    val baseUs = 1704067200L * 1000000L // 2024-01-01 00:00 UTC, micros
    def tsOf(us: Long) = new java.sql.Timestamp(us / 1000L)
    // Hot user 1: 900 events every 10 min, a >gap break every 13th →
    // multi-day sessions crossing day buckets. Cold users 2..101: 21
    // events each, alternating within-gap (20 min) and break (2 h).
    val hot = (0 until 900).map { i =>
      (i.toLong, tsOf(baseUs + i * 600L * 1000000L +
        (i / 13) * 7200L * 1000000L), 1L)
    }
    val cold = for (u <- 2L to 101L; j <- 0 until 21) yield
      (1000L + u * 100L + j,
        tsOf(baseUs + u * 31L * 1000000L + j * 1200L * 1000000L +
          (j % 3) * 7200L * 1000000L), u)
    val events = (hot ++ cold).toDF("event_id", "ts", "user_id")
    assert(hot.size.toDouble / (hot.size + cold.size) > 0.29)
    val plain = Events.sessionize(events, 1800L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val two = Events.sessionize2Level(events, 1800L)
    assert(two.as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      == plain, "2level must reproduce plain sessionize on skewed input")
    // Structural bound: level 1 exchanges on (user_id, bucket) — the
    // hot user never lands on one task …
    val plan = planString(two)
    assert(
      "hashpartitioning\\(user_id[^)]*bucket".r.findFirstIn(plan).isDefined,
      s"level-1 exchange must key on (user_id, bucket):\n$plan")
    // … and the data agrees: the hot user's largest (user, day) group
    // is a small fraction of their 900 events.
    val maxDay = events.where($"user_id" === 1L)
      .groupBy(floor(unix_micros($"ts") / (86400L * 1000000L)))
      .count().agg(max("count")).as[Long].head()
    assert(maxDay <= 200,
      s"hot user's largest day bucket held $maxDay of 900 events")
  }

  test("skew: asofJoin2Level on a 30%-hot key matches plain asofJoin; " +
      "the carry window keys on (key, bucket)") {
    import spark.implicits._
    // Left: 1500 probes, 450 on hot key 1, irregular times. Right: 20
    // keys, a value every 500 ticks. bucketWidth 1000 → the hot key
    // spans ~44 buckets.
    val left = (0 until 1500).map { i =>
      val k = if (i < 450) 1L else 2L + (i % 19).toLong
      (k, (i * 29L) % 43700L, i.toLong)
    }.toDF("key", "t", "probe_id")
    val right = (for (k <- 1L to 20L; j <- 0 until 80) yield
      (k, j * 500L + k, j * 1000L + k)).toDF("key", "t", "v")
    val plain = Joins.asofJoin(left, right, "key", "t", Seq("v"))
      .select("key", "t", "probe_id", "v")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val two = Joins.asofJoin2Level(left, right, "key", "t", Seq("v"),
      bucketWidth = 1000L)
    assert(two.select("key", "t", "probe_id", "v")
      .as[(Long, Long, Long, Option[Long])].collect().toSet == plain,
      "2level must reproduce plain asofJoin on skewed input")
    val plan = planString(two)
    assert(
      "hashpartitioning\\(key[^)]*__bucket".r.findFirstIn(plan).isDefined,
      s"level-1 carry must key on (key, __bucket):\n$plan")
  }

  test("skew: saltedJoin on a 30%-hot fact key matches the plain join " +
      "and spreads the hot key across salts") {
    import spark.implicits._
    val salts = 8
    val fact = (0 until 2000).map { i =>
      (if (i < 600) 1L else 2L + (i % 19).toLong, i.toLong)
    }.toDF("key", "v")
    val dim = (1L to 20L).map(k => (k, s"name_$k")).toDF("key", "name")
    val plain = fact.join(dim, Seq("key"))
      .as[(Long, Long, String)].collect().toSet
    val salted = Joins.saltedJoin(fact, dim, "key", salts)
    assert(salted.as[(Long, Long, String)].collect().toSet == plain,
      "salted join must reproduce the plain join on skewed input")
    // The salt is deterministic (hash of all fact columns mod salts):
    // recompute it for the hot key's rows and require a real spread —
    // the hot key's 600 rows must land on most of the 8 salt reducers.
    val spread = fact.where($"key" === 1L)
      .select(pmod(hash($"key", $"v"), lit(salts)).as("salt"))
      .distinct().count()
    assert(spread >= salts / 2,
      s"hot key spread over only $spread of $salts salts")
  }

  test("sim_knn_graph: the corpus self-join shuffles on the bucket " +
      "key once size-based broadcast is off (no broadcast HINT on a " +
      "corpus side) and ranks via partial bounded heaps") {
    // At fixture scale AQE rightly broadcasts the tiny side; the
    // scale property under test is that the PLAN carries no broadcast
    // hint — with size-based broadcast disabled the bucket join must
    // degrade to a shuffle join, which is what a 10⁹-vector corpus
    // would run.
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planString(Registry.queries("sim_knn_graph")(spark, dir))
      val cand = plan.split("\n").filter(l =>
        l.contains("Join") && l.contains("bucket"))
      assert(cand.nonEmpty && cand.forall(l => !l.contains("Broadcast")),
        s"bucket join must not broadcast a corpus side:\n$plan")
      // Two-phase exact top-k: the bounded-heap aggregate must appear
      // in partial (map-side) mode before the final per-node merge.
      assert(plan.contains("ObjectHashAggregate"), s"plan was:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q18_big_orders: the quantity rollup's HAVING cut runs BELOW " +
      "the customer join") {
    val plan = planString(Registry.queries("q18_big_orders")(spark, dir))
    // Bottom-up: partial agg on l_orderkey, its sum filter, THEN the
    // joins. toString prints top-down, so the deepest HashAggregate
    // must sit at a later index than every join.
    val lastJoin = Seq("BroadcastHashJoin", "SortMergeJoin",
      "ShuffledHashJoin").map(plan.lastIndexOf).max
    val deepAgg = plan.lastIndexOf("HashAggregate")
    assert(deepAgg > lastJoin,
      s"quantity rollup must run below the joins:\n$plan")
    assert(plan.contains("TakeOrdered"), s"plan was:\n$plan")
  }

  test("gr_kcore: the returned plan is flat (checkpointed peeled " +
      "edges, no join history), and a single peel round semi-joins " +
      "the broadcast survivor set") {
    // The registry query's final plan: every peel round is sealed
    // behind its checkpoint, so the visible plan must be the flat
    // degree count over an ExistingRDD — constant in `rounds`.
    val plan = planString(Registry.queries("gr_kcore")(spark, dir))
    assert(plan.contains("ExistingRDD") && !plan.contains("Join"),
      s"plan was:\n$plan")
    // One round's INTERNAL shape (pre-checkpoint): both survivor
    // semi-joins broadcast the node-sized keep set.
    import spark.implicits._
    val e = (for { a <- 0L to 5L; b <- 0L to 5L if a != b } yield (a, b))
      .toList.toDF("src", "dst")
    val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
      .where($"d" >= 3).select($"src".as("n"))
    val round = e
      .join(broadcast(keep.select($"n".as("src"))), Seq("src"), "left_semi")
      .join(broadcast(keep.select($"n".as("dst"))), Seq("dst"), "left_semi")
    val rp = planString(round)
    assert(rp.contains("BroadcastHashJoin") && rp.contains("LeftSemi"),
      s"round plan was:\n$rp")
  }

  test("correlated subqueries decorrelate: q4/q17/q21 carry ZERO " +
      "surviving subquery expressions; semi/anti joins replace them") {
    // The 100 TB claim behind RegistryOlap: the correlated form the
    // user writes must become ordinary joins (RewritePredicateSubquery
    // / RewriteCorrelatedScalarSubquery), never a per-outer-row
    // re-execution. A surviving SubqueryExpression in the OPTIMIZED
    // plan is exactly that regression.
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    def subqueryCount(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p =>
        p.expressions
          .map(_.collect { case s: SubqueryExpression => s }.size).sum
      }.sum

    val q4 = Registry.queries("q4_exists")(spark, dir)
    assert(subqueryCount(q4) == 0, "q4 EXISTS must decorrelate")
    assert(planString(q4).contains("LeftSemi"),
      "q4 must plan the EXISTS as a left semi join")

    val q17 = Registry.queries("q17_small_qty")(spark, dir)
    assert(subqueryCount(q17) == 0,
      "q17 correlated scalar aggregate must decorrelate")
    val p17 = planString(q17)
    assert(p17.contains("Join"),
      s"q17 threshold must join back, not re-execute per row:\n$p17")

    val q21 = Registry.queries("q21_waiting")(spark, dir)
    assert(subqueryCount(q21) == 0,
      "q21 EXISTS + NOT EXISTS must both decorrelate")
    val p21 = planString(q21)
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"q21 needs one semi and one anti join:\n$p21")
  }

  test("ds_exists_pair: the OR-of-EXISTS pair plans as ExistenceJoins " +
      "(flags, not filters); the conjunctive EXISTS stays a LeftSemi; " +
      "zero surviving subquery expressions") {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    val q = Registry.queries("ds_exists_pair")(spark, dir)
    val survivors = q.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect { case s: SubqueryExpression => s })
    }.flatten
    assert(survivors.isEmpty,
      s"OR-of-EXISTS must fully decorrelate; survivors: $survivors")
    val p = planString(q)
    // A semi join would FILTER and break OR semantics — the disjuncts
    // must materialize as boolean existence flags.
    assert(p.contains("ExistenceJoin"),
      s"disjunctive EXISTS branches must be ExistenceJoins:\n$p")
    assert(p.contains("LeftSemi"),
      s"the conjunctive EXISTS must remain a plain semi join:\n$p")
  }

  test("ds_yoy_growth: the 4-reference year/channel CTE prunes to 2 " +
      "lineitem scans (constant channel predicates eliminate the other " +
      "UNION branch per reference) and the year predicate lands on the " +
      "orders scan, below each per-branch aggregate") {
    val q = Registry.queries("ds_yoy_growth")(spark, dir)
    val p = planString(q)
    // The AQE string prints Final AND Initial plans — count scans in
    // the final section only.
    val finalP = p.split("== Initial Plan ==").head
    val lineitemScans =
      "lineitem\\.parquet".r.findAllIn(finalP).size
    assert(lineitemScans == 2,
      s"expected exactly 2 lineitem scans (order-channel references " +
        s"must not scan the fact table), got $lineitemScans:\n$p")
    // The year filter must be a DATA filter on the orders scan — below
    // the aggregate — not a post-aggregate filter over seven years.
    assert(p.contains("year(cast(o_orderdate"),
      s"year predicate must reach the orders scan:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      s"the custkey self-joins must stay equi-joins:\n$p")
  }

  test("q22: correlated NOT EXISTS decorrelates to a LeftAnti; only " +
      "the uncorrelated scalar average survives as a one-shot subquery") {
    import org.apache.spark.sql.catalyst.expressions.{
      ScalarSubquery, SubqueryExpression}
    val q22 = Registry.queries("q22_prospects")(spark, dir)
    val survivors = q22.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect { case s: SubqueryExpression => s })
    }.flatten
    // Exactly one survivor, scalar and UNCORRELATED (executed once,
    // broadcast as a literal — not per-row work).
    assert(survivors.size == 1 &&
      survivors.head.isInstanceOf[ScalarSubquery] &&
      survivors.head.children.isEmpty,
      s"survivors: $survivors")
    assert(planString(q22).contains("LeftAnti"))
  }

  test("TPC-H breadth decorrelates: q2/q20 carry no surviving " +
      "subqueries; q15/q11 keep only uncorrelated one-shot scalars; " +
      "q16's NOT IN is a null-aware anti join, never a nested loop") {
    import org.apache.spark.sql.catalyst.expressions.{
      ScalarSubquery, SubqueryExpression}
    def survivors(df: DataFrame) =
      df.queryExecution.optimizedPlan.collect { case p =>
        p.expressions.flatMap(_.collect { case s: SubqueryExpression => s })
      }.flatten

    // q2: correlated scalar MIN over a two-table subquery → per-part
    // aggregate joined back, zero surviving subqueries.
    val q2 = Registry.queries("q2_min_supplier")(spark, dir)
    assert(survivors(q2).isEmpty, "q2 correlated MIN must decorrelate")
    assert(planString(q2).contains("Join"))

    // q20: IN over (IN + grouped HAVING) → stacked semi joins, zero
    // surviving subqueries.
    val q20 = Registry.queries("q20_nested_in")(spark, dir)
    assert(survivors(q20).isEmpty, "q20 nested IN must decorrelate")
    assert(planString(q20).contains("LeftSemi"))

    // q15 / q11: the only survivors are UNCORRELATED scalars —
    // executed once, broadcast as literals, never per-row work.
    val s15 = survivors(Registry.queries("q15_top_supplier")(spark, dir))
    assert(s15.size == 1 && s15.head.isInstanceOf[ScalarSubquery] &&
      s15.head.children.isEmpty, s"q15 survivors: $s15")
    val s11 = survivors(
      Registry.queries("q11_important_parts")(spark, dir))
    assert(s11.size == 2 &&
      s11.forall(s => s.isInstanceOf[ScalarSubquery] &&
        s.children.isEmpty), s"q11 survivors: $s11")

    // q16: single-column NOT IN — the null-aware anti join; a plan
    // that degrades to a per-row nested loop would die at scale.
    val p16 = planString(Registry.queries("q16_supplier_cnt")(spark, dir))
    assert(p16.contains("LeftAnti") && !p16.contains("Cartesian"),
      s"q16 must plan an anti join:\n$p16")
  }

  test("lat_topn_per_group: the LATERAL ORDER BY+LIMIT subquery " +
      "decorrelates to a window-rank filter join — no per-outer-row " +
      "re-execution, no nested loop") {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    val df = Registry.queries("lat_topn_per_group")(spark, dir)
    val survivors = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect { case s: SubqueryExpression => s })
    }.flatten
    assert(survivors.isEmpty,
      s"lateral subquery must decorrelate: $survivors")
    val plan = planString(df)
    // Decorrelation turns the per-row LIMIT into a rank computation —
    // and this engine's own TopKPerKey rewrite then replaces the
    // window-rank with a bounded per-key heap (no per-group sort at
    // all). Accept either; what must NOT appear is a per-row loop.
    assert(plan.contains("TopKPerKey") || plan.contains("Window"),
      s"per-group LIMIT must become a rank/heap, not re-execution:\n$plan")
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"lateral must not plan a per-row loop:\n$plan")
  }

  test("q19 disjunctive predicates: the equi conjunct stays a hash " +
      "join and the OR'd per-side predicates reach both parquet scans") {
    val df = Registry.queries("q19_disjunctive")(spark, dir)
    val plan = planString(df)
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"q19 must keep the equi join:\n$plan")
    // Catalyst's CNF extraction must derive a per-side filter from the
    // OR groups: the part scan's pushed filters mention p_brand, the
    // lineitem scan's mention l_quantity.
    val scans = plan.linesIterator.filter(_.contains("PushedFilters"))
      .toSeq
    assert(scans.exists(_.contains("p_brand")),
      s"part-side OR filter must push down:\n${scans.mkString("\n")}")
    assert(scans.exists(_.contains("l_quantity")),
      s"lineitem-side OR filter must push down:\n${scans.mkString("\n")}")
  }

  test("unigram tokenizer: document TEXT never reaches an exchange — " +
      "every shuffle carries word/piece-sized rows only") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    def exchanges(p: SparkPlan): Seq[Exchange] = p.collect {
      case e: Exchange => Seq(e)
      case q: QueryStageExec => exchanges(q.plan)
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
    }.flatten
    for (q <- Seq("tx_unigram_encode", "tx_unigram_em",
        "tx_unigram_vocab")) {
      val df = Registry.queries(q)(spark, dir)
      df.collect()
      val ex = exchanges(df.queryExecution.executedPlan)
      assert(ex.nonEmpty, s"$q should shuffle word-sized relations")
      val carrying = ex.filter(_.output.exists(_.name == "text"))
      assert(carrying.isEmpty,
        s"$q must not shuffle document text:\n${carrying.mkString("\n")}")
    }
  }

  /** Max shuffle-read RECORDS over all tasks of `action` — the
    * deterministic proxy for per-task time in a linear pass (same rows
    * → same work; wall-clock is noisy on a shared host). */
  private def maxTaskShuffleRecords(action: => Unit): Long = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val perTask = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) perTask.add(m.shuffleReadMetrics.recordsRead)
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      action
      org.apache.spark.graftbridge.ListenerBridge.drain(sc, 30000L)
    } finally sc.removeSparkListener(listener)
    var max = 0L
    perTask.forEach(r => max = math.max(max, r))
    max
  }

  test("skew evidence: plain asofJoin's window exchange lands the hot " +
      "key's rows on ONE task; asofJoin2Level's largest task is " +
      "bucket-bounded (measured per-task shuffle-read distribution)") {
    // The 1-level degradation, MEASURED — not just the exchange key
    // asserted structurally above. AQE off for the measurement: AQE
    // cannot skew-split a window exchange anyway (the partition key
    // itself must bound the task — exactly what is under test), and
    // toy-scale partition coalescing would blur which rows share a
    // task.
    import spark.implicits._
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 36k probes, 80% on hot key 1; 20 right keys × 200 ticks.
      // The action SUMS the carried column — count() alone would let
      // Catalyst prune the unreferenced window (and its exchange)
      // right out of the plan, measuring nothing.
      val hotRows = 28800
      val taggedTotal = 36000 + 4000 // probes + right rows, unioned
      val left = spark.range(36000).select(
        when($"id" < hotRows, 1L)
          .otherwise(lit(2L) + pmod($"id", lit(19L))).as("key"),
        ($"id" * 29L % 50000L).as("t"), $"id".as("probe_id"))
      val right = spark.range(20L * 200L).select(
        ($"id" % 20L + 1L).as("key"),
        (($"id" / 20L) * 250L + $"id" % 20L).as("t"),
        $"id".as("v"))
      left.cache().count(); right.cache().count()
      try {
        val max1 = maxTaskShuffleRecords(
          Joins.asofJoin(left, right, "key", "t", Seq("v"))
            .agg(sum($"v")).collect())
        val max2 = maxTaskShuffleRecords(
          Joins.asofJoin2Level(left, right, "key", "t", Seq("v"),
            bucketWidth = 1000L).agg(sum($"v")).collect())
        // 1-level: one task reads AT LEAST every hot-key row (left
        // probes + that key's right rows) — the whole key on one task.
        assert(max1 >= hotRows,
          s"plain asofJoin hot task read $max1 < $hotRows records")
        // 2-level: the largest task holds key-BUCKETS, not keys — no
        // task is lower-bounded by the hot key any more, and the
        // distribution sits near ideal flatness (test session runs 4
        // shuffle partitions).
        val flat = taggedTotal / 4
        assert(max2 < hotRows && max2 <= 2 * flat,
          s"2level max task $max2 vs hot $hotRows, ideal-flat $flat " +
            s"(1level max was $max1)")
      } finally { left.unpersist(); right.unpersist() }
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("skew evidence: plain sessionize concentrates a hot user on one " +
      "task; sessionize2Level's largest task is day-bounded (measured)") {
    import spark.implicits._
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val baseUs = 1704067200L * 1000000L // 2024-01-01 00:00 UTC
      val hotRows = 32000L
      val total = 40000
      // Hot user 1: 32k events, 96 s apart → 900/day over ~36 days.
      // Cold users 2..51: 160 events each (8k total).
      val events = spark.range(total).select(
        $"id".as("event_id"),
        when($"id" < hotRows, 1L)
          .otherwise(lit(2L) + pmod($"id", lit(50L))).as("user_id"),
        timestamp_micros(
          when($"id" < hotRows, lit(baseUs) + $"id" * 96L * 1000000L)
            .otherwise(lit(baseUs) + $"id" * 17L * 1000000L)).as("ts"))
      events.cache().count()
      try {
        val max1 = maxTaskShuffleRecords(
          Events.sessionize(events, 1800L).count())
        val max2 = maxTaskShuffleRecords(
          Events.sessionize2Level(events, 1800L).count())
        assert(max1 >= hotRows,
          s"plain sessionize hot task read $max1 < $hotRows records")
        // (user, day) partitioning: no task lower-bounded by the hot
        // user; distribution near ideal flatness at 4 shuffle
        // partitions.
        val flat = total / 4
        assert(max2 < hotRows && max2 <= 2 * flat,
          s"2level max task $max2 vs hot $hotRows, ideal-flat $flat " +
            s"(1level max was $max1)")
      } finally events.unpersist()
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("e1 page feed: plucking one schedule prunes the from_json parse " +
      "schema to that schedule (nested JSON pruning)") {
    import org.apache.spark.sql.catalyst.expressions.JsonToStructs
    import org.apache.spark.sql.types.StructType
    val pages = graft.sources.Form700Source.readPages(spark,
      s"${graft.operators.Form700Pipeline.defaultPagesRoot}/schedules")
    val one = graft.sources.Form700Source.schedule(pages, "scheduleA1")
    val parseSchemas = one.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case j: JsonToStructs => j.schema
      })
    }.flatten
    assert(parseSchemas.nonEmpty, "expected a from_json parse in the plan")
    val names = parseSchemas.flatMap {
      case s: StructType => s.fieldNames.toSeq
      case _ => Nil
    }.toSet
    assert(names.contains("scheduleA1"),
      s"plucked schedule must stay in the parse schema: $names")
    assert(!names.contains("scheduleB") && !names.contains("comments"),
      s"unplucked schedules must be pruned from the parse schema " +
        s"(the full page object would be decoded for every table): $names")
    // the result is still correct under the pruned parse
    assert(one.count() > 0)
  }

  test("nested parquet scan prunes unread struct fields (ReadSchema " +
      "carries only the plucked subfield)") {
    val pagesDir = graft.Scratch.dir("pq_nested_prune")
    graft.sources.Form700Source.readPages(spark,
      s"${graft.operators.Form700Pipeline.defaultPagesRoot}/cover")
      .write.mode("overwrite").parquet(pagesDir)
    val rd = spark.read.parquet(pagesDir)
      .select(explode(col("filings")).as("f"))
      .select(col("f.filerName"))
    val plan = planString(rd)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("filerName"),
      s"plucked nested field must be read: $readSchema")
    assert(!readSchema.contains("departmentName") &&
      !readSchema.contains("offices"),
      s"sibling struct fields must not be read — at 100 TB this is the " +
        s"difference between scanning one column and the whole nested " +
        s"blob: $readSchema")
  }

  test("bucket pruning: an equality point lookup reads 1 of 8 buckets") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    Joins.writeBucketed(li, "pq_li_bprune", "l_orderkey", 8)
    // The planner drops bucketed-scan mode when nothing in the plan
    // needs the hash distribution (better split parallelism); disable
    // that heuristic so the scan keeps bucket identity and the
    // equality predicate can prune to one bucket's files.
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark.conf.set(autoKey, "false")
    try {
      val key = spark.table("pq_li_bprune").select(min("l_orderkey"))
        .head().getLong(0)
      val q = spark.table("pq_li_bprune")
        .where(col("l_orderkey") === key)
      val plan = planString(q)
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"point lookup must prune to one bucket:\n$plan")
      assert(q.count() > 0)
    } finally {
      spark.conf.unset(autoKey)
      spark.sql("DROP TABLE IF EXISTS pq_li_bprune")
    }
  }

  test("bucket-count mismatch (8 vs 16): coalescing reads 16 as 8 and " +
      "joins with NO exchange; without it at least one side re-shuffles") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Joins.writeBucketed(li, "pq_li_b8", "l_orderkey", 8)
    Joins.writeBucketed(ord, "pq_ord_b16", "l_orderkey", 16)
    val conf = spark.conf
    val threshold = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def exchanges(): Int = {
      val joined = spark.table("pq_li_b8")
        .join(spark.table("pq_ord_b16"), Seq("l_orderkey"))
      val plan = planString(joined).split("== Initial Plan ==").head
      "Exchange hashpartitioning".r.findAllIn(plan).length
    }
    try {
      // Operational default for mixed-bucket-count tables: coalesce the
      // finer side down (16 → 8, within the 4× ratio cap) — the join
      // stays exchange-free, each 8-bucket task reading two of the 16.
      conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      assert(exchanges() == 0,
        "bucket coalescing must make the mismatched join exchange-free")
      // Without coalescing the bucket layouts are incompatible and at
      // least one side pays a full shuffle — the cost the single
      // bucket-count convention exists to avoid.
      conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")
      assert(exchanges() >= 1,
        "without coalescing a mismatched bucket join must re-shuffle")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      conf.unset("spark.sql.bucketing.coalesceBucketsInJoin.enabled")
      spark.sql("DROP TABLE IF EXISTS pq_li_b8")
      spark.sql("DROP TABLE IF EXISTS pq_ord_b16")
    }
  }

  test("ev_dpp_join: the fact scan carries a DYNAMIC partition-pruning " +
      "filter fed by the dim's runtime values (and none when DPP is off)") {
    def plan(): String = {
      val df = Registry.queries("ev_dpp_join")(spark, dir)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val withDpp = plan()
    assert(withDpp.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$withDpp")
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    spark.conf.set(key, "false")
    try assert(!plan().contains("dynamicpruning"),
      "control: no DPP filter when the optimizer feature is disabled")
    finally spark.conf.unset(key)
  }

  test("runtime bloom-filter join pruning: a selective dim filter " +
      "injects a bloom probe into the fact side of a shuffle join " +
      "(the row-level sibling of DPP for non-partitioned keys)") {
    // Spec-only by design: the bloom filter is semantically transparent
    // (same rows, earlier), so a registry oracle would add nothing —
    // the PLAN property is the substance. Thresholds are production-
    // scale (creation 10 MB / application 10 GB), so at fixture scale
    // they must be floored to see the injection at all.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
    def planOf(): String = {
      val fact = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val dim = Tables.load(spark, dir, "orders")
        .where(col("o_totalprice") < lit(6000.0))
        .select("o_orderkey", "o_totalprice")
      fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.optimizedPlan.toString
    }
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // creationSideThreshold is a MAXIMUM (the dim must be small
      // enough to build a bloom filter from); applicationSideScanSize-
      // Threshold is a MINIMUM (the fact must be big enough to be
      // worth pruning) — floor only the minimum.
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      // shuffle join — the case where pre-shuffle row pruning pays
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val withBloom = planOf()
      assert(withBloom.toLowerCase.contains("might_contain"),
        s"fact side must probe the dim's bloom filter pre-shuffle:\n$withBloom")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(!planOf().toLowerCase.contains("might_contain"),
        "control: no probe when the feature is disabled")
    } finally restore()
  }

  // -------------------------------------------------------------------
  // Cost-based optimization: ANALYZE stats must actually drive the plan
  // -------------------------------------------------------------------

  /** Innermost join of the optimized plan (pre-order collect → last). */
  private def innermostJoin(df: DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.last.toString

  test("CBO: ANALYZE column stats flip the 3-way join order away from " +
      "the syntactic (big-join-first) order") {
    // stats present (ensureStatsTables ANALYZEs rowCount + join-key
    // NDVs): CostBasedJoinReorder must join customer with the tiny
    // filtered nation FIRST, pushing the orders join out
    RegistryCbo.ensureStatsTables(spark, dir)
    val reordered = innermostJoin(spark.sql(RegistryCbo.cboSql))
    assert(reordered.contains("graft_cbo_nation") &&
      !reordered.contains("graft_cbo_orders"),
      s"with stats the innermost join must pair customer with nation:\n$reordered")

    // negative control: IDENTICAL SQL over stats-less catalog copies of
    // the same files — no rowCount means no reorder, so the syntactic
    // order (customer ⋈ orders innermost) must survive
    Seq("customer", "orders", "nation").foreach { tn =>
      spark.sql(s"DROP TABLE IF EXISTS pq_nostats_$tn")
      spark.sql(s"CREATE TABLE pq_nostats_$tn USING parquet " +
        s"LOCATION '$dir/$tn.parquet'")
    }
    try {
      val syntactic = innermostJoin(spark.sql(
        RegistryCbo.cboSql.replace("graft_cbo_", "pq_nostats_")))
      assert(syntactic.contains("pq_nostats_orders"),
        s"without stats the syntactic join order must survive:\n$syntactic")
    } finally Seq("customer", "orders", "nation").foreach(tn =>
      spark.sql(s"DROP TABLE IF EXISTS pq_nostats_$tn"))
  }

  test("CBO: ANALYZE rowCount+column stats shrink a filtered side below " +
      "the broadcast threshold and flip sort-merge to broadcast-hash") {
    // Without column stats the planner cannot estimate a filter's
    // selectivity: the filtered orders side keeps its full file-size
    // estimate (pruned-column estimate ~12 KB > the 4 KB threshold) and the join stays
    // sort-merge. ANALYZE … FOR COLUMNS gives rowCount + min/max, the
    // ~1% range predicate estimates to a few hundred bytes, and the
    // SAME query statically selects a broadcast join. (sparkPlan = the
    // static pre-AQE selection — exactly what stats feed; AQE can
    // rescue single queries at runtime but only static stats fix the
    // plan BEFORE the shuffle is laid down.)
    Seq("lineitem", "orders").foreach { tn =>
      spark.sql(s"DROP TABLE IF EXISTS pq_bcast_$tn")
      spark.sql(s"CREATE TABLE pq_bcast_$tn USING parquet " +
        s"LOCATION '$dir/$tn.parquet'")
    }
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4KB")
    try {
      def staticPlan(): String = spark.sql(
        """SELECT l_orderkey, l_quantity, o_totalprice
          |FROM pq_bcast_lineitem JOIN pq_bcast_orders
          |  ON l_orderkey = o_orderkey
          |WHERE o_totalprice < 6000.0""".stripMargin)
        .queryExecution.sparkPlan.toString
      val before = staticPlan()
      assert(!before.contains("BroadcastHashJoin"),
        s"no column stats → full-size filter estimate → no broadcast:\n$before")
      spark.sql("ANALYZE TABLE pq_bcast_orders COMPUTE STATISTICS " +
        "FOR COLUMNS o_orderkey, o_totalprice")
      val after = staticPlan()
      assert(after.contains("BroadcastHashJoin"),
        s"ANALYZE stats must enable static broadcast selection:\n$after")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      Seq("lineitem", "orders").foreach(tn =>
        spark.sql(s"DROP TABLE IF EXISTS pq_bcast_$tn"))
    }
  }
}
