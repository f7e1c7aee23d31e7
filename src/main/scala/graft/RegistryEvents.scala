package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Events family of the extension registry — rollups, sessionization,
  * as-of/range joins, funnels, SCD2 (batch duals of the streaming
  * path). The sessionize/latest-snapshot/SCD2 oracle SQL is shared
  * with [[RegistryStreaming]] (stream/batch parity proof). See
  * [[RegistryShared]]. */
private[graft] trait RegistryEvents extends RegistryShared {
  // ---------------------------------------------------------------------
  // Events (batch duals of the streaming path)
  // ---------------------------------------------------------------------

  // GK-sketch accuracy for ev_quantiles_approx: rank guarantee n/100
  // (1%), the same ε the grade band uses.
  private val QuantAccuracy = 100

  // Count-min sketch width (buckets per hash row) and graded-key count
  // for ev_cms_eval. 64 buckets over ~1.5k distinct users guarantees
  // real collisions, so the overcount path is actually exercised.
  private val CmsW = 64
  private val CmsTopK = 25

  // KMV distinct-count sketch size for ev_kmv_distinct: 64 minima over
  // ~1.5k distinct users per type keeps the estimate path (kmv_size = k)
  // exercised at every scale step while the below-k exact path is
  // covered by the spec's small fixtures.
  private val KmvK = 64

  /** Deterministic replay of [[Events.cmsFreqEval]]: the d affine hash
    * rows are a VALUES CTE built from the SAME [[Events.CmsA]]/
    * [[Events.CmsB]]/[[Events.CmsP]] constants the plan uses, so cells,
    * estimates, overcounts, and bound flags are exact integer matches —
    * no grade-band hedging (unlike the HLL/GK evals, CMS is replayable). */
  private def cmsOracle(w: Int, topK: Int): String = {
    val p = Events.CmsP
    val rows = Events.CmsA.indices
      .map(j => s"($j, ${Events.CmsA(j)}, ${Events.CmsB(j)})")
      .mkString(", ")
    s"""WITH base AS (SELECT CAST(user_id AS BIGINT) AS key FROM events),
       |h(j, a, b) AS (VALUES $rows),
       |cells AS (SELECT h.j, ((h.a * base.key + h.b) % $p) % $w AS bucket,
       |    count(*) AS c
       |  FROM base CROSS JOIN h GROUP BY 1, 2),
       |tk AS (SELECT key, count(*) AS true_cnt FROM base GROUP BY key
       |  ORDER BY true_cnt DESC, key LIMIT $topK),
       |n AS (SELECT count(*) AS n FROM base),
       |est AS (SELECT tk.key, tk.true_cnt, min(c.c) AS est_cnt
       |  FROM tk CROSS JOIN h
       |  JOIN cells c ON c.j = h.j
       |    AND c.bucket = ((h.a * tk.key + h.b) % $p) % $w
       |  GROUP BY tk.key, tk.true_cnt)
       |SELECT est.key, est.true_cnt, est.est_cnt,
       |  est.est_cnt - est.true_cnt AS overcount,
       |  (est.est_cnt - est.true_cnt) <= (3 * n.n) // $w AS within_bound
       |FROM est CROSS JOIN n
       |ORDER BY true_cnt DESC, key""".stripMargin
  }

  /** Once-per-(session, sfDir) materialization of the Hive-partitioned
    * events fact + the DPP dim — the `RegistryCbo.ensureStatsTables`
    * pattern. Bench reps must time the pruned READ, not a repeated
    * rewrite of the whole events table (which also leaked one scratch
    * dir per invocation until JVM exit). Keyed on the session OBJECT
    * via WeakHashMap (an identity-hash key can be reused after a
    * stopped session is GC'd, falsely marking a fresh session
    * prepared; the weak key lets stopped sessions collect). */
  private val partLayouts =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, (String, String)]]()

  /** The partition-pruned click rollup — shared by the batch
    * (`ev_partition_prune`) and streaming (`st_partition_prune`)
    * formulations: both must equal the raw-table WHERE rollup. */
  protected lazy val partitionPruneOracleSql: String =
    """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
      |  count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
      |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
      |FROM events WHERE event_type = 'click'
      |GROUP BY 1, 2 ORDER BY hour""".stripMargin

  protected def ensurePartitionedEvents(s: SparkSession,
                                        dir: String): (String, String) =
    partLayouts.synchronized {
      partLayouts.computeIfAbsent(s,
          _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate(dir, {
          val ev = t(s, dir, "events")
          val factDir = graft.Scratch.dir("graft_dpp_fact")
          Layout.writePartitioned(ev, factDir, "event_type")
          val dimDir = graft.Scratch.dir("graft_dpp_dim")
          ev.select(col("event_type")).distinct()
            .withColumn("cat",
              when(col("event_type").isin("click", "purchase"), lit("conv"))
                .otherwise(lit("other")))
            .coalesce(1).write.mode("overwrite").parquet(dimDir)
          (factDir, dimDir)
        })
    }

  protected val events: Map[String, Q] = Map(
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
    // actually runs). Hash-checked through the grading wrapper: the
    // output carries the EXACT columns plus `hll_ok` (estimate within
    // the 5% EventsSpec bar), so the oracle is the exact rollup + TRUE.
    "ev_hourly_rollup_approx" -> ((s, dir) =>
      Events.approxRollupEval(
        Events.hourlyRollupApprox(t(s, dir, "events")),
        t(s, dir, "events"), HllBoundPpm)
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
    // KMV distinct-count sketch graded against the exact count — the
    // bounded-state (k longs/key) mergeable cardinality sketch whose
    // ESTIMATE is deterministic and cross-engine replayable (unlike
    // HLL, which grades against a band); the oracle reproduces the
    // k-minima with a row_number prefix over the same md5 hash.
    "ev_kmv_distinct" -> ((s, dir) =>
      Events.kmvDistinctEval(t(s, dir, "events"), "event_type", "user_id",
        KmvK)
        .orderBy("event_type")),
    // KMV set algebra: pairwise union/intersection cardinality from
    // the bounded sketches alone (θ-sketch inclusion–exclusion),
    // graded against the exact overlap — the sketch-only form of
    // ev_overlap_matrix. Deterministically replayable like
    // ev_kmv_distinct (row_number prefixes + re-ranked pairwise merge).
    "ev_kmv_overlap" -> ((s, dir) =>
      Events.kmvOverlapEval(t(s, dir, "events"), "event_type", "user_id",
        KmvK)
        .orderBy("type_a", "type_b")),
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
    // Sketch twin of ev_quantiles under the error-graded eval
    // convention (see ev_hourly_rollup_approx): Greenwald-Khanna
    // estimates graded against their rank guarantee in integer ppm;
    // output is exact counts + booleans, oracle is literal TRUEs.
    "ev_quantiles_approx" -> ((s, dir) =>
      Events.quantilesApproxEval(t(s, dir, "events"), QuantAccuracy)
        .orderBy("event_type")),
    // Count-min sketch frequency estimation, graded per key against
    // the exact counts — fixed d·w sketch state no matter the key
    // cardinality; deterministic affine hashes make the whole thing
    // (cells, estimates, overcounts) exactly replayable in the oracle.
    "ev_cms_eval" -> ((s, dir) =>
      Events.cmsFreqEval(t(s, dir, "events"), "user_id", CmsW, CmsTopK)
        .orderBy(col("true_cnt").desc, col("key"))),
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
      val (factDir, _) = ensurePartitionedEvents(s, dir)
      Events.hourlyRollup(
          s.read.parquet(factDir).where(col("event_type") === "click"))
        .orderBy("hour")
    }),
    // DYNAMIC partition pruning — the static prune above answers a
    // LITERAL predicate from the directory listing; here the partition
    // set is only knowable AT RUN TIME: the fact is Hive-partitioned on
    // event_type, the dim carries a category the fact doesn't have, and
    // the filter sits on the DIM. Catalyst inserts a DPP subquery into
    // the fact scan (PartitionFilters: [... dynamicpruning#N] — plan
    // pinned in PlanQualitySpec), reusing the join's broadcast as the
    // pruner, so only the matching type directories are listed/read. At
    // 100 TB this is THE scan saver for star joins on date/tenant-
    // partitioned facts — a selective dim filter prunes the fact scan
    // without any literal in the query text. The dim round-trips
    // through parquet so its values cannot constant-fold into a static
    // filter at plan time. Oracle = the same join over the raw table
    // with the dim derived in a CTE.
    "ev_dpp_join" -> ((s, dir) => {
      val (factDir, dimDir) = ensurePartitionedEvents(s, dir)
      val fact = s.read.parquet(factDir)
      val dim = s.read.parquet(dimDir).where(col("cat") === "conv")
      Events.hourlyRollup(fact.join(dim, Seq("event_type")))
        .orderBy("hour", "event_type")
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
    // TOLERANCE-bounded as-of: the backward match only counts within
    // 30 minutes (pandas merge_asof tolerance) — a stale click is a
    // NON-match, the feature-freshness guard. Oracle = DuckDB ASOF
    // with a distance CASE at the same constant.
    "ev_asof_tolerance" -> ((s, dir) =>
      asofViewClick(s, dir) { (views, clicks) =>
        Joins.asofJoinTolerance(views, clicks, "user_id", "us",
          Seq("click_us", "click_vm"), AsofToleranceUs)
      }),
    // NEAREST as-of join: each view matches the user's click CLOSEST
    // in time, either direction; a distance tie resolves backward
    // (pandas merge_asof direction='nearest'). Completes the
    // direction family: backward / forward / nearest, each ±2-level.
    // Oracle = both DuckDB ASOF directions stitched with the same
    // integer distance CASE.
    "ev_asof_nearest" -> ((s, dir) =>
      asofViewClick(s, dir) { (views, clicks) =>
        Joins.asofJoinNearest(views, clicks, "user_id", "us",
          "event_id", Seq("click_us", "click_vm"))
      }),
    // The nearest direction's hot-key-safe form: 2-level directional
    // carries under the same stitch — SAME oracle as the plain
    // nearest (the equivalence contract all the 2-level twins carry).
    "ev_asof_nearest_2level" -> ((s, dir) =>
      asofViewClick(s, dir) { (views, clicks) =>
        Joins.asofJoinNearest(views, clicks, "user_id", "us",
          "event_id", Seq("click_us", "click_vm"),
          bucketWidth = Some(86400L * 1000000L))
      }),
    // FORWARD as-of join: every view picks up the user's EARLIEST
    // click at-or-after it — the look-ahead twin (reversed carry
    // window, left-first tie order). Oracle = DuckDB's ASOF LEFT JOIN
    // with the <= comparison, its native forward direction.
    "ev_asof_forward" -> ((s, dir) =>
      asofViewClick(s, dir) { (views, clicks) =>
        Joins.asofJoinForward(views, clicks, "user_id", "us",
          Seq("click_us", "click_vm"))
      }),
    // The forward direction's hot-key-safe two-level form — SAME
    // oracle as ev_asof_forward (value-for-value match proves the
    // later-bucket boundary repair reproduces the plain carry).
    "ev_asof_forward_2level" -> ((s, dir) =>
      asofViewClick(s, dir) { (views, clicks) =>
        Joins.asofJoinForward2Level(views, clicks, "user_id", "us",
          Seq("click_us", "click_vm"), bucketWidth = 86400L * 1000000L)
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
  protected lazy val sessionizeOracleSql: String =
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
  protected lazy val latestSnapshotOracleSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |r AS (SELECT user_id, event_id, event_type, us,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, us AS last_us, event_id AS last_event_id,
      |  event_type AS last_type
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Nearest as-of oracle — both native ASOF directions stitched with
    * the integer distance compare (ties → backward); shared by the
    * plain and 2-level nearest forms. */
  protected lazy val asofNearestOracleSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
      |v AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'view'),
      |c AS (SELECT user_id, us AS click_us, max(vm) AS click_vm FROM e
      |  WHERE event_type = 'click' GROUP BY user_id, us),
      |b AS (SELECT v.event_id, c.click_us AS b_us, c.click_vm AS b_vm
      |  FROM v ASOF LEFT JOIN c
      |  ON v.user_id = c.user_id AND v.us >= c.click_us),
      |f AS (SELECT v.event_id, c.click_us AS f_us, c.click_vm AS f_vm
      |  FROM v ASOF LEFT JOIN c
      |  ON v.user_id = c.user_id AND v.us <= c.click_us)
      |SELECT v.user_id, v.event_id, v.us,
      |  COALESCE(CASE WHEN b_us IS NOT NULL AND
      |      (f_us IS NULL OR v.us - b_us <= f_us - v.us)
      |    THEN b_us ELSE f_us END, -1) AS click_us,
      |  COALESCE(CASE WHEN b_us IS NOT NULL AND
      |      (f_us IS NULL OR v.us - b_us <= f_us - v.us)
      |    THEN b_vm ELSE f_vm END, -1) AS click_vm
      |FROM v JOIN b USING (event_id) JOIN f USING (event_id)
      |ORDER BY event_id""".stripMargin

  // SCD2 run compression — shared verbatim by the batch build (ev_scd2)
  // and its streaming CDC dual (st_scd2): two implementations, one
  // contract, including the Long.MaxValue "current" sentinel.
  protected lazy val scd2OracleSql: String =
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
  // ev_hourly_rollup_approx IS oracle-checked: its Spark side emits the
  // exact columns plus a grading boolean (estimate within bound), so
  // the oracle is the exact rollup with a literal TRUE — see
  // Events.approxRollupEval.
  protected val eventsOracles: Map[String, String] = Map(
    "ev_hourly_rollup" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "ev_hourly_rollup_approx" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum,
        |  TRUE AS hll_ok
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "ev_sessionize" -> sessionizeOracleSql,
    "ev_sessionize_2level" -> sessionizeOracleSql,
    "ev_cms_eval" -> cmsOracle(CmsW, CmsTopK),
    "ev_bitmap_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // KMV replay: the k-minima of a fixed hash are a pure set property
    // of the input — a row_number prefix over the DISTINCT md5-derived
    // hashes reproduces the sketch (and hence the estimate) exactly.
    "ev_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
         |      AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM h),
         |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS kmv_size,
         |    max(h) AS kth_min
         |  FROM r WHERE rn <= $KmvK GROUP BY event_type),
         |ex AS (SELECT event_type,
         |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
         |  FROM events WHERE user_id IS NOT NULL GROUP BY event_type),
         |est AS (SELECT m.event_type, ex.exact_distinct, m.kmv_size,
         |    m.kth_min,
         |    CAST(CASE WHEN m.kmv_size < $KmvK THEN m.kmv_size
         |      ELSE ${KmvK - 1} * 4294967296 // m.kth_min END AS BIGINT)
         |      AS est_distinct
         |  FROM m JOIN ex USING (event_type))
         |SELECT event_type, exact_distinct, kmv_size, kth_min,
         |  est_distinct,
         |  abs(est_distinct - exact_distinct) * 1000000 // exact_distinct
         |    AS err_ppm
         |FROM est ORDER BY event_type""".stripMargin,
    // KMV set-algebra replay: per-type k-minima via row_number prefix
    // (as ev_kmv_distinct), pairwise MERGED sketch via a re-rank over
    // the deduped union of the two prefix sets (the k smallest of
    // S_A ∪ S_B — exactly what KmvMinHashes.merge keeps), common
    // values below θ counted with the same below-k exactness case.
    // Intersection error is relative to the exact union (the θ-sketch
    // guarantee scales with |A∪B|).
    "ev_kmv_overlap" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
         |      AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM h),
         |s AS (SELECT event_type, h FROM r WHERE rn <= $KmvK),
         |ks AS (SELECT DISTINCT event_type FROM s),
         |prs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
         |  FROM ks a JOIN ks b ON a.event_type < b.event_type),
         |uh AS (SELECT DISTINCT p.type_a, p.type_b, s.h
         |  FROM prs p JOIN s ON s.event_type IN (p.type_a, p.type_b)),
         |ur AS (SELECT type_a, type_b, h, row_number()
         |    OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn FROM uh),
         |m AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS kmv_size,
         |    max(h) AS theta
         |  FROM ur WHERE rn <= $KmvK GROUP BY type_a, type_b),
         |cmn AS (SELECT p.type_a, p.type_b, sa.h
         |  FROM prs p JOIN s sa ON sa.event_type = p.type_a
         |  JOIN s sb ON sb.event_type = p.type_b AND sb.h = sa.h),
         |cc AS (SELECT m.type_a, m.type_b, m.kmv_size, m.theta,
         |    CAST(count(c.h) FILTER (WHERE m.kmv_size < $KmvK
         |      OR c.h < m.theta) AS BIGINT) AS common
         |  FROM m LEFT JOIN cmn c
         |    ON c.type_a = m.type_a AND c.type_b = m.type_b
         |  GROUP BY m.type_a, m.type_b, m.kmv_size, m.theta),
         |du AS (SELECT DISTINCT event_type, user_id FROM events
         |  WHERE user_id IS NOT NULL),
         |ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
         |  FROM du GROUP BY event_type),
         |exb AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    CAST(count(*) AS BIGINT) AS exact_both
         |  FROM du a JOIN du b ON a.user_id = b.user_id
         |    AND a.event_type < b.event_type
         |  GROUP BY 1, 2),
         |est AS (SELECT c.type_a, c.type_b, ea.n AS n_a, eb.n AS n_b,
         |    coalesce(x.exact_both, 0) AS exact_both,
         |    ea.n + eb.n - coalesce(x.exact_both, 0) AS exact_union,
         |    c.kmv_size, c.theta, c.common,
         |    CAST(CASE WHEN c.kmv_size < $KmvK THEN c.kmv_size
         |      ELSE ${KmvK - 1} * 4294967296 // c.theta END AS BIGINT)
         |      AS union_est,
         |    CAST(CASE WHEN c.kmv_size < $KmvK THEN c.common
         |      ELSE c.common * 4294967296 // c.theta END AS BIGINT)
         |      AS inter_est
         |  FROM cc c JOIN ex ea ON ea.event_type = c.type_a
         |  JOIN ex eb ON eb.event_type = c.type_b
         |  LEFT JOIN exb x ON x.type_a = c.type_a AND x.type_b = c.type_b)
         |SELECT type_a, type_b, n_a, n_b, exact_both, exact_union,
         |  kmv_size, theta, common, union_est, inter_est,
         |  abs(union_est - exact_union) * 1000000 // exact_union
         |    AS union_err_ppm,
         |  abs(inter_est - exact_both) * 1000000 // exact_union
         |    AS inter_err_ppm
         |FROM est ORDER BY type_a, type_b""".stripMargin,
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
    "ev_partition_prune" -> partitionPruneOracleSql,
    "ev_dpp_join" ->
      """WITH dim AS (SELECT DISTINCT event_type,
        |  CASE WHEN event_type IN ('click', 'purchase')
        |    THEN 'conv' ELSE 'other' END AS cat
        |  FROM events)
        |SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
        |  event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events JOIN dim USING (event_type)
        |WHERE dim.cat = 'conv'
        |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
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
    // Tolerance bound: the native backward ASOF, then the SAME
    // distance constant nulls stale matches.
    "ev_asof_tolerance" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
         |v AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, us AS click_us, max(vm) AS click_vm FROM e
         |  WHERE event_type = 'click' GROUP BY user_id, us)
         |SELECT v.user_id, v.event_id, v.us,
         |  COALESCE(CASE WHEN v.us - c.click_us <= $AsofToleranceUs
         |    THEN c.click_us END, -1) AS click_us,
         |  COALESCE(CASE WHEN v.us - c.click_us <= $AsofToleranceUs
         |    THEN c.click_vm END, -1) AS click_vm
         |FROM v ASOF LEFT JOIN c
         |  ON v.user_id = c.user_id AND v.us >= c.click_us
         |ORDER BY event_id""".stripMargin,
    // Nearest direction: both native ASOF directions as CTEs, stitched
    // per view with the SAME integer distance compare as the Spark
    // side (ties → backward). Shared verbatim by the 2-level form —
    // the equivalence contract every 2-level twin carries.
    "ev_asof_nearest" -> asofNearestOracleSql,
    "ev_asof_nearest_2level" -> asofNearestOracleSql,
    "ev_asof_forward" ->
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
        |  ON v.user_id = c.user_id AND v.us <= c.click_us
        |ORDER BY event_id""".stripMargin,
    "ev_asof_forward_2level" -> // shares the plain forward contract
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
        |  ON v.user_id = c.user_id AND v.us <= c.click_us
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
    "ev_quantiles_approx" ->
      """SELECT event_type, count(*) AS n_events,
        |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
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

}
