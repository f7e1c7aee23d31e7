package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream operators over the `events` table — windowed rollups,
  * sessionization, per-key top-N, moving aggregates. These are the batch
  * duals of the Structured Streaming path (graft.streaming): the same
  * column expressions feed `groupBy(window(...))` there.
  *
  * Determinism: `value` is a double, so every aggregate first quantizes
  * to exact micro-units (`floor(double * 1e6)` → BIGINT) — sums are then
  * integer math, identical across partition orders and engines; the
  * double rendering is derived once from the exact integer.
  *
  * Scale: one shuffle per group-by/window partition key (hour bucket,
  * user). Sessionization partitions by user — the classic skew risk is a
  * hot user. NOTE: AQE's skew splitting applies to joins (and, behind a
  * flag, shuffled aggregations) but NOT to window-function exchanges — a
  * hot `user_id` still lands on one task here. The real mitigations are
  * (a) two-level sessionization — IMPLEMENTED as [[sessionize2Level]]:
  * pre-segment each user's stream by a coarse time bucket
  * `(user_id, day)`, sessionize within buckets, then merge only the
  * bucket-boundary sessions — bounding any task at one user-day; or
  * (b) route known hot keys (bots, service accounts) through a
  * dedicated pre-aggregated path. At fixture scale the plain per-user
  * window is fastest; at 100 TB run the two-level form (same output,
  * proven by the shared ev_sessionize oracle).
  */
object Events {

  /** Micro-unit quantization of a double measure. */
  def micros(c: Column): Column =
    floor(c.cast(DoubleType) * 1000000).cast(LongType)

  /** Hourly rollup per event type: counts, distinct users, exact sum. */
  def hourlyRollup(df: DataFrame): DataFrame =
    df.groupBy(
        date_trunc("hour", col("ts")).cast(StringType).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(micros(col("value"))).as("value_micros"))
      .withColumn("value_sum", col("value_micros").cast(DoubleType) / 1000000)

  /** [[hourlyRollup]] with HLL distincts — the 100 TB form. The exact
    * `countDistinct` expands to a TWO-phase aggregation (first on
    * (group, user), then on group: every distinct pair shuffles);
    * `approx_count_distinct` keeps ONE shuffle whose state per group is
    * a fixed-size HyperLogLog++ sketch, so memory is bounded no matter
    * how many distinct users an hour has. Approximate ⇒ hash-checked
    * through the [[approxRollupEval]] grading wrapper (plus an
    * error-bound EventsSpec test).
    *
    * Default `rsd` is 1%, NOT Spark's 5%: the grading bar is
    * max(1, 5%) per group, and a 5%-rsd sketch (2⁹ registers) sits at
    * 1σ — across thousands of groups some group WILL exceed its own
    * rsd (observed at sf0.1: one hour-type group off by >5% in the
    * linear-counting regime). 1% rsd (2¹⁴ registers, ~16 KB/group
    * worst-case — still fixed-size state) is sparse-exact at
    * small-group cardinalities and 5σ under the bar in dense mode. */
  def hourlyRollupApprox(df: DataFrame, rsd: Double = 0.01): DataFrame =
    df.groupBy(
        date_trunc("hour", col("ts")).cast(StringType).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), rsd).as("n_users_approx"),
        sum(micros(col("value"))).as("value_micros"))
      .withColumn("value_sum", col("value_micros").cast(DoubleType) / 1000000)

  /** Error-graded eval of an approximate rollup — the wrapper that makes
    * an HLL query ORACLE-CHECKABLE: an estimate can never hash-match a
    * cross-engine exact value, but "the estimate stayed within its error
    * bound" CAN. Joins the approx result ([[hourlyRollupApprox]] or its
    * streaming dual, drained) against the exact per-(hour, type)
    * distinct from the same events, and emits the exact columns plus
    * `hll_ok` = |approx − exact| ≤ max(2, exact·boundPpm/10⁶) — integer
    * arithmetic throughout, so the DuckDB oracle is the exact rollup
    * with a literal `TRUE`: the hash matches iff every group's sketch
    * estimate graded in-bounds.
    *
    * The exact side exists only to GRADE the sketch (recall/eval-style,
    * like `Similarity.recallAtK`) — production runs the approx form
    * alone. Both sides aggregate the same scan; the join is
    * group-count-sized.
    *
    * The absolute floor is DERIVED from the grading sample size, not
    * fixture-tuned (the auto-planes convention): Spark's HLL++ has no
    * sparse-exact mode at low cardinalities, so a group of n≈30
    * distinct users carries a small absolute sketch error whose ≥2
    * tail only gets SAMPLED once there are thousands of groups
    * (observed at the derived 10× step: ~4k hour×type groups → one ±2
    * miss under a ±1 floor; zero misses in hundreds of groups at
    * sf0.01/sf0.1). Rule: floor = ±1 while the grade covers ≤ 1024
    * groups, ±2 beyond — so fixture-scale grading keeps the tight
    * bound and only the scales that statistically need the slack get
    * it. `floorUnits = Some(k)` pins the floor for spec determinism;
    * the group count comes from a global window over the already
    * group-count-sized grade join (no extra scan of `events`). */
  def approxRollupEval(approx: DataFrame, events: DataFrame,
                       boundPpm: Long,
                       floorUnits: Option[Long] = None): DataFrame = {
    val exact = events.groupBy(
        date_trunc("hour", col("ts")).cast(StringType).as("hour"),
        col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val floorMicros: Column = floorUnits match {
      case Some(k) => lit(k * 1000000L)
      case None =>
        val nGroups = count(lit(1)).over(Window.partitionBy(lit(1)))
        when(nGroups <= 1024L, lit(1000000L)).otherwise(lit(2000000L))
    }
    approx.join(exact, Seq("hour", "event_type"))
      .select(col("hour"), col("event_type"), col("n_events"),
        col("n_users"), col("value_micros"), col("value_sum"),
        (abs(col("n_users_approx") - col("n_users")) * 1000000L <=
          greatest(floorMicros, col("n_users") * boundPpm))
          .as("hll_ok"))
  }

  /** Error-graded eval of APPROXIMATE per-type value quantiles — the
    * sketch twin of the exact `ev_quantiles`, graded like
    * [[approxRollupEval]]: a Greenwald-Khanna estimate can never
    * hash-match a cross-engine exact value, but "the estimate's rank
    * stayed within the sketch's guarantee" can. `percentile_approx`
    * promises a value whose rank is within n/accuracy of the target
    * rank while keeping O(accuracy·log n) state per group (the exact
    * `percentile` buffers the whole group — the thing that dies first
    * at scale); the grade recomputes each estimate's true rank window
    * [cnt_lt+1, cnt_le] against the target band q·n ± (n/accuracy + 1
    * row of slack — the max(1,·) convention), all in integer ppm
    * arithmetic. The estimates themselves are NOT emitted (sketch
    * merge order is partition-dependent); the output is the exact
    * per-type count plus the three booleans, so the DuckDB oracle is
    * the exact counts with literal TRUEs.
    *
    * Both sides aggregate the same scan; the grade join is
    * group-count-sized and broadcast. */
  def quantilesApproxEval(df: DataFrame, accuracy: Int = 100): DataFrame = {
    val epsPpm = 1000000L / accuracy
    val vm = micros(col("value"))
    val ap = df.groupBy(col("event_type"))
      .agg(percentile_approx(vm,
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("est"))
    def le(i: Int) = sum(when(col("vm") <= col("est")(i), 1L)
      .otherwise(0L))
    def lt(i: Int) = sum(when(col("vm") < col("est")(i), 1L)
      .otherwise(0L))
    df.select(col("event_type"), vm.as("vm"))
      .join(broadcast(ap), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        le(0).as("le25"), lt(0).as("lt25"),
        le(1).as("le50"), lt(1).as("lt50"),
        le(2).as("le75"), lt(2).as("lt75"))
      .withColumn("n", col("n_events"))
      .select(col("event_type"), col("n_events"),
        okCol("le25", "lt25", 250000L, epsPpm).as("p25_ok"),
        okCol("le50", "lt50", 500000L, epsPpm).as("p50_ok"),
        okCol("le75", "lt75", 750000L, epsPpm).as("p75_ok"))
  }

  /** Count-min sketch (Cormode–Muthukrishnan 2005) frequency
    * estimation over a BIGINT key column, with per-key grading against
    * the exact counts — the third sketch family next to HLL
    * ([[approxRollupEval]]) and GK ([[quantilesApproxEval]]).
    *
    * Unlike those two, THIS sketch is replayed deterministically on
    * both engines: the d hash rows are explicit affine maps
    * h_j(k) = ((a_j·k + b_j) mod P) mod w (P = 2³¹−1, constants in
    * [[CmsA]]/[[CmsB]]), so every cell count — and therefore every
    * estimate, overcount, and bound flag — is exact integer math the
    * DuckDB oracle reproduces value-for-value. No grade-band hedging
    * needed.
    *
    * Emits, for the `topK` keys by true count (ties → smaller key):
    * (key, true_cnt, est_cnt, overcount, within_bound) where
    * est = min_j cell(j, h_j(key)), overcount = est − true (≥ 0 by
    * construction — CMS never undercounts), and within_bound checks
    * overcount ≤ (3·N) div w (the ε = e/w Markov bound with e rounded
    * up to 3, deterministic on both engines).
    *
    * Scale shape — the POINT of the operator: sketch state is d·w
    * cells no matter how many distinct keys flow through, built by ONE
    * map-side-combined aggregate over a d-way explode (the per-row
    * fanout is d=3 structs, not a per-key state). The probe side is
    * topK-bounded, the cells relation broadcasts (d·w rows), and the
    * exact counts — needed for grading only — are the same single
    * shuffle `a2_group_counts` already pays. At 100 TB you keep the
    * sketch and drop the exact side; the estimate path touches no
    * per-key state at all. */
  def cmsFreqEval(df: DataFrame, keyCol: String, w: Int = 64,
                  topK: Int = 25): DataFrame = {
    val base = df.select(col(keyCol).cast(LongType).as("key"))
    def bucket(j: Int, k: Column): Column =
      ((lit(CmsA(j)) * k + lit(CmsB(j))) % CmsP % w).cast(LongType)
    val cells = base
      .select(explode(array(CmsA.indices.map(j =>
        struct(lit(j).as("j"), bucket(j, col("key")).as("bucket"))): _*))
        .as("h"))
      .groupBy(col("h.j").as("j"), col("h.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val topk = base.groupBy("key").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("key")).limit(topK)
    val probes = topk.select(col("key"), col("true_cnt"),
      explode(array(CmsA.indices.map(j =>
        struct(lit(j).as("j"), bucket(j, col("key")).as("bucket"))): _*))
        .as("h"))
      .select(col("key"), col("true_cnt"),
        col("h.j").as("j"), col("h.bucket").as("bucket"))
    val n = base.agg(count(lit(1)).as("n"))
    probes.join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(col("key"), col("true_cnt"))
      .agg(min(col("c")).as("est_cnt"))
      .crossJoin(broadcast(n))
      .select(col("key"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"),
        (col("est_cnt") - col("true_cnt") <=
          expr(s"(3 * n) div $w")).as("within_bound"))
  }

  /** CMS hash constants — shared verbatim with the oracle SQL. */
  val CmsP = 2147483647L
  val CmsA: Seq[Long] = Seq(31L, 131L, 1031L)
  val CmsB: Seq[Long] = Seq(7L, 17L, 37L)

  /** One rank-band grade of [[quantilesApproxEval]]: the estimate's
    * true rank window [lt+1, le] must intersect the target band
    * q·n ± (ε·n + 1 row). */
  private def okCol(leC: String, ltC: String, qPpm: Long,
                    epsPpm: Long): Column =
    (col(leC) * 1000000L >=
      col("n") * qPpm - col("n") * epsPpm - 1000000L) &&
      (col(ltC) * 1000000L <=
        col("n") * qPpm + col("n") * epsPpm + 1000000L)

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapSeconds`. Session ids are per-user running counts of
    * session breaks (1-based).
    *
    * Boundary semantics — PINNED: the break comparison is STRICTLY `>`
    * (`gap > gapSeconds`), so an event arriving at exactly the gap
    * distance CONTINUES the session. The DuckDB oracle
    * (RegistryExt "ev_sessionize": `us - lag(us) OVER w > gap`), the
    * streaming dual ([[graft.streaming.StreamOps.statefulSessionize]]:
    * `us - s.endUs > gapUs`), and `session_window` (whose window is
    * `[first, last + gap)`, half-open) all use the same convention; an
    * `EventsSpec` test sits at exactly-gap distance so a refactor
    * flipping any side to `>=` fails loudly. */
  def sessionize(df: DataFrame, gapSeconds: Long): DataFrame =
    withSessionIds(df, gapSeconds)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))

  /** Per-EVENT session-id assignment — the break/running-sum core shared
    * by [[sessionize]] and [[sessionPaths]] (one definition, one boundary
    * convention). `extraCols` lets a caller carry payload columns through
    * the window without [[sessionize]] paying their exchange bytes. */
  private def withSessionIds(df: DataFrame, gapSeconds: Long,
                             extraCols: Seq[String] = Nil): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val withUs = df.select(Seq(col("user_id"), col("event_id")) ++
      extraCols.map(col) :+ unix_micros(col("ts")).as("us"): _*)
    val gap = col("us") - lag(col("us"), 1).over(order)
    val brk = when(gap.isNull || gap > gapSeconds * 1000000L, 1).otherwise(0)
    val sid = sum(brk).over(order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow))
    withUs.withColumn("session_id", sid.cast(LongType))
  }

  /** TWO-LEVEL sessionization — the hot-key mitigation the plain
    * [[sessionize]] scaladoc names: identical output, bounded task size.
    *
    * Level 1 partitions the window by `(user_id, time bucket)` (default
    * one day), so the largest task holds one user-DAY of events — a bot
    * with years of traffic no longer lands on one task (AQE cannot split
    * window exchanges, so the key itself must bound the partition).
    * Level 2 then repairs the bucket boundaries on SESSION SUMMARIES
    * (thousands× smaller than events): adjacent sessions of one user
    * merge iff the idle gap between them is within `gapSeconds`.
    *
    * Exactly reproduces [[sessionize]] by construction: inside a bucket
    * the level-1 breaks are the global breaks; consecutive level-1
    * sessions within a bucket are > gap apart so level 2 re-breaks them;
    * at a bucket boundary level 1 always breaks and level 2 merges iff
    * the global pass would NOT have broken (strictly-`>` convention on
    * both levels — see the PINNED boundary note on [[sessionize]]).
    * Session ids stay 1-based per user in time order (the level-2
    * running sum). Verified value-for-value against the ev_sessionize
    * oracle (registry `ev_sessionize_2level`) and by an EventsSpec
    * hot-user test. */
  def sessionize2Level(df: DataFrame, gapSeconds: Long,
                       bucketSeconds: Long = 86400L): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val bucketUs = bucketSeconds * 1000000L
    val withUs = df.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("bucket", floor(col("us") / bucketUs))
    val order1 = Window.partitionBy("user_id", "bucket")
      .orderBy(col("us"), col("event_id"))
    val gap1 = col("us") - lag(col("us"), 1).over(order1)
    val brk1 = when(gap1.isNull || gap1 > gapUs, 1).otherwise(0)
    val sub = withUs
      .withColumn("sid1", sum(brk1).over(
        order1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "bucket", "sid1")
      .agg(count(lit(1)).as("n1"),
        min(col("us")).as("s1"), max(col("us")).as("e1"))
    // Boundary repair over per-user session summaries. Sessions of one
    // user are disjoint, time-ordered intervals, so lag(end) under an
    // ORDER BY start is the true previous idle boundary.
    val order2 = Window.partitionBy("user_id").orderBy(col("s1"), col("e1"))
    val gap2 = col("s1") - lag(col("e1"), 1).over(order2)
    val brk2 = when(gap2.isNull || gap2 > gapUs, 1).otherwise(0)
    sub
      .withColumn("session_id", sum(brk2).over(
          order2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(LongType))
      .groupBy("user_id", "session_id")
      .agg(sum(col("n1")).as("n_events"),
        min(col("s1")).as("start_us"), max(col("e1")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** The event-type dictionary, pinned so [[typePivot]] never needs the
    * extra distinct-values job (and so column order is deterministic). */
  val EventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** ROLLUP over (event_type, hour-of-day): per-cell, per-type-subtotal
    * and grand-total rows from ONE pass (Spark expands the rollup inside
    * a single shuffle with partial aggregation — no re-scan per level).
    * Rolled-up key positions surface as '(all)' / -1 instead of NULL
    * (the oracle-compare contract forbids nulls; neither sentinel
    * collides with real values). */
  def typeRollup(df: DataFrame): DataFrame =
    df.select(col("event_type"),
        hour(col("ts")).cast(LongType).as("hod"),
        micros(col("value")).as("vm"))
      .rollup("event_type", "hod")
      .agg(count(lit(1)).as("n_events"), sum(col("vm")).as("value_micros"))
      .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
        coalesce(col("hod"), lit(-1L)).as("hod"),
        col("n_events"), col("value_micros"))

  /** PIVOT event types into columns: one row per hour-of-day, one exact
    * micro-sum column per type. The pinned [[EventTypes]] value list
    * keeps it a single group-by (5 conditional aggregates, one shuffle);
    * an unpinned pivot first runs a distinct-values job and produces
    * nondeterministic column order. Missing cells fill 0, not null. */
  def typePivot(df: DataFrame): DataFrame =
    df.select(hour(col("ts")).cast(LongType).as("hod"),
        col("event_type"), micros(col("value")).as("vm"))
      .groupBy("hod").pivot("event_type", EventTypes).agg(sum(col("vm")))
      .na.fill(0L, EventTypes)

  /** Audience-overlap matrix: for every pair of event types, the exact
    * count and Jaccard similarity (ppm) of their distinct-user sets —
    * the cohort-overlap report behind "do viewers also purchase"
    * questions, and the exact twin of sketch-based (theta/HLL)
    * intersection estimates.
    *
    * Scale shape: one distinct over (type, user) — the only
    * corpus-sized exchange — then a self-join keyed on user_id whose
    * per-user fanout is bounded by |types|² (event types are a small
    * enum, so no pair explosion), one pair-keyed aggregate, and
    * broadcast joins against the |types|-row totals. Pairs with no
    * shared users are absent (inner-join semantics, mirrored in the
    * oracle). */
  def overlapMatrix(df: DataFrame): DataFrame = {
    val tu = df.select(col("event_type"), col("user_id")).distinct()
    val tot = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
    val a = tu.select(col("event_type").as("type_a"), col("user_id"))
    val b = tu.select(col("event_type").as("type_b"), col("user_id"))
    a.join(b, Seq("user_id"))
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(tot.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(tot.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        expr("n_both * 1000000 div (n_a + n_b - n_both)").as("jaccard_ppm"))
  }

  /** Robust anomaly detection over the hourly count series, per event
    * type: flag hours whose count deviates from the per-type MEDIAN by
    * more than `k`× the MEDIAN ABSOLUTE DEVIATION — the
    * outlier-resistant z-score every pipeline-health monitor runs over
    * its ingest volumes (mean/stddev would let one huge spike mask all
    * the others; medians don't move).
    *
    * Determinism: counts are integers; `percentile(0.5)` interpolates
    * at worst to .5 (and the second pass to .25) — exact binary
    * fractions, bit-identical to DuckDB's `quantile_cont` (same
    * convention as [[valueQuantiles]]). The k·MAD product and the
    * comparison stay exact.
    *
    * Scale shape: the raw stream collapses to the (type, hour) rollup
    * first (map-side combined — the only corpus-sized stage); the
    * series table grows with elapsed TIME, not volume (10 years ≈ 88k
    * rows per type), so the exact-percentile buffering and both stats
    * joins run on a relation that BROADCASTS at any corpus scale. */
  def anomalyMad(df: DataFrame, k: Int = 3): DataFrame = {
    val hourly = df.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).cast(StringType).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val med = hourly.groupBy("event_type")
      .agg(percentile(col("n_events"), lit(0.5)).as("med"))
    val dev = hourly.join(broadcast(med), Seq("event_type"))
      .withColumn("abs_dev", abs(col("n_events") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("abs_dev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("hour"), col("n_events"),
        col("med"), col("abs_dev"), col("mad"),
        (col("abs_dev") > lit(k.toDouble) * col("mad")).as("is_anomaly"))
  }

  /** Exact per-type value quantiles (p25/p50/p75). The probabilities are
    * exact binary fractions and the inputs are integer micros, so the
    * linear interpolation `lower + (upper-lower)·frac` is EXACT in
    * double on every engine — no last-ulp divergence. Scale note: exact
    * `percentile` buffers each group's values (sorted) — fine for a
    * bounded type dictionary; for high-cardinality groups swap to
    * `approx_percentile` (bounded sketch, but merge-order-sensitive, so
    * it cannot be oracle-hashed). */
  def valueQuantiles(df: DataFrame): DataFrame =
    df.select(col("event_type"), micros(col("value")).as("vm"))
      .groupBy("event_type")
      .agg(percentile(col("vm"), lit(0.25)).as("p25"),
        percentile(col("vm"), lit(0.5)).as("p50"),
        percentile(col("vm"), lit(0.75)).as("p75"),
        count(lit(1)).as("n"))

  /** Window-function breadth over the per-user timeline: lag/lead
    * neighbors, quartile bucket (`ntile`), and `cume_dist` — one window
    * partition per user, ordered by (ts, event_id). */
  def timelineWindows(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    df.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .select(col("user_id"), col("event_id"),
        coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_event"),
        coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_event"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        cume_dist().over(w).as("cume"))
  }

  /** UNPIVOT (melt) dual of [[typePivot]]: the wide per-type columns
    * fold back to (hod, event_type, value_micros) rows — one narrow
    * expand, no shuffle beyond the pivot's own. Zero cells survive
    * (they are real data in the wide form). */
  def typeUnpivot(wide: DataFrame): DataFrame =
    wide.unpivot(Array(col("hod")),
      EventTypes.map(c => col(s"`$c`")).toArray,
      "event_type", "value_micros")

  /** TIME-RANGE sliding sum: each event's total over the same user's
    * events in `[ts - windowSeconds, ts]` — a `rangeBetween` frame
    * (value-based, ties all included ⇒ deterministic under any sort
    * order of equal timestamps), unlike [[movingSum]]'s row-count
    * frame. */
  def slidingTimeSum(df: DataFrame, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-windowSeconds * 1000000L, 0)
    df.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), micros(col("value")).as("vm"))
      .withColumn("win_micros", sum(col("vm")).over(w))
      .drop("vm")
  }

  /** Fixed-width value histogram: micro-quantized values bin by exact
    * integer floor-division (`vm div binWidthMicros`) — no float edge
    * ambiguity at bin boundaries, identical bins on every engine. One
    * shuffle with map-side combine; empty bins are absent (counts-only
    * semantics, same as SQL GROUP BY). */
  def valueHistogram(df: DataFrame, binWidthMicros: Long): DataFrame =
    df.select(micros(col("value")).as("vm"))
      .groupBy(expr(s"vm div $binWidthMicros").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("sum_micros"))
      .withColumn("bin_lo", col("bin") * binWidthMicros)

  /** Top-N events per user by value (total tiebreak on event_id). */
  def topNPerUser(df: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    df.select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= n)
  }

  /** Moving sum of the last 4 events (3 preceding + current) per user. */
  def movingSum(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    df.select(col("user_id"), col("event_id"),
      sum(micros(col("value"))).over(w).as("mov_micros"))
      .withColumn("mov_sum", col("mov_micros").cast(DoubleType) / 1000000)
  }

  /** Ordered FUNNEL analysis — how many users reach each step of an
    * event sequence (view → click → purchase), where step i+1 counts
    * only events STRICTLY AFTER the user's step-i completion time.
    * Uses the greedy earliest-chain: the earliest qualifying event
    * completes each step, which reaches step i iff ANY ordered chain
    * of length i exists (the standard funnel semantics). Output: one
    * row per step — `(step_order, step, n_users)`.
    *
    * Scale shape: stage k is a scan-pushed `event_type` filter, a join
    * against the (user-cardinality) step-(k−1) table, and a
    * groupBy(user_id) — every exchange in the chain hashes on
    * `user_id`, so the sort-free aggregations and joins REUSE one
    * partitioning end to end, and each stage's table only shrinks
    * (funnels are monotone). The final counts are three scalar
    * aggregates unioned into one action. */
  def funnel(df: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val perStep = steps.tail.scanLeft(
      df.where(col("event_type") === steps.head)
        .groupBy("user_id").agg(min(col("ts")).as("t"))) {
      case (prev, step) =>
        df.where(col("event_type") === step)
          .join(prev.select(col("user_id"), col("t").as("__pt")), "user_id")
          .where(col("ts") > col("__pt"))
          .groupBy("user_id").agg(min(col("ts")).as("t"))
    }
    perStep.zip(steps).zipWithIndex.map { case ((d, step), i) =>
      d.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast(LongType).as("step_order"),
          lit(step).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** PATH TRANSITIONS — the top `(from, to)` consecutive event-type
    * pairs across user timelines (the edge weights of the behavioral
    * Markov graph; with [[funnel]] and [[retention]] this completes
    * the product-analytics trio). Consecutive = next event of the SAME
    * user under the total order (ts, event_id) — event_id is unique,
    * so ties in ts break deterministically and the oracle replays the
    * exact same sequence.
    *
    * Scale shape: one window keyed on user_id (partition size = one
    * user's history, never corpus-bound), one map-side-combining
    * groupBy over a tiny (|types|²) key space, and a bounded global
    * top-k — the final `orderBy.limit` plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort). */
  def pathTransitions(df: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    df.select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("from_type"), col("to_type"))
      .limit(topK)
  }

  /** COHORT RETENTION matrix — the second classic product-analytics
    * rollup next to [[funnel]]: users cohort by the DATE of their first
    * event; cell (cohort, day_offset) counts how many of that cohort
    * were active day_offset days later. `n_users` at offset 0 is the
    * cohort size, so rows read directly as retention curves.
    *
    * Scale shape: one (user, day) de-dup and one groupBy(user_id) for
    * first-seen both hash on user_id (exchange reuse), the join is
    * user-keyed on already-aggregated sides, and the final matrix agg
    * is tiny (cohorts × offsets). Nothing rescans raw events twice at
    * any corpus size. */
  def retention(df: DataFrame): DataFrame = {
    val activeDays = df.select(col("user_id"),
      to_date(col("ts")).as("d")).distinct()
    val cohorts = activeDays.groupBy("user_id")
      .agg(min(col("d")).as("cohort_date"))
    activeDays.join(cohorts, "user_id")
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).cast(LongType)
          .as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** EXACT distinct ids per key via paged bitmaps — the third point on
    * the distinct-count design spectrum this engine offers:
    * [[hourlyRollup]]'s `countDistinct` (exact, shuffles one row per
    * distinct pair), [[hourlyRollupApprox]]'s HLL (bounded state, ~2%
    * error), and this (exact AND bounded: repeats collapse map-side
    * into 512-byte page bitmaps, so the exchange carries ~1 bit per
    * candidate id — see [[graft.functions.BitmapDistinct]] for the
    * full 100 TB argument). Nulls are excluded up front, matching
    * `COUNT(DISTINCT ...)` semantics. */
  def bitmapDistinct(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    import graft.functions.BitmapDistinct._
    df.where(col(idCol).isNotNull)
      .groupBy(col(keyCol), pageOf(col(idCol)).as("__page"))
      .agg(pageDistinct(bitOf(col(idCol))).as("__page_distinct"))
      .groupBy(col(keyCol))
      .agg(sum(col("__page_distinct")).as("n_distinct"))
  }

  /** KMV (k-minimum-values) distinct-count sketch, evaluated against
    * the exact count — the fourth point on the distinct-count design
    * spectrum (see [[bitmapDistinct]]): bounded state (exactly k longs
    * per key), mergeable, AND deterministically replayable, so the
    * oracle reproduces the ESTIMATE itself, not a tolerance band (the
    * one approximate cardinality sketch with that property — see
    * [[graft.functions.KmvMinHashes]]).
    *
    * The hash is the cross-engine-stable md5 construction
    * ([[TrainPrep.hashBucket]]'s): first 8 hex digits of
    * `md5(CAST(id AS STRING))`, a uniform draw on [0, 2³²). Estimate:
    * (k−1) · 2³² div h₍k₎ when the key saw ≥ k distinct hashes, else
    * the sketch size itself (the sketch IS the exact distinct set
    * below k). All columns are exact integers; `err_ppm` grades the
    * estimate against the exact distinct-id count (which differs from
    * distinct-hash cardinality only by md5 prefix collisions), so the
    * sketch's accuracy is part of the checked result.
    *
    * Scale shape: one narrow projection (one md5 per row), then a
    * single exchange whose map side is already reduced to ≤ k longs
    * per key — `countDistinct` rides the same aggregate (Spark plans
    * the distinct via Expand), and at 100 TB you'd DROP the exact
    * column and keep only the bounded sketch; it is here because the
    * evaluation is the point of the query. */
  def kmvDistinctEval(df: DataFrame, keyCol: String, idCol: String,
      k: Int): DataFrame = {
    import graft.functions.KmvMinHashes.kmv
    val h = conv(substring(md5(col(idCol).cast(StringType)), 1, 8), 16, 10)
      .cast(LongType)
    df.where(col(idCol).isNotNull)
      .select(col(keyCol), col(idCol).as("__id"), h.as("__h"))
      .groupBy(col(keyCol))
      .agg(countDistinct(col("__id")).as("exact_distinct"),
        kmv(k)(col("__h")).as("__mins"))
      .select(col(keyCol),
        col("exact_distinct"),
        size(col("__mins")).cast(LongType).as("kmv_size"),
        element_at(col("__mins"), size(col("__mins"))).as("kth_min"),
        when(size(col("__mins")) < k,
          size(col("__mins")).cast(LongType))
          .otherwise(expr(
            s"${(k - 1).toLong} * 4294967296 div element_at(__mins, $k)"))
          .as("est_distinct"))
      .withColumn("err_ppm",
        expr("abs(est_distinct - exact_distinct) * 1000000" +
          " div exact_distinct"))
  }

  /** KMV SET ALGEBRA — union and intersection cardinality between key
    * slices computed from the bounded sketches ALONE (the θ-sketch
    * inclusion–exclusion, Bar-Yossef 2002 / theta-sketch practice),
    * graded against the exact counts ([[overlapMatrix]]'s quantities).
    * This is the sketch family's point at 100 TB: "how many distinct
    * users do event types A and B share" answered from 2·k longs per
    * pair, no re-touch of raw data — sketches computed once per
    * slice/day/source keep answering every pairwise overlap question.
    *
    * Estimators (all exact integer arithmetic, deterministically
    * replayable — same hash-parity contract as [[kmvDistinctEval]]):
    * the merged sketch (k smallest of S_A ∪ S_B, which IS the KMV
    * sketch of A ∪ B because any of the union's k minima is among its
    * own set's k minima) gives θ = its k-th minimum and
    * `union_est = (k−1)·2³² div θ`; the common values BELOW θ are the
    * intersection's retained sample, `inter_est = common·2³² div θ`.
    * Below k the sketches are the complete hash sets and both
    * estimates are exact by construction. Intersection error is
    * graded relative to the exact UNION size (the θ-sketch guarantee
    * scales with |A∪B|, not |A∩B| — a tiny intersection estimated
    * from a large union is honest about that).
    *
    * Scale shape: the distinct projection and the two aggregates over
    * it are the only corpus-sized stages (the exact columns exist to
    * grade the estimate — a production rollup would keep only the
    * sketch side); everything pairwise runs on |types|-row relations
    * with array kernels (array_union/intersect/sort on ≤ k-long
    * arrays), broadcast-joined. */
  def kmvOverlapEval(df: DataFrame, keyCol: String, idCol: String,
      k: Int): DataFrame = {
    import graft.functions.KmvMinHashes.kmv
    val h = conv(substring(md5(col(idCol).cast(StringType)), 1, 8), 16, 10)
      .cast(LongType)
    val du = df.where(col(idCol).isNotNull)
      .select(col(keyCol), col(idCol).as("__id")).distinct()
    val withH = df.where(col(idCol).isNotNull)
      .select(col(keyCol), h.as("__h"))
    val sk = withH.groupBy(col(keyCol)).agg(kmv(k)(col("__h")).as("mins"))
    val tot = du.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val exactBoth = du.select(col(keyCol).as("type_a"), col("__id"))
      .join(du.select(col(keyCol).as("type_b"), col("__id")), Seq("__id"))
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("exact_both"))
    val pow32 = 4294967296L
    sk.select(col(keyCol).as("type_a"), col("mins").as("ma"))
      .join(broadcast(sk.select(col(keyCol).as("type_b"),
        col("mins").as("mb"))), col("type_a") < col("type_b"))
      .withColumn("merged",
        slice(array_sort(array_union(col("ma"), col("mb"))), 1, k))
      .withColumn("kmv_size", size(col("merged")).cast(LongType))
      .withColumn("theta", element_at(col("merged"), size(col("merged"))))
      .withColumn("common",
        when(col("kmv_size") < k,
          size(array_intersect(col("ma"), col("mb"))).cast(LongType))
          .otherwise(size(filter(array_intersect(col("ma"), col("mb")),
            v => v < col("theta"))).cast(LongType)))
      .withColumn("union_est",
        when(col("kmv_size") < k, col("kmv_size"))
          .otherwise(expr(s"${(k - 1).toLong} * $pow32 div theta")))
      .withColumn("inter_est",
        when(col("kmv_size") < k, col("common"))
          .otherwise(expr(s"common * $pow32 div theta")))
      .join(broadcast(tot.select(col(keyCol).as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(tot.select(col(keyCol).as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .join(broadcast(exactBoth), Seq("type_a", "type_b"), "left_outer")
      .na.fill(0L, Seq("exact_both"))
      .withColumn("exact_union", expr("n_a + n_b - exact_both"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("exact_both"), col("exact_union"), col("kmv_size"),
        col("theta"), col("common"), col("union_est"), col("inter_est"),
        expr("abs(union_est - exact_union) * 1000000 div exact_union")
          .as("union_err_ppm"),
        expr("abs(inter_est - exact_both) * 1000000 div exact_union")
          .as("inter_err_ppm"))
  }

  /** LATEST-PER-KEY snapshot — the CDC compaction read: each user's
    * single most recent event under the (ts, event_id) total order.
    * One lexicographic struct-max whose map-side partials hold ONE
    * struct per key per task, so the EXCHANGE carries one row per
    * (key, task) — the scalable form of the `row_number() = 1`
    * window, which shuffles every event into per-user sorts to keep
    * one survivor each. (Struct aggregates plan as SortAggregate — a
    * bare-key local sort with a cheap comparator — not hash agg;
    * the exchange bound is the scale property, plan-asserted in
    * `PlanQualitySpec`. Same design as
    * [[graft.operators.Dedup.exactDedup]]'s keep-lowest, pointed the
    * other way along the time axis.) */
  def latestSnapshot(df: DataFrame): DataFrame =
    df.select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type")).as("ev"))
      .groupBy("user_id")
      .agg(max(col("ev")).as("m"))
      .select(col("user_id"), col("m.us").as("last_us"),
        col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"))

  /** TIME-SERIES GAP FILL / RESAMPLE — the dense-spine operator every
    * dashboard and forecasting pipeline needs: the hourly rollup is
    * LEFT-joined onto a complete hour spine (per event type, spanning
    * the global [min, max] hour), missing hours get `n_events = 0` and
    * a FORWARD-FILLED `value_micros` (last observed value; zero before
    * the first observation), and `has_data` keeps the imputation
    * honest. Null-free by construction.
    *
    * Scale shape: the spine is |types| × |hours| — a calendar, not a
    * corpus; it grows with elapsed TIME, never with event volume, so
    * the join's spine side is broadcastable at any data scale. The
    * rollup side is the already-tiny (hour, type) aggregate, and the
    * forward fill windows over spine rows — the raw stream is touched
    * exactly once, by the rollup. */
  def gapFill(df: DataFrame): DataFrame = {
    val hourly = df.groupBy(
        date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(micros(col("value"))).as("value_micros"))
    val spine = hourly.select("event_type").distinct()
      .crossJoin(hourly.agg(min(col("hour")).as("h0"),
        max(col("hour")).as("h1")))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hour"))
    val ff = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hour"), "left_outer")
      .withColumn("has_data", col("value_micros").isNotNull)
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("value_micros",
        coalesce(last(col("value_micros"), ignoreNulls = true).over(ff),
          lit(0L)))
      .select(col("hour").cast(StringType).as("hour"), col("event_type"),
        col("n_events"), col("value_micros"), col("has_data"))
  }

  /** INCREMENTAL ROLLUP MAINTENANCE — the materialized-view pattern
    * behind every "don't rescan history" pipeline: each delta batch
    * aggregates INDEPENDENTLY to partial (hour, type) rows, and
    * merging partials (a sum of counts and micro-sums — associative,
    * commutative) yields EXACTLY the rollup a full rescan would
    * produce, which is what the shared oracle asserts. At 100 TB this
    * is the difference between aggregating yesterday's delta and
    * re-reading a year: the stored view + each day's partial is all
    * the merge ever touches.
    *
    * The exact distinct-user count is deliberately ABSENT: plain
    * distinct counts don't merge (overlap double-counts). The
    * mergeable forms this engine provides are [[bitmapDistinct]]'s
    * page bitmaps (exact) and [[hourlyRollupApprox]]'s HLL sketches
    * (bounded) — compose one of those when the view needs distincts. */
  def hourlyRollupMerge(deltas: Seq[DataFrame]): DataFrame =
    deltas.map(d =>
      d.groupBy(
          date_trunc("hour", col("ts")).cast(StringType).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(micros(col("value"))).as("value_micros")))
      .reduce(_ unionAll _)
      .groupBy("hour", "event_type")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("value_micros")).as("value_micros"))
      .withColumn("value_sum", col("value_micros").cast(DoubleType) / 1000000)

  /** SESSION PATH MINING — the top-k complete event-type paths across
    * sessions ([[pathTransitions]] gives the Markov EDGES; this gives
    * the full WALKS, the "most common journeys" view). Sessions come
    * from [[withSessionIds]] (same gap convention as [[sessionize]]);
    * a session's path is its event types joined by `>` in (ts,
    * event_id) order — a total order, so the string is deterministic
    * and the oracle's `string_agg(... ORDER BY us, event_id)` replays
    * it exactly.
    *
    * Scale shape: the per-session `collect_list` state is bounded by
    * session LENGTH (minutes of one user's activity — never
    * corpus-bound, unlike a per-user collect); `array_sort` restores
    * determinism locally after the unordered collect. The path count
    * is a map-side-combining groupBy on a short string key, and the
    * final top-k plans as TakeOrderedAndProject (per-partition heaps,
    * no global sort). */
  def sessionPaths(df: DataFrame, gapSeconds: Long, topK: Int): DataFrame =
    withSessionIds(df, gapSeconds, Seq("event_type"))
      .groupBy("user_id", "session_id")
      .agg(array_sort(collect_list(struct(col("us"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(concat_ws(">",
        transform(col("evs"), e => e.getField("event_type"))).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)

  /** SCD TYPE-2 interval build — compress each user's event-type
    * timeline into validity intervals: one row per RUN of consecutive
    * equal states, with `valid_from_us` / `valid_to_us` (next run's
    * start; the classic high-value sentinel `Long.MaxValue` = still
    * current, keeping the output null-free) and 1-based `version`
    * numbers. The
    * classic warehouse dimension-history shape, derived here from the
    * raw change stream in one pass.
    *
    * Determinism: runs are cut on the (ts, event_id) total order, so
    * versions and interval bounds are engine-independent; `state` is
    * constant within a run, so `min(state)` extracts it without a
    * `first()` (whose result would be partition-order-dependent).
    *
    * Scale shape: one window exchange keyed on user_id (task size = one
    * user's history), then the run compression is a map-side-combining
    * groupBy on (user, version) — already co-partitioned by the window
    * exchange, so no second shuffle — and the `valid_to_us` stitch runs
    * over RUNS (≤ changes, typically ≪ events). */
  def scd2(df: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val withUs = df.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val prev = lag(col("event_type"), 1).over(order)
    val chg = when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0)
    val ver = sum(chg).over(order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow))
    val runs = withUs.withColumn("version", ver.cast(LongType))
      .groupBy("user_id", "version")
      .agg(min(col("event_type")).as("state"),
        min(col("us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val stitch = Window.partitionBy("user_id").orderBy(col("version"))
    runs.withColumn("valid_to_us",
      coalesce(lead(col("valid_from_us"), 1).over(stitch),
        lit(Long.MaxValue)))
  }

  /** HIERARCHICAL ROLLUP — (event_type, day) aggregates plus per-type
    * subtotals plus the grand total in ONE pass (`ROLLUP` grouping
    * sets; `gid` is the standard SQL GROUPING_ID bitmask: 0 = leaf,
    * 1 = type subtotal, 3 = grand total). Aggregated-away keys render
    * as the `(all)` sentinel so the result needs no NULL-ordering
    * convention to compare across engines.
    *
    * Scale shape: Catalyst plans ROLLUP as a single Expand + one
    * hash aggregate — each input row expands to its 3 grouping-set
    * rows map-side and partials combine before the one shuffle; sums
    * stay in exact micro-units ([[micros]]) so subtotal and total
    * are bit-identical to the leaves' sum at any partition order. */
  def rollupMulti(df: DataFrame): DataFrame =
    df.select(col("event_type"),
        date_trunc("day", col("ts")).cast(StringType).as("day"),
        micros(col("value")).as("vm"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("vm")).as("value_micros"),
        grouping_id().as("gid"))
      .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
        coalesce(col("day"), lit("(all)")).as("day"),
        col("gid").cast(LongType).as("gid"),
        col("n_events"), col("value_micros"))
}
