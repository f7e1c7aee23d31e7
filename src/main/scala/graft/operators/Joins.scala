package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Join kernel.
  *
  * The reference's only semantic join (J1) denormalizes a small projection
  * of the cover table onto every schedule table with a left-outer
  * equi-join on `filingId` (reference: Form700.py:346-352). The cover side
  * is always small relative to the schedules, so at cluster scale the
  * right plan is a broadcast-hash join — no shuffle of the big side.
  */
object Joins {

  /** J1 (Form700.py:346-352): left-outer equi-join of a fact table with a
    * small, explicitly broadcast dimension projection.
    *
    * @param fact      the big side (schedule analog); never shuffled
    * @param dim       the small side (cover projection analog)
    * @param key       equi-join key present on both sides
    * @param dimCols   columns to carry over from the dim (key included)
    */
  def filerToSchedule(fact: DataFrame, dim: DataFrame, key: String,
                      dimCols: Seq[String]): DataFrame = {
    val proj = dim.select(dimCols.head, dimCols.tail: _*)
    fact.join(broadcast(proj), Seq(key), "left_outer")
  }

  /** Skew-busting salted inner equi-join for when the dim is too big to
    * broadcast AND the fact key is skewed: the fact side gets a
    * DETERMINISTIC salt (hash of all fact columns mod `salts` — never
    * `rand()`, which breaks retry/replay), the dim side is replicated
    * `salts` ways, and the join key becomes (key, salt). A hot fact key
    * now spreads over `salts` reducers instead of one.
    *
    * AQE's skew-join split handles most cases at runtime; explicit
    * salting remains the tool when a single key exceeds what one task
    * can hold even after splitting, or when AQE is unavailable
    * (streaming joins). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val factSalted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(c => col(s"`$c`")): _*), lit(salts))
        .cast(IntegerType))
    val dimSalted = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast(IntegerType))
    factSalted.join(dimSalted, Seq(key, "__salt")).drop("__salt")
  }

  /** Backward AS-OF join: each left row picks up the value columns of
    * the LATEST right row with the same key and `right.time <= left.time`
    * (inclusive) — the time-series join Spark lacks as a primitive
    * (pandas `merge_asof` / kdb `aj`).
    *
    * Spark-first shape: NOT a range join (a `l.t >= r.t` theta-join is a
    * per-key cross product — quadratic for hot keys and not hash-joinable)
    * but the union-and-carry formulation: tag both sides, union them,
    * sort each key's rows by (time, side) with right rows first at equal
    * times, and carry the last non-null right value forward with a
    * running `last(ignoreNulls)` window. ONE shuffle on the key, linear
    * work per row. The per-key window is the same pattern as
    * sessionization, with the same hot-key caveat — [[asofJoin2Level]]
    * is the bucket-bounded form for that case (identical output,
    * oracle-shared).
    *
    * Preconditions: `valueCols` must not collide with left columns; the
    * right side must be unique per (key, time) — aggregate it first (a
    * duplicate would make "the" matched row ambiguous in any engine).
    * Unmatched left rows carry nulls — coalesce downstream. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               timeCol: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // right rows (side 0) sort BEFORE left rows at the same timestamp →
    // equal-time matches are included (backward-inclusive semantics,
    // same as DuckDB ASOF JOIN's l.t >= r.t)
    val w = Window.partitionBy(key).orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(asofTagged(left, right, key, timeCol, valueCols)) {
        (df, c) =>
      df.withColumn(c, last(col(s"`$c`"), ignoreNulls = true).over(w))
      }
      .where(col("__side") === 1)
      .drop("__side")
  }

  /** TOLERANCE-bounded backward as-of join — pandas
    * `merge_asof(tolerance=...)`: the match additionally requires
    * `left.time - right.time <= toleranceUs`; a staler match is a
    * non-match (nulls), the feature-freshness guard every as-of
    * deployment eventually needs (a price/feature older than the
    * tolerance must not silently join). Same single-shuffle
    * union-and-carry as [[asofJoin]]: the matched right TIME rides
    * along as one extra carried column and one post-carry filter nulls
    * out stale matches — no change to the exchange shape, so the
    * 2-level hot-key discipline composes the same way.
    *
    * Same preconditions as [[asofJoin]], plus `__mt` must not collide
    * with caller columns, and right-side `valueCols` must be NON-NULL
    * (the 2-level forms' precondition, for the same reason: each value
    * column carries independently via `last(ignoreNulls)`, so a null
    * in the matched row would let a STALER row's value slip past the
    * freshness gate keyed on the carried match time — pre-coalesce
    * nullable right columns). ENFORCED at runtime: a null right value
    * raises a named error instead of returning silently wrong rows. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        timeCol: String, valueCols: Seq[String],
                        toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"tolerance must be >= 0: $toleranceUs")
    val mt = "__mt"
    val r2 = requireNonNullValues(right, valueCols, "asofJoinTolerance")
      .withColumn(mt, col(s"`$timeCol`"))
    val carried = asofJoin(left, r2, key, timeCol, valueCols :+ mt)
    val fresh = col(s"`$mt`").isNotNull &&
      (col(s"`$timeCol`") - col(s"`$mt`")) <= toleranceUs
    valueCols.foldLeft(carried) { (df, c) =>
        df.withColumn(c, when(fresh, col(s"`$c`")))
      }
      .drop(mt)
  }

  /** Runtime enforcement of the NON-NULL right-value precondition the
    * tolerance/nearest/2-level forms document: each value column is
    * wrapped so a null right-side value FAILS THE JOB with a named
    * error instead of silently desynchronizing the per-column carries
    * from the carried match time (a staler row's value slipping past
    * the freshness gate). One codegen'd null check per right row —
    * negligible next to the carry window itself; the same
    * guard-in-the-expression discipline as `a3_agg_breadth`'s
    * assert_true pack-range bound. */
  private def requireNonNullValues(right: DataFrame,
                                   valueCols: Seq[String],
                                   op: String): DataFrame =
    valueCols.foldLeft(right) { (df, c) =>
      df.withColumn(c, when(col(s"`$c`").isNotNull, col(s"`$c`"))
        .otherwise(raise_error(lit(
          s"$op: right-side value column '$c' must be non-null " +
            "(pre-coalesce nullable right columns — the per-column " +
            "carries only agree with the carried match time when no " +
            "right value is null)"))))
    }

  /** Both sides tagged and unioned for the as-of carry: `__side` 0 =
    * right (sorts first at equal times), 1 = left. */
  private def asofTagged(left: DataFrame, right: DataFrame, key: String,
                         timeCol: String,
                         valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      "valueCols must not collide with left columns")
    val rightProj = right.select(
      (Seq(key, timeCol) ++ valueCols).map(c => col(s"`$c`")): _*)
    val passCols = leftCols.filterNot(Seq(key, timeCol).contains)
    val lTagged = left.select(
      Seq(col(s"`$key`"), col(s"`$timeCol`"), lit(1).as("__side")) ++
        passCols.map(c => col(s"`$c`")) ++
        valueCols.map(c =>
          lit(null).cast(rightProj.schema(c).dataType).as(c)): _*)
    val rTagged = rightProj.select(
      Seq(col(s"`$key`"), col(s"`$timeCol`"), lit(0).as("__side")) ++
        passCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(s"`$c`")): _*)
    lTagged.unionByName(rTagged)
  }

  /** FORWARD as-of join — each left row picks up the value columns of
    * the EARLIEST right row with the same key and `right.time >=
    * left.time` (inclusive): the look-ahead twin of [[asofJoin]]
    * (pandas `merge_asof(direction='forward')`, DuckDB `ASOF … ON l.t
    * <= r.t`). Same union-and-carry shape with the window reversed —
    * the first non-null right value in the [current, following] frame;
    * LEFT rows sort before right rows at equal times so an equal-time
    * right row is inside its left row's frame (forward-inclusive).
    * Same preconditions and hot-key caveat as the backward form. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      timeCol: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // asofTagged tags left = 1, right = 0; DESCENDING side order puts
    // left first at equal timestamps.
    val w = Window.partitionBy(key)
      .orderBy(col(timeCol), col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    valueCols.foldLeft(asofTagged(left, right, key, timeCol, valueCols)) {
        (df, c) =>
      df.withColumn(c, first(col(s"`$c`"), ignoreNulls = true).over(w))
      }
      .where(col("__side") === 1)
      .drop("__side")
  }

  /** TWO-LEVEL as-of join — the hot-key mitigation [[asofJoin]]'s
    * scaladoc names, shipped (mirroring
    * [[graft.operators.Events.sessionize2Level]]): identical output,
    * bounded task size.
    *
    * Level 1 partitions the carry window by `(key, time bucket)`, so
    * the largest task holds one key-BUCKET of rows — a hot key with
    * years of history no longer lands on one task (AQE cannot split
    * window exchanges; the key itself must bound the partition).
    * Level 2 repairs bucket boundaries on per-bucket SUMMARIES
    * (buckets × keys rows, orders of magnitude smaller): each bucket's
    * last right-side value carries forward across buckets in one small
    * per-key window — summaries sort AFTER that bucket's markers, so a
    * bucket's carried-in value sees strictly-earlier buckets only
    * (same-bucket matches are level 1's job) — and joins back on
    * `(key, bucket)`. A left row's answer is its level-1 within-bucket
    * carry, else the bucket's carried-in value.
    *
    * Extra precondition over the plain form: right-side `valueCols`
    * must be NON-NULL. Level 1 carries each value column independently
    * (`last(ignoreNulls)` per column — it can mix values from
    * different right rows when some are null) while level 2 carries
    * one whole row (`max(struct)`), so the two forms agree — and the
    * shared-oracle equivalence holds — only when no right value is
    * null. Pre-coalesce nullable right columns before calling —
    * ENFORCED at runtime (a null right value raises a named error).
    *
    * Verified value-for-value: registry `ev_asof_join_2level` shares
    * `ev_asof_join`'s DuckDB ASOF JOIN oracle, and a property test
    * compares both forms against a brute-force reference. */
  def asofJoin2Level(left: DataFrame, right: DataFrame, key: String,
                     timeCol: String, valueCols: Seq[String],
                     bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val tagged = asofTagged(left,
      requireNonNullValues(right, valueCols, "asofJoin2Level"),
      key, timeCol, valueCols)
      .withColumn("__bucket",
        ((col(s"`$timeCol`") - pmod(col(s"`$timeCol`"), lit(bucketWidth)))
          / bucketWidth).cast("long"))
    // Level 1: carry within (key, bucket) — bounded partitions.
    val w1 = Window.partitionBy(col(s"`$key`"), col("__bucket"))
      .orderBy(col(s"`$timeCol`"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried1 = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"`$c`"), ignoreNulls = true).over(w1))
    }
    // Level 2: per-(key, bucket) last right value (right is unique per
    // (key, time), so max(struct(time, values)) picks the latest), then
    // carry ACROSS buckets. Bucket markers (kind 0) sort before that
    // bucket's summary (kind 1), so a marker's carried-in value covers
    // strictly-earlier buckets only.
    val summaries = tagged.where(col("__side") === 0)
      .groupBy(col(s"`$key`"), col("__bucket"))
      .agg(max(struct(col(s"`$timeCol`") +:
        valueCols.map(c => col(s"`$c`")): _*)).as("__s"))
      .select(col(s"`$key`"), col("__bucket"), lit(1).as("__kind"),
        col("__s"))
    val markers = tagged.select(col(s"`$key`"), col("__bucket")).distinct()
      .select(col(s"`$key`"), col("__bucket"), lit(0).as("__kind"),
        lit(null).cast(summaries.schema("__s").dataType).as("__s"))
    val w2 = Window.partitionBy(col(s"`$key`"))
      .orderBy(col("__bucket"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedIn = markers.unionByName(summaries)
      .withColumn("__in", last(col("__s"), ignoreNulls = true).over(w2))
      .where(col("__kind") === 0)
      .select(col(s"`$key`"), col("__bucket"), col("__in"))
    // Stitch: within-bucket carry wins; else the bucket's carried-in.
    val joined = carried1.join(carriedIn, Seq(key, "__bucket"), "left")
    valueCols.foldLeft(joined) { (df, c) =>
        df.withColumn(c,
          coalesce(col(s"`__c_$c`"), col("__in").getField(c)))
      }
      .where(col("__side") === 1)
      .drop(("__side" +: "__bucket" +: "__in" +:
        valueCols.map(c => s"__c_$c")): _*)
  }

  /** TWO-LEVEL forward as-of join — [[asofJoinForward]]'s hot-key
    * mitigation, the mirror of [[asofJoin2Level]]: level 1 carries the
    * FIRST right value forward-to-backward within `(key, bucket)`
    * partitions; level 2 repairs bucket boundaries on per-bucket
    * summaries — each bucket's EARLIEST right row — carried in from
    * strictly-LATER buckets (descending-bucket order, markers before
    * their own bucket's summary, so a marker's carried-in value is the
    * nearest later bucket's earliest row). Identical output to the
    * plain form (shared oracle + property test).
    *
    * Same extra precondition as [[asofJoin2Level]]: right-side
    * `valueCols` must be NON-NULL — level 1 carries columns
    * independently while level 2 carries one `min(struct)` row, and
    * they only agree when no right value is null. ENFORCED at runtime,
    * like [[asofJoin2Level]]. */
  def asofJoinForward2Level(left: DataFrame, right: DataFrame,
                            key: String, timeCol: String,
                            valueCols: Seq[String],
                            bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val tagged = asofTagged(left,
      requireNonNullValues(right, valueCols, "asofJoinForward2Level"),
      key, timeCol, valueCols)
      .withColumn("__bucket",
        ((col(s"`$timeCol`") - pmod(col(s"`$timeCol`"), lit(bucketWidth)))
          / bucketWidth).cast("long"))
    // Level 1: forward carry within (key, bucket) — bounded partitions.
    val w1 = Window.partitionBy(col(s"`$key`"), col("__bucket"))
      .orderBy(col(s"`$timeCol`"), col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried1 = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"__c_$c",
        first(col(s"`$c`"), ignoreNulls = true).over(w1))
    }
    // Level 2: per-(key, bucket) EARLIEST right value (min(struct)),
    // carried ACROSS buckets from the later side.
    val summaries = tagged.where(col("__side") === 0)
      .groupBy(col(s"`$key`"), col("__bucket"))
      .agg(min(struct(col(s"`$timeCol`") +:
        valueCols.map(c => col(s"`$c`")): _*)).as("__s"))
      .select(col(s"`$key`"), col("__bucket"), lit(1).as("__kind"),
        col("__s"))
    val markers = tagged.select(col(s"`$key`"), col("__bucket")).distinct()
      .select(col(s"`$key`"), col("__bucket"), lit(0).as("__kind"),
        lit(null).cast(summaries.schema("__s").dataType).as("__s"))
    // Descending buckets; a marker (kind 0) precedes its own bucket's
    // summary (kind 1), so its last-non-null predecessor is the
    // NEAREST strictly-later bucket's summary.
    val w2 = Window.partitionBy(col(s"`$key`"))
      .orderBy(col("__bucket").desc, col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedIn = markers.unionByName(summaries)
      .withColumn("__in", last(col("__s"), ignoreNulls = true).over(w2))
      .where(col("__kind") === 0)
      .select(col(s"`$key`"), col("__bucket"), col("__in"))
    val joined = carried1.join(carriedIn, Seq(key, "__bucket"), "left")
    valueCols.foldLeft(joined) { (df, c) =>
        df.withColumn(c,
          coalesce(col(s"`__c_$c`"), col("__in").getField(c)))
      }
      .where(col("__side") === 1)
      .drop(("__side" +: "__bucket" +: "__in" +:
        valueCols.map(c => s"__c_$c")): _*)
  }

  /** NEAREST as-of join — the third merge_asof direction
    * (pandas `direction='nearest'`): each left row matches the right
    * row with the same key whose time is CLOSEST in either direction;
    * an exact tie in distance resolves BACKWARD (the at-or-before
    * row), pandas' convention. Composed from the two directional
    * carries — one backward pass, one forward pass, stitched per left
    * row on `idCol` with an integer distance compare. No new shuffle
    * shape: two union-and-carry passes plus one id-keyed join; a
    * hot-key deployment swaps in the 2-level directional forms, the
    * stitch is direction-agnostic.
    *
    * Preconditions: those of [[asofJoin]] / [[asofJoinForward]], plus
    * `idCol` must uniquely identify left rows (the stitch key),
    * `__rt`/`__b_*`/`__f_*` must not collide with caller columns, and
    * right-side `valueCols` must be NON-NULL (the 2-level forms'
    * precondition: per-column `last/first(ignoreNulls)` carries could
    * otherwise mix a different row's value with the direction chosen
    * by the carried match time; ENFORCED at runtime — a null right
    * value raises a named error). Unmatched-on-both-sides rows carry
    * nulls. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      timeCol: String, idCol: String,
                      valueCols: Seq[String],
                      bucketWidth: Option[Long] = None): DataFrame = {
    val rt = "__rt"
    val r2 = requireNonNullValues(right, valueCols, "asofJoinNearest")
      .withColumn(rt, col(s"`$timeCol`"))
    val vc = valueCols :+ rt
    // bucketWidth selects the hot-key-safe 2-LEVEL directional carries
    // (the stitch is direction-agnostic, so the bounded-task discipline
    // composes for free; right values are non-null per the
    // precondition, which is exactly the 2-level forms' own rule)
    val backRaw = bucketWidth
      .map(w => asofJoin2Level(left, r2, key, timeCol, vc, w))
      .getOrElse(asofJoin(left, r2, key, timeCol, vc))
    val fwdRaw = bucketWidth
      .map(w => asofJoinForward2Level(left, r2, key, timeCol, vc, w))
      .getOrElse(asofJoinForward(left, r2, key, timeCol, vc))
    val back = vc.foldLeft(backRaw) {
      (d, c) => d.withColumnRenamed(c, s"__b_$c")
    }
    val fwd = vc.foldLeft(
        fwdRaw.select((idCol +: vc).map(c => col(s"`$c`")): _*)) {
      (d, c) => d.withColumnRenamed(c, s"__f_$c")
    }
    val joined = back.join(fwd, Seq(idCol))
    val t = col(s"`$timeCol`")
    val pickBackward = col(s"__b_$rt").isNotNull &&
      (col(s"__f_$rt").isNull ||
        (t - col(s"__b_$rt")) <= (col(s"__f_$rt") - t))
    valueCols.foldLeft(joined) { (df, c) =>
        df.withColumn(c, when(pickBackward, col(s"`__b_$c`"))
          .otherwise(col(s"`__f_$c`")))
      }
      .drop(vc.flatMap(c => Seq(s"__b_$c", s"__f_$c")): _*)
  }

  /** Interval-containment RANGE join: every (point, interval) pair with
    * `start <= t <= end` (inclusive both ends), with NO equi-key — the
    * second time-series join Spark lacks as a primitive (a bare
    * `t BETWEEN start AND end` condition has no equi conjunct, so
    * Catalyst can only plan BroadcastNestedLoopJoin or a cartesian
    * product: per-pair work, dead at 100 TB).
    *
    * Spark-first shape — bucket decomposition (the same trick behind
    * Databricks' range-join optimization, re-expressed with public
    * operators): intervals explode to one row per covered coarse time
    * bucket (`sequence(start div w, end div w)`), points map to their
    * single bucket (`t div w`), the two sides HASH-join on the bucket
    * column, and the exact containment predicate filters the bucket-mates.
    * Each qualifying pair meets in exactly ONE bucket (the point's), so
    * no dedup pass is needed. Work is ∝ points + intervals ×
    * (length/`bucketWidth`) + true matches — linear, shuffled on a
    * uniformly-distributed bucket key; pick `bucketWidth` near the median
    * interval length (a giant outlier interval costs length/width cheap
    * replicas, never a cross product).
    *
    * Preconditions: `start <= end` on every interval (enforced: violating
    * rows are dropped, matching `BETWEEN`'s empty-interval semantics);
    * point and interval column names must be disjoint. Times are integral
    * (epoch micros); buckets use exact integer floor-division. */
  def rangeJoin(points: DataFrame, pointTime: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val common = points.columns.toSet.intersect(intervals.columns.toSet)
    require(common.isEmpty,
      s"point/interval column names must be disjoint; both have: $common")
    // Exact floor-division for longs: (c - mod) is an exact multiple of
    // w, and dividing two exactly-representable doubles whose quotient
    // is an integer is exact — no precision edge at epoch-micros scale.
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val iv = intervals
      .where(col(s"`$startCol`") <= col(s"`$endCol`"))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(s"`$startCol`")), bucketOf(col(s"`$endCol`")))))
    val pt = points.withColumn("__bucket", bucketOf(col(s"`$pointTime`")))
    pt.join(iv, "__bucket")
      .where(col(s"`$pointTime`").between(
        col(s"`$startCol`"), col(s"`$endCol`")))
      .drop("__bucket")
  }

  /** Persist a table BUCKETED (and sorted) by its join key — the
    * co-location tool for big-to-big equi-joins that recur on the same
    * key: two tables bucketed the same way join with NO exchange on
    * either side (each task reads matching bucket files), which at
    * 100 TB removes the single largest cost of a repeated fact-fact
    * join. Bucketing goes through the session catalog (`saveAsTable` —
    * bucket metadata lives in the table definition, not the files), so
    * this is the ingest-side twin of [[saltedJoin]]'s read-side skew
    * fix: pay one clustered write, then every later join is
    * shuffle-free. A `PlanQualitySpec` test proves the join plan has no
    * Exchange and one SortMergeJoin over bucketed scans. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
