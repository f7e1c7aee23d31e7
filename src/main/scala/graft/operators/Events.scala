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
  * (a) two-level sessionization: pre-segment each user's stream by a
  * coarse time bucket `(user_id, day)`, sessionize within buckets, then
  * merge only the bucket-boundary sessions — bounding any task at one
  * user-day; or (b) route known hot keys (bots, service accounts)
  * through a dedicated pre-aggregated path. At fixture scale the plain
  * per-user window is correct and fastest, so that is what runs here.
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
  def sessionize(df: DataFrame, gapSeconds: Long): DataFrame = {
    val us = unix_micros(col("ts"))
    val order = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val withUs = df.select(col("user_id"), col("event_id"), us.as("us"))
    val gap = col("us") - lag(col("us"), 1).over(order)
    val brk = when(gap.isNull || gap > gapSeconds * 1000000L, 1).otherwise(0)
    val sid = sum(brk).over(order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow))
    withUs.withColumn("session_id", sid.cast(LongType))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

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
}
