package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Events

/** OLAP query-capability breadth beyond the reference's own surface:
  * correlated subqueries (EXISTS / NOT EXISTS / correlated scalar
  * aggregate — the TPC-H Q4/Q17/Q21/Q22 shapes), set operations
  * (INTERSECT / EXCEPT and their ALL multiset forms), and explicit
  * GROUPING SETS with `grouping_id()`.
  *
  * The correlated queries are deliberately expressed through
  * `spark.sql` over per-query temp views: correlated subqueries have
  * no Column-API spelling, and routing the REAL correlated form
  * through Catalyst is the point — the optimizer must decorrelate
  * them into joins (RewritePredicateSubquery /
  * RewriteCorrelatedScalarSubquery), which PlanQualitySpec asserts.
  * A naive per-outer-row re-execution would be the 100 TB
  * scale-killer; after decorrelation these are ordinary semi/anti/
  * aggregate joins that shuffle on their keys like every other query
  * here. The SAME SQL text (modulo view names) is the DuckDB oracle,
  * so the correlated form is what both engines run.
  *
  * Determinism follows the [[Registry]] rules: exact DECIMAL sums
  * cast to DOUBLE at the end; double comparisons only against
  * thresholds derived from exact sums/counts (IEEE division of
  * identical operands is bit-identical across engines); total ORDER
  * BY everywhere.
  */
private[graft] object RegistryOlap {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Build (query, oracle) from ONE SQL template: `{table}`
    * placeholders become per-query temp views (`graft_<qname>_<table>`)
    * on the Spark side and bare table names in the DuckDB oracle — one
    * definition site keeps the two structurally identical. Views are
    * re-registered per invocation (registry runners are sequential). */
  private def sqlPair(qname: String, tables: Seq[String],
                      template: String): (Q, String) = {
    def render(f: String => String): String =
      tables.foldLeft(template)((acc, tn) =>
        acc.replace("{" + tn + "}", f(tn)))
    val q: Q = (s, dir) => {
      tables.foreach { tn =>
        t(s, dir, tn).createOrReplaceTempView(s"graft_${qname}_$tn")
      }
      s.sql(render(tn => s"graft_${qname}_$tn"))
    }
    (q, render(identity))
  }

  // ---------------------------------------------------------------------
  // Correlated subqueries (TPC-H Q4 / Q17 / Q21 / Q22 shapes)
  // ---------------------------------------------------------------------

  // Q4 shape: priority counts over a quarter of orders having at least
  // one returned line — correlated EXISTS, decorrelated to one left
  // semi join (probe stops at the first match per order; no line
  // duplication reaches the aggregate).
  private val q4 = sqlPair("q4", Seq("orders", "lineitem"),
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM {orders} o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM {lineitem} l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin)

  // Q17 shape: revenue of small-quantity lineitems of one brand, where
  // "small" is a CORRELATED SCALAR AGGREGATE (a fifth of the part's
  // average quantity). Decorrelates to a per-part aggregate joined
  // back — the aggregate runs ONCE over the grouped lineitems, not
  // per outer row. The threshold is exact-decimal sum / (5·count) in
  // DOUBLE: identical operands → identical IEEE quotient → identical
  // row selection on both engines.
  private val q17 = sqlPair("q17", Seq("lineitem", "part"),
    """SELECT
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    / 7.0 AS avg_yearly,
      |  COUNT(*) AS n
      |FROM {lineitem} l JOIN {part} p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#23'
      |  AND l.l_quantity < (
      |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |           / (5.0 * COUNT(*))
      |    FROM {lineitem} l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin)

  // Q21 shape: suppliers who were the ONLY supplier with a returned
  // line on a finished multi-supplier order — EXISTS and NOT EXISTS
  // against the same fact table, decorrelated to one left semi + one
  // left anti join on l_orderkey (the reference predicate l_commitdate
  // < l_receiptdate has no fixture column; l_returnflag = 'R' plays
  // the "failed" marker, same shape).
  private val q21 = sqlPair("q21", Seq("supplier", "lineitem", "orders"),
    """SELECT s.s_name, COUNT(*) AS numwait
      |FROM {supplier} s
      |JOIN {lineitem} l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM {lineitem} l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM {lineitem} l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name""".stripMargin)

  // Q22 shape: per-nation count/balance of above-average-balance
  // customers with no finished order — an UNCORRELATED scalar
  // aggregate (computed once, legitimately kept as a one-shot
  // subquery) gating a correlated NOT EXISTS (decorrelated to a left
  // anti join). The threshold is exact sum / count in DOUBLE, same
  // determinism argument as q17.
  private val q22 = sqlPair("q22", Seq("customer", "orders"),
    """SELECT c.c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    AS totacctbal
      |FROM {customer} c
      |WHERE c.c_acctbal > (
      |    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |           / COUNT(*)
      |    FROM {customer} c2 WHERE c2.c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM {orders} o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F')
      |GROUP BY c.c_nationkey
      |ORDER BY c.c_nationkey""".stripMargin)

  // ---------------------------------------------------------------------
  // Set operations — the DataFrame API surface (intersect / except /
  // intersectAll / exceptAll), each planned as one hash-aggregated
  // semi/anti join on the value — no sort, no all-pairs.
  // ---------------------------------------------------------------------

  private def custsWithStatus(s: SparkSession, dir: String,
                              status: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderstatus") === status)
      .select("o_custkey")

  private val setOps: Map[String, Q] = Map(
    // Customers appearing in BOTH the finished and the open order books
    // (DISTINCT set semantics — INTERSECT dedups by definition).
    "set_intersect" -> ((s, dir) =>
      custsWithStatus(s, dir, "F").intersect(custsWithStatus(s, dir, "O"))
        .orderBy("o_custkey")),
    // Customers with orders but none finished.
    "set_except" -> ((s, dir) =>
      t(s, dir, "orders").select("o_custkey")
        .except(custsWithStatus(s, dir, "F"))
        .orderBy("o_custkey")),
    // Multiset forms over part keys by return status: INTERSECT ALL
    // keeps min(count_R, count_A) copies per key, EXCEPT ALL keeps
    // max(0, count_R − count_A) — the SQL-standard multiset algebra.
    "set_intersect_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_returnflag") === "R").select("l_partkey")
        .intersectAll(
          li.filter(col("l_returnflag") === "A").select("l_partkey"))
        .orderBy("l_partkey")
    }),
    "set_except_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_returnflag") === "R").select("l_partkey")
        .exceptAll(
          li.filter(col("l_returnflag") === "A").select("l_partkey"))
        .orderBy("l_partkey")
    })
  )

  private val setOpsOracles: Map[String, String] = Map(
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |INTERSECT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_partkey""".stripMargin,
    "set_except_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_partkey""".stripMargin
  )

  // ---------------------------------------------------------------------
  // Explicit GROUPING SETS + grouping_id()
  // ---------------------------------------------------------------------

  // Four explicit sets — including the (hod)-only marginal that ROLLUP
  // cannot produce (ev_type_rollup covers ROLLUP; this is the general
  // form). All levels compute in ONE Expand + one shuffle;
  // grouping_id() disambiguates levels exactly like DuckDB's
  // GROUPING(event_type, hod) bitmask (same column order). Sentinels
  // '(all)'/-1 follow the ev_type_rollup convention; gid leads the
  // ORDER BY so levels cannot interleave.
  private val groupingSetsQ: Map[String, Q] = Map(
    "ev_grouping_sets" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_type"),
        hour(col("ts")).cast(LongType).as("hod"),
        Events.micros(col("value")).as("vm"))
      e.groupingSets(
          Seq(Seq(col("event_type"), col("hod")),
            Seq(col("event_type")), Seq(col("hod")), Seq.empty),
          col("event_type"), col("hod"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_events"),
          sum(col("vm")).as("value_micros"))
        .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
          coalesce(col("hod"), lit(-1L)).as("hod"),
          col("gid"), col("n_events"), col("value_micros"))
        .orderBy("gid", "event_type", "hod")
    })
  )

  private val groupingSetsOracles: Map[String, String] = Map(
    "ev_grouping_sets" ->
      """WITH e AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events)
        |SELECT COALESCE(event_type, '(all)') AS event_type,
        |  COALESCE(hod, -1) AS hod,
        |  CAST(GROUPING(event_type, hod) AS BIGINT) AS gid,
        |  count(*) AS n_events, CAST(sum(vm) AS BIGINT) AS value_micros
        |FROM e
        |GROUP BY GROUPING SETS ((event_type, hod), (event_type), (hod), ())
        |ORDER BY gid, event_type, hod""".stripMargin
  )

  val queries: Map[String, Q] = Map(
    "q4_exists" -> q4._1,
    "q17_small_qty" -> q17._1,
    "q21_waiting" -> q21._1,
    "q22_prospects" -> q22._1
  ) ++ setOps ++ groupingSetsQ

  val oracles: Map[String, String] = Map(
    "q4_exists" -> q4._2,
    "q17_small_qty" -> q17._2,
    "q21_waiting" -> q21._2,
    "q22_prospects" -> q22._2
  ) ++ setOpsOracles ++ groupingSetsOracles
}
