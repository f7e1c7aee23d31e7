package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

/** The query registry: one named entry per operator from SURVEY.md §2
  * (reference parity) plus the scale extensions (dedup / similarity /
  * text analysis / events). Every SQL-expressible entry has a DuckDB
  * oracle in [[Registry.oracles]] with IDENTICAL column names and an
  * identical ORDER BY, so the driver's hash-compare is deterministic.
  *
  * Determinism rules used throughout:
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - double aggregates go through exact DECIMAL sums and are cast back
  *    to DOUBLE at the end (bit-identical in Spark and DuckDB);
  *  - raw double columns are passed through untouched (bit-identical);
  *  - division is performed once, on already-exact operands.
  */
object Registry {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact decimal view of a 2-decimal double column. */
  private def dec2(name: String): Column = col(name).cast(DecimalType(18, 2))
  private val one = lit(new java.math.BigDecimal("1.00"))
  private def asDouble(c: Column): Column = c.cast(DoubleType)

  // ---------------------------------------------------------------------
  // Reference parity: aggregation (A1/A2 analogs), the flagship q1.
  // ---------------------------------------------------------------------

  private val core: Map[String, Q] = Map(
    // Flagship pricing-summary aggregation (A2-family group-by over the
    // fact table). Filter is pushed to the parquet scan; sums are exact
    // decimal, emitted as double.
    "q1_agg" -> ((s, dir) => {
      val disc = col("l_discount").cast(DecimalType(4, 2))
      val tax = col("l_tax").cast(DecimalType(4, 2))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-03").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asDouble(sum(dec2("l_quantity"))).as("sum_qty"),
          asDouble(sum(dec2("l_extendedprice"))).as("sum_base_price"),
          asDouble(sum(dec2("l_extendedprice") * (one - disc))).as("sum_disc_price"),
          asDouble(sum(dec2("l_extendedprice") * (one - disc) * (one + tax))).as("sum_charge"),
          (asDouble(sum(dec2("l_quantity"))) / count(lit(1))).as("avg_qty"),
          (asDouble(sum(dec2("l_extendedprice"))) / count(lit(1))).as("avg_price"),
          (asDouble(sum(disc)) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // J1 (Form700.py:346-352): broadcast left-outer equi-join of the fact
    // table with a small dimension projection — cover→schedule analog.
    "j1_filer_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val dim = t(s, dir, "orders").select(
        col("o_orderkey").as("l_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      // (l_orderkey, l_linenumber) is not unique in the synthetic data;
      // adding l_quantity leaves only full-row duplicates tied, which
      // makes the sort order-stable for the hash compare.
      Joins.filerToSchedule(fact, dim, "l_orderkey", dim.columns.toIndexedSeq)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // P2 (Form700.py:249-253): schema projection — prune + reorder.
    "p2_projection" -> ((s, dir) =>
      Cleaning.projectToSchema(t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_mktsegment")).orderBy("c_custkey")),

    // A2 (form700_cover_schema.csv:42-48): per-key schedule counts,
    // recomputed as a group-by (the reference consumes them pre-computed).
    "a2_group_counts" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("order_count")).orderBy("o_custkey")),

    // A1 (Form700.py:611-618): row-count audit across all tables.
    "a1_count_audit" -> ((s, dir) => {
      val counts = Seq("lineitem", "orders", "customer", "events",
        "documents").map { n =>
        t(s, dir, n).agg(count(lit(1)).as("n"))
          .select(lit(n).as("table_name"), col("n"))
      }
      counts.reduce(_.unionAll(_)).orderBy("table_name")
    }),

    // S3 page concat (Form700.py:136-144): UNION ALL of page subsets.
    "union_pages" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      o.filter(col("o_orderstatus") === "F")
        .unionAll(o.filter(col("o_orderstatus") =!= "F"))
        .orderBy("o_orderkey")
    })
  )

  private val coreOracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-03'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "j1_filer_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
        |  o.o_custkey, o.o_orderstatus, o.o_totalprice
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |ORDER BY l.l_orderkey, l.l_linenumber, l.l_quantity""".stripMargin,
    "p2_projection" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",
    "a2_group_counts" ->
      "SELECT o_custkey, COUNT(*) AS order_count FROM orders GROUP BY o_custkey ORDER BY o_custkey",
    "a1_count_audit" ->
      """SELECT table_name, n FROM (
        |  SELECT 'lineitem' AS table_name, COUNT(*) AS n FROM lineitem
        |  UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |  UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |  UNION ALL SELECT 'events', COUNT(*) FROM events
        |  UNION ALL SELECT 'documents', COUNT(*) FROM documents
        |) ORDER BY table_name""".stripMargin,
    "union_pages" ->
      """SELECT o_orderkey, o_orderstatus FROM (
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'F'
        |) ORDER BY o_orderkey""".stripMargin
  )

  // ---------------------------------------------------------------------
  // Public registry
  // ---------------------------------------------------------------------

  val queries: Map[String, Q] = core
  val oracles: Map[String, String] = coreOracles
}
