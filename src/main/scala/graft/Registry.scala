package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._
import graft.functions.AsciiBackslash.asciiBackslash

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
          // Money sums round to scale 2 (exact decimal rounding, the
          // same on both engines for positive sums: Spark's decimal
          // cast is HALF_UP, the oracle uses DuckDB ROUND — its
          // decimal CAST truncates) BEFORE the double cast: a
          // high-scale sum whose unscaled value exceeds 2^53 hits
          // engine-divergent decimal→double rounding (DuckDB divides
          // two doubles; Spark rounds the BigDecimal) — measured at
          // the 10× scale step on sum_charge (scale 6, unscaled
          // 2.8e16); at scale 2 the boundary moves out to ~$90 T.
          asDouble(sum(dec2("l_extendedprice") * (one - disc))
            .cast(DecimalType(38, 2))).as("sum_disc_price"),
          asDouble(sum(dec2("l_extendedprice") * (one - disc) * (one + tax))
            .cast(DecimalType(38, 2))).as("sum_charge"),
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

    // Semi/anti join surface: customers WITH at least one order (semi —
    // no duplication, unlike an inner join) and customers WITHOUT any
    // (anti), tagged and unioned. Both plan as one hash join that
    // probes-and-stops per key; the anti is the orphan-detection shape
    // every audit pipeline runs.
    "j2_semi_anti" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val ordKeys = t(s, dir, "orders").select("o_custkey")
      val semi = cust.join(ordKeys,
          cust("c_custkey") === ordKeys("o_custkey"), "left_semi")
        .withColumn("has_orders", lit(true))
      val anti = cust.join(ordKeys,
          cust("c_custkey") === ordKeys("o_custkey"), "left_anti")
        .withColumn("has_orders", lit(false))
      semi.unionAll(anti).orderBy("c_custkey")
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

    // A1-family audit via Dataset.observe — metrics collected ON THE
    // SAME PASS as the main action, not a second scan: the reference's
    // rowsInserted==total audit re-aggregates its frame; at 100 TB a
    // second full scan per audit is the difference between auditing
    // everything and auditing nothing. observe() attaches aggregate
    // expressions to the plan (CollectMetrics node), the noop write
    // materializes the projection once, and Observation.get returns
    // the metrics the SAME pass computed. The returned one-row frame
    // is built from those metrics — the oracle recomputes them
    // independently, so a metrics bug cannot hide. Exact decimal sum
    // (the q1_agg rounding convention) before the double cast.
    "a4_observe_metrics" -> ((s, dir) => {
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation()
      val observed = t(s, dir, "lineitem")
        .select(col("l_quantity"), col("l_returnflag"))
        .observe(obs,
          count(lit(1)).as("n_rows"),
          asDouble(sum(dec2("l_quantity"))).as("sum_qty"),
          count(when(col("l_returnflag") === "R", 1)).as("n_returned"))
      observed.write.format("noop").mode("overwrite").save()
      val m = obs.get
      Seq((m("n_rows").asInstanceOf[Long],
        m("sum_qty").asInstanceOf[Double],
        m("n_returned").asInstanceOf[Long]))
        .toDF("n_rows", "sum_qty", "n_returned")
    }),

    // S3 page concat (Form700.py:136-144): UNION ALL of page subsets.
    "union_pages" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      o.filter(col("o_orderstatus") === "F")
        .unionAll(o.filter(col("o_orderstatus") =!= "F"))
        .orderBy("o_orderkey")
    }),

    // Multi-join analytic query (TPC-H q3 shape): 3-table join chain
    // with filters on both dims, aggregation, total order, LIMIT.
    // Catalyst gets to reorder the joins and broadcast the pruned
    // customer side; the date filters push into the scans.
    "q3_shipping" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15").cast(TimestampType))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast(TimestampType))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast(StringType).as("o_orderdate"),
          col("o_orderpriority"))
        .agg(asDouble(sum(dec2("l_extendedprice") *
          (one - col("l_discount").cast(DecimalType(4, 2)))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Six-table join chain (TPC-H q5 shape): the join-planning
    // showcase. region/nation prune to tiny broadcast sides, the
    // customer-nation = supplier-nation conjunct closes the cycle, and
    // Catalyst + AQE pick the join order; date filters push to scans.
    // (Date window 1996 — the synthetic data spans 1995-2001, not
    // TPC-H's 1992-1998.)
    "q5_local_supplier" -> ((s, dir) => {
      val region = t(s, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nation, col("s_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(asDouble(sum(dec2("l_extendedprice") *
          (one - col("l_discount").cast(DecimalType(4, 2)))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Single-pass filter-aggregate (TPC-H q6 shape): every predicate
    // pushes to the parquet scan; the whole query is scan → one-row agg.
    "q6_forecast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(asDouble(sum(dec2("l_extendedprice") *
          col("l_discount").cast(DecimalType(4, 2)))).as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q14 shape (type revenue share): month-filtered lineitems
    // join the broadcast part dim; one aggregate emits the class
    // numerator, the total, and their double ratio — conditional
    // aggregation over a dimension attribute.
    "q14_type_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-02-01").cast(TimestampType))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val rev = dec2("l_extendedprice") *
        (one - col("l_discount").cast(DecimalType(4, 2)))
      li.join(broadcast(t(s, dir, "part")
          .select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          asDouble(sum(when(col("p_type") === "ECONOMY", rev)
            .otherwise(lit(new java.math.BigDecimal("0.00"))
              .cast(DecimalType(18, 2))))).as("economy_revenue"),
          asDouble(sum(rev)).as("total_revenue"))
        .select(col("economy_revenue"), col("total_revenue"),
          (col("economy_revenue") * 100.0 / col("total_revenue"))
            .as("economy_share"))
    }),

    // TPC-H Q10 shape (returned-item report): quarter-filtered orders
    // join returned lineitems and customers; nation broadcast; top 20
    // accounts by lost revenue — filters reach the scans, the nation
    // dim broadcasts, the top-k is a bounded TakeOrdered.
    "q10_returned" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-04-01").cast(TimestampType))
        .select("o_orderkey", "o_custkey")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(t(s, dir, "customer"),
          ord("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          asDouble(col("c_acctbal")).as("c_acctbal"), col("n_name"))
        .agg(asDouble(sum(dec2("l_extendedprice") *
          (one - col("l_discount").cast(DecimalType(4, 2)))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape (large-volume orders): the quantity rollup runs
    // FIRST (map-side-combined, order-key-bounded) and its HAVING cut
    // shrinks the join input to the few hundred qualifying orders
    // before any customer data moves.
    "q18_big_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(asDouble(sum(dec2("l_quantity"))).as("sum_qty"))
        .where(col("sum_qty") > 250.0)
      big.join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast(StringType).as("o_orderdate"),
          asDouble(col("o_totalprice")).as("o_totalprice"),
          col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Corpus-level vocabulary statistics: global 3-gram frequencies,
    // top 20 — the one heavy text AGGREGATION next to the per-document
    // text operators (shuffle on the shingle, map-side combine).
    "tx_ngram_freq" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(Dedup.shingles(col("text"))).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("shingle"))
        .limit(20)),

    // K-family sink format coverage: write-then-read roundtrips through
    // other columnar/text formats must be lossless — the oracle is the
    // original table itself.
    "k_csv_roundtrip" -> ((s, dir) => {
      val out = graft.Scratch.dir("graft_csv_rt")
      val n = t(s, dir, "nation")
      n.write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true").schema(n.schema).csv(out)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),
    "k_orc_roundtrip" -> ((s, dir) => {
      val out = graft.Scratch.dir("graft_orc_rt")
      val n = t(s, dir, "nation")
      n.write.mode("overwrite").orc(out)
      s.read.orc(out)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),
    // JSON-lines sink → source roundtrip, completing the format family
    // (parquet everywhere, CSV, ORC, and the nested-JSON reader of the
    // E1 pipeline); schema pinned on read like the CSV twin.
    "k_json_roundtrip" -> ((s, dir) => {
      val out = graft.Scratch.dir("graft_json_rt")
      val n = t(s, dir, "nation")
      n.write.mode("overwrite").json(out)
      s.read.schema(n.schema).json(out)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),
    // Schema EVOLUTION at the source: two parquet generations — the
    // second gains a column — read back through mergeSchema, old rows
    // null-filling the new column (sentineled to keep the relational
    // edge integral). The ingest-drift capability every long-lived
    // pipeline eventually needs; the oracle derives the same rows from
    // the generation rule.
    "k_schema_evolution" -> ((s, dir) => {
      val base = graft.Scratch.dir("graft_schema_evo")
      val o = t(s, dir, "orders")
      o.where(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .write.mode("overwrite").parquet(base + "/g1")
      o.where(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice")
        .write.mode("overwrite").parquet(base + "/g2")
      s.read.option("mergeSchema", "true")
        .parquet(base + "/g1", base + "/g2")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"),
          coalesce(col("o_totalprice"), lit(-1.0)).as("o_totalprice"))
        .orderBy("o_orderkey")
    }),
    // Small-file compaction: the orders table deliberately fragmented
    // into 64 files, rewritten to size-targeted files, read back
    // losslessly (the oracle is the table itself). LayoutSpec asserts
    // the file count actually collapses and the sizing math.
    "k_compact" -> ((s, dir) => {
      val frag = graft.Scratch.dir("graft_compact_src")
      val out = graft.Scratch.dir("graft_compact_dst")
      t(s, dir, "orders").repartition(64)
        .write.mode("overwrite").parquet(frag)
      Layout.compact(s, frag, out, targetBytes = 64L << 20)
      s.read.parquet(out)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority")
        .orderBy("o_orderkey")
    })
  )

  private val coreOracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
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
    "j2_semi_anti" ->
      """SELECT c_custkey, c_mktsegment, TRUE AS has_orders
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, FALSE AS has_orders
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
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
    "a4_observe_metrics" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned
        |FROM lineitem""".stripMargin,
    "union_pages" ->
      """SELECT o_orderkey, o_orderstatus FROM (
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'F'
        |) ORDER BY o_orderkey""".stripMargin,
    "q3_shipping" ->
      """SELECT l.l_orderkey,
        |  CAST(o.o_orderdate AS VARCHAR) AS o_orderdate, o.o_orderpriority,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST('1.00' AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l.l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "q14_type_share" ->
      """WITH j AS (
        |  SELECT p.p_type,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST('1.00' AS DECIMAL(3,2)) -
        |       CAST(l.l_discount AS DECIMAL(4,2))) AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l.l_shipdate < TIMESTAMP '1996-02-01'),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN rev
        |      ELSE CAST('0.00' AS DECIMAL(18,2)) END) AS DOUBLE)
        |      AS economy_revenue,
        |    CAST(SUM(rev) AS DOUBLE) AS total_revenue
        |  FROM j)
        |SELECT economy_revenue, total_revenue,
        |  economy_revenue * 100.0 / total_revenue AS economy_share
        |FROM a""".stripMargin,
    "q10_returned" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(c.c_acctbal AS DOUBLE) AS c_acctbal, n.n_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST('1.00' AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,
    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |  CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
        |  CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, big.sum_qty
        |FROM big
        |JOIN orders o ON big.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_forecast" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24""".stripMargin,
    "tx_ngram_freq" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 3
        |  THEN list_transform(generate_series(1, len(w) - 2),
        |                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |  ELSE CAST([] AS VARCHAR[]) END)) AS shingle FROM w)
        |SELECT shingle, count(*) AS n FROM sh
        |GROUP BY shingle ORDER BY n DESC, shingle LIMIT 20""".stripMargin,
    "k_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "k_orc_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "k_json_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "k_schema_evolution" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice
        |    ELSE -1.0 END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "k_compact" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )

  // ---------------------------------------------------------------------
  // Cleaning kernel (F1–F5, Form700.py:246-298)
  // ---------------------------------------------------------------------

  private val cleaning: Map[String, Q] = Map(
    // F1: strip newlines from every string column of a table.
    "f1_remove_newlines" -> ((s, dir) =>
      Cleaning.removeNewLines(t(s, dir, "documents")).orderBy("doc_id")),

    // F2 (+F3/F4): the reference's letter→'0' sanitize quirk, then the
    // long-with-0-default cast chain ("15%" → "150" → 150).
    "f2_number_sanitize" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        Cleaning.sanitizeNumber(col("p_name")).as("sanitized"),
        Cleaning.toLongOrZero(
          concat(col("p_size").cast(StringType), lit("%"))).as("as_number"))
        .orderBy("p_partkey")),

    // F3: null defaults after an outer join introduces missing values.
    "f3_null_defaults" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey")
      val cnts = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("order_count"))
      cust.join(cnts, Seq("c_custkey"), "left_outer")
        .na.fill(0L, Seq("order_count"))
        .orderBy("c_custkey")
    }),

    // F4: try-cast semantics — parse digits out of a text field; a
    // non-numeric field falls back to the -1 sentinel.
    "f4_try_cast" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "[0-9]+", 0).try_cast(LongType)
          .as("name_digits"),
        coalesce(col("c_mktsegment").try_cast(LongType), lit(-1L))
          .as("seg_num"))
        .orderBy("c_custkey")),

    // F5: native ascii-backslash expression (Form700.py:291-294). The
    // fixture text is pure ASCII so the oracle is identity; non-ASCII
    // semantics are covered by CleaningSpec.
    "f5_ascii_backslash" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), asciiBackslash(col("text")).as("escaped"))
        .orderBy("doc_id"))
  )

  private val cleaningOracles: Map[String, String] = Map(
    "f1_remove_newlines" ->
      """SELECT doc_id, regexp_replace(text, '\n', '', 'g') AS text,
        |  regexp_replace(lang, '\n', '', 'g') AS lang,
        |  regexp_replace(source, '\n', '', 'g') AS source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f2_number_sanitize" ->
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[a-zA-Z%]', '0', 'g') AS sanitized,
        |  COALESCE(TRY_CAST(regexp_replace(p_size || '%', '[a-zA-Z%]', '0', 'g') AS BIGINT), 0) AS as_number
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f3_null_defaults" ->
      """SELECT c.c_custkey, COALESCE(o.order_count, 0) AS order_count
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS order_count FROM orders
        |  WHERE o_orderstatus = 'F' GROUP BY o_custkey
        |) o ON c.c_custkey = o.o_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "f4_try_cast" ->
      """SELECT c_custkey,
        |  TRY_CAST(regexp_extract(c_name, '[0-9]+') AS BIGINT) AS name_digits,
        |  COALESCE(TRY_CAST(c_mktsegment AS BIGINT), -1) AS seg_num
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f5_ascii_backslash" ->
      "SELECT doc_id, text AS escaped FROM documents ORDER BY doc_id"
  )

  // ---------------------------------------------------------------------
  // Restructuring kernel (P1, X1–X3, Form700.py:306-383)
  // ---------------------------------------------------------------------

  /** Once-per-(session, sfDir) pre-materialized JSON-document fixture
    * for the VARIANT queries (p6/p7): one parquet of (event_id, doc)
    * where doc is a deterministic nested document over the row's base
    * columns — an object, a string array, a nested object, and a
    * MIXED-TYPE array (string, number, object, JSON null) that an
    * ArrayType column could not hold. Materializing once means the
    * queries time parse_json + path access over stored text (the
    * honest schema-on-read cost), not to_json document construction.
    * Keyed on the session OBJECT via WeakHashMap — identity hashes can
    * be reused after a stopped session is GC'd. */
  private val variantFixture =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, String]]()

  private def ensureVariantFixture(s: SparkSession, dir: String): String =
    variantFixture.synchronized {
      variantFixture.computeIfAbsent(s,
          _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate(dir, {
          val out = graft.Scratch.dir("graft_variant_docs")
          val k = coalesce(get_json_object(col("props"), "$.k"), lit("null"))
          t(s, dir, "events").select(col("event_id"),
            concat(
              lit("{\"id\": "), col("event_id"),
              lit(", \"tags\": [\""), col("event_type"), lit("\", \"u"),
              col("user_id"),
              lit("\"], \"m\": {\"k\": "), k, lit(", \"vm\": "),
              graft.operators.Events.micros(col("value")),
              lit("}, \"arr\": [\""), col("event_type"), lit("\", "),
              col("user_id"), lit(", {\"k\": "), k,
              lit("}, null]}")).as("doc"))
            // Write at session shuffle-partition parallelism: the
            // driver's small-sf events.parquet is ONE file → one read
            // split, and without this the fixture inherits that
            // layout, so every p6/p7 rep parse_json's the whole corpus
            // on a single core (round-18's "sf0.1 slower than sf1"
            // wall inversion — 10× the rows, 10× the files, 10× the
            // parallelism). Layout is part of the fixture contract the
            // same way ScaleData repartitions its derived tables.
            .repartition(s.sessionState.conf.numShufflePartitions)
            .write.mode("overwrite").parquet(out)
          out
        })
    }

  private val restructure: Map[String, Q] = Map(
    // X1: array-of-struct → "k:v,k:v|k:v" string (Form700.py:306-323).
    // The array is built with a deterministic sort so Spark and the
    // oracle agree on struct order.
    "x1_serialize" -> ((s, dir) => {
      val arr = t(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(sort_array(collect_list(
          struct(col("n_nationkey"), col("n_name")))).as("members"))
      Restructure.serializeStructArray(arr, "members").orderBy("n_regionkey")
    }),

    // X2: generator explode with position (LATERAL VIEW OUTER analog).
    "x2_explode" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), posexplode_outer(split(col("p_name"), " ")))
        .select(col("p_partkey"), col("pos").cast(LongType).as("pos"),
          col("col").as("word"))
        .orderBy("p_partkey", "pos")),

    // X2+X3 (Form700.py:354-383): explode an array-of-struct back to
    // child rows with prefixed column names — round-trips lineitem
    // through collect_list(struct(...)) → explode_outer.
    "x3_explode_prefix" -> ((s, dir) => {
      val nested = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(
          struct(col("l_linenumber"), col("l_quantity")))).as("items"))
      Restructure.explodeStructArray(nested, "items", Some("item"))
        .orderBy("l_orderkey", "itemL_linenumber", "itemL_quantity")
    }),

    // P1 (json_normalize): parse a JSON payload column and flatten the
    // struct into dotted top-level columns.
    "p1_flatten_json" -> ((s, dir) => {
      val parsed = t(s, dir, "events").select(
        col("event_id"),
        from_json(col("props"),
          StructType(Seq(StructField("k", LongType)))).as("props"))
      Restructure.flattenStruct(parsed).orderBy("event_id")
    }),

    // Spark 4 VARIANT — the engine-native semi-structured path (the
    // successor to from_json-with-a-schema for schema-on-read): a
    // nested JSON document from the PRE-MATERIALIZED fixture (one
    // parquet write per (session, sfDir) — the query times parse_json
    // + path extraction over stored text, the honest VARIANT cost, not
    // document construction) is parsed ONCE into a VARIANT value and
    // fields are extracted by PATH with typed `variant_get` (object
    // step, array index, nested object). The binary variant encoding
    // makes repeated path access O(field) per row instead of
    // re-tokenizing text — the property that matters when a crawl's
    // metadata column is read by many downstream queries at 100 TB.
    // The oracle is STRONGER than a JSON replay: it derives every
    // extracted value independently from the base columns, so a wrong
    // path/type in the Spark plan cannot be mirrored into the check.
    "p6_variant_extract" -> ((s, dir) => {
      val fx = ensureVariantFixture(s, dir)
      s.read.parquet(fx)
        .select(col("event_id"), parse_json(col("doc")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.id", "bigint").as("vid"),
          variant_get(col("v"), "$.tags[1]", "string").as("tag1"),
          variant_get(col("v"), "$.m.k", "bigint").as("k"),
          variant_get(col("v"), "$.m.vm", "bigint").as("vm"))
        .where(col("k") > 50)
        .orderBy("event_id")
    }),

    // VARIANT array iteration — the other half of the VARIANT surface
    // (p6 covers typed path extraction): `variant_explode` lateral-
    // walks a MIXED-TYPE variant array (string, number, object, null —
    // the shape schema-on-read exists for; an ArrayType column cannot
    // even hold it), and `try_variant_get` gives per-element type-miss
    // semantics: a cast that does not apply yields NULL instead of
    // failing the query — string→bigint misses, number→string renders
    // ("46"), object→string renders its compact JSON text, a JSON null
    // element occupies its position with every extraction NULL, and
    // only the object element answers the '$.k' path. Oracle = the
    // per-position rows derived independently from the base columns
    // (4 rows per event, never touching JSON).
    "p7_variant_explode" -> ((s, dir) => {
      val fx = ensureVariantFixture(s, dir)
      s.read.parquet(fx)
        .select(col("event_id"), parse_json(col("doc")).as("v"))
        .createOrReplaceTempView("graft_p7_docs")
      // type-misses surface as sentinels ('' / -1), not NULL — the
      // registry's no-NULL output convention (the hash compare is
      // NULL-hostile); the MISS is still visible per element
      s.sql(
        """SELECT event_id, CAST(t.pos AS BIGINT) AS pos,
          |  coalesce(try_variant_get(t.value, '$', 'string'), '')
          |    AS elem_str,
          |  coalesce(try_variant_get(t.value, '$', 'bigint'),
          |    CAST(-1 AS BIGINT)) AS elem_num,
          |  coalesce(try_variant_get(t.value, '$.k', 'bigint'),
          |    CAST(-1 AS BIGINT)) AS k_num
          |FROM graft_p7_docs,
          |  LATERAL variant_explode(variant_get(v, '$.arr')) AS t
          |ORDER BY event_id, pos""".stripMargin)
    }),

    // K2/F7 (Form700.py:465-466): sink-boundary snake_case rename.
    "k2_sink_rename" -> ((s, dir) =>
      Restructure.renameForSink(
        t(s, dir, "documents")
          .select(col("doc_id").as("docId"), col("n_chars").as("nChars")))
        .orderBy("doc_id"))
  )

  private val restructureOracles: Map[String, String] = Map(
    "x1_serialize" ->
      """SELECT n_regionkey,
        |  string_agg('n_nationkey:' || n_nationkey || ',n_name:' || n_name,
        |             '|' ORDER BY n_nationkey) AS members
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "x2_explode" ->
      """SELECT p_partkey,
        |  CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS BIGINT) AS pos,
        |  unnest(string_split(p_name, ' ')) AS word
        |FROM part ORDER BY p_partkey, pos""".stripMargin,
    "x3_explode_prefix" ->
      """SELECT l_orderkey, l_linenumber AS "itemL_linenumber",
        |  l_quantity AS "itemL_quantity"
        |FROM lineitem
        |ORDER BY l_orderkey, "itemL_linenumber", "itemL_quantity"""".stripMargin,
    "p6_variant_extract" ->
      """SELECT event_id, event_id AS vid,
        |  'u' || CAST(user_id AS VARCHAR) AS tag1,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
    // Independent per-position derivation: 4 rows per event straight
    // from the base columns — the oracle never parses JSON, so a wrong
    // lateral walk or cast in the Spark plan cannot be mirrored in.
    // Position semantics verified empirically: number→string renders,
    // string→bigint misses (NULL), object→string is its compact JSON
    // text, the JSON null element is a real position with all
    // extractions NULL.
    "p7_variant_explode" ->
      """WITH base AS (SELECT event_id, event_type, user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |e AS (
        |  SELECT event_id, CAST(0 AS BIGINT) AS pos, event_type AS elem_str,
        |    CAST(-1 AS BIGINT) AS elem_num, CAST(-1 AS BIGINT) AS k_num
        |  FROM base
        |  UNION ALL
        |  SELECT event_id, 1, CAST(user_id AS VARCHAR), user_id, -1
        |  FROM base
        |  UNION ALL
        |  -- mirrors the fixture builder's defensive coalesce of a
        |  -- missing props.k to JSON null: the object element would be
        |  -- '{"k":null}' with the $.k extraction missing (→ -1), never
        |  -- a NULL row (the registry's no-NULL convention)
        |  SELECT event_id, 2,
        |    '{"k":' || coalesce(CAST(k AS VARCHAR), 'null') || '}', -1,
        |    coalesce(k, -1)
        |  FROM base
        |  UNION ALL
        |  SELECT event_id, 3, '', -1, -1 FROM base)
        |SELECT event_id, pos, elem_str, elem_num, k_num
        |FROM e ORDER BY event_id, pos""".stripMargin,
    "p1_flatten_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS "props.k"
        |FROM events ORDER BY event_id""".stripMargin,
    "k2_sink_rename" ->
      "SELECT doc_id, n_chars FROM documents ORDER BY doc_id"
  )

  // ---------------------------------------------------------------------
  // Public registry
  // ---------------------------------------------------------------------

  val queries: Map[String, Q] =
    core ++ cleaning ++ restructure ++ RegistryExt.queries ++
      RegistryForm700.queries ++ RegistryRank.queries ++
      RegistryGraph.queries ++ RegistryOlap.queries ++
      RegistryScalar.queries ++ RegistryCbo.queries
  val oracles: Map[String, String] =
    coreOracles ++ cleaningOracles ++ restructureOracles ++
      RegistryExt.oracles ++ RegistryForm700.oracles ++
      RegistryRank.oracles ++ RegistryGraph.oracles ++
      RegistryOlap.oracles ++ RegistryScalar.oracles ++
      RegistryCbo.oracles
}
