package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar / collection function surface of the registry: one query per
  * family batching the portable functions (string, datetime,
  * array, map) through the COLUMN API, each value checked against its
  * DuckDB twin. Only functions with bit-identical cross-engine
  * semantics appear (e.g. `instr`/`strpos` share 1-based/0-absent
  * semantics, `split_part` is the PostgreSQL form in both engines);
  * functions whose conventions diverge (Spark's 1=Sunday `dayofweek`
  * vs DuckDB's 0=Sunday; 3-arg `regexp_replace` vs DuckDB's
  * 'g'-flag) are deliberately absent — a shared-looking name with
  * different semantics is exactly the trap this file pins shut.
  * MapType/ArrayType live in the query MIDDLE; both ends stay
  * relational so the driver's compare applies (the oracle computes
  * the same result map-free — a formulation change the parity
  * contract absorbs).
  */
object RegistryScalar {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // String-function batch over customer: case, padding, slicing,
    // search, distance, regex extract, hashing.
    "f6_string_ops" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        lpad(col("c_name"), 22, "*").as("lpadded"),
        rpad(col("c_mktsegment"), 12, ".").as("rpadded"),
        reverse(col("c_name")).as("rev"),
        repeat(col("c_mktsegment"), 2).as("rep2"),
        expr("left(c_name, 8)").as("l8"),
        expr("right(c_name, 4)").as("r4"),
        instr(col("c_name"), "#").cast(LongType).as("hash_pos"),
        levenshtein(col("c_mktsegment"), lit("BUILDING"))
          .cast(LongType).as("lev"),
        regexp_extract(col("c_name"), "(\\d+)", 1).as("digits"),
        substring(col("c_name"), 10, 4).as("sub4"),
        split_part(col("c_name"), lit("#"), lit(2)).as("after_hash"),
        md5(col("c_name")).as("name_md5"),
        length(col("c_name")).cast(LongType).as("len"),
        ascii(col("c_mktsegment")).cast(LongType).as("first_code"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
        .orderBy("c_custkey")),

    // Unicode NFC normalization — the canonical-composition pass run
    // before hashing/dedup, as a native codegen Expression (Spark has
    // no builtin; DuckDB's nfc_normalize is the oracle twin). Every
    // document gets a DECOMPOSED suffix (e + combining acute) so the
    // composition is exercised on every row: the normalized form is
    // one codepoint shorter and its md5 proves byte-level agreement.
    "f8_nfc_normalize" -> ((s, dir) => {
      val raw = concat(col("text"), lit(" cafe"), lit("\u0301"))
      val norm = graft.functions.NfcNormalize.nfcNormalize(raw)
      t(s, dir, "documents").select(col("doc_id"),
          length(raw).cast(LongType).as("len_raw"),
          length(norm).cast(LongType).as("len_nfc"),
          (length(raw) =!= length(norm)).as("nfc_changed"),
          md5(norm).as("nfc_md5"))
        .orderBy("doc_id")
    }),

    // Datetime-function batch over orders: calendar parts, truncation,
    // interval arithmetic, month end, exact micros epoch. The
    // day-count to Y2K is integer micros arithmetic rather than a
    // datediff call — the two engines' datediff argument conventions
    // differ, and order timestamps are midnight-exact so the division
    // is lossless. o_orderdate reads as TIMESTAMP_NTZ; the cast to
    // TIMESTAMP before unix_micros is value-preserving under the
    // pinned UTC session. month_start normalizes through DATE on both
    // sides (DuckDB's date_trunc returns DATE at day-or-coarser
    // granularity; Spark's returns TIMESTAMP).
    "f7_datetime_ops" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
        quarter(col("o_orderdate")).cast(LongType).as("qtr"),
        date_trunc("month", col("o_orderdate")).cast(DateType)
          .cast(StringType).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).cast(StringType)
          .as("plus_week"),
        ((lit(946684800000000L) - unix_micros(col("o_orderdate").cast(TimestampType)))
          .divide(lit(86400000000L))).cast(LongType).as("days_to_y2k"),
        last_day(col("o_orderdate").cast(DateType)).cast(StringType)
          .as("month_end"),
        unix_micros(col("o_orderdate").cast(TimestampType)).as("us"))
        .orderBy("o_orderkey")),

    // MapType in the middle: per-customer status→count map built from
    // sorted entries, transform_values doubles, map_filter drops
    // singleton statuses, explode back to rows.
    "x4_map_roundtrip" -> ((s, dir) => {
      val counts = t(s, dir, "orders")
        .groupBy("o_custkey", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
      counts.groupBy("o_custkey")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("o_orderstatus"), col("n"))))).as("m"))
        .select(col("o_custkey"),
          explode(map_filter(
            transform_values(col("m"), (_: Column, v: Column) => v * 2),
            (_: Column, v: Column) => v > lit(2L))))
        .select(col("o_custkey"), col("key").as("o_orderstatus"),
          col("value").as("n2"))
        .orderBy("o_custkey", "o_orderstatus")
    }),

    // Aggregate-function breadth: count_if, bool_and/bool_or,
    // min_by/max_by (against a UNIQUE packed ordering key — on a tied
    // plain key both engines pick arbitrarily), and population
    // variance derived from exact integer sums (the squared sum
    // accumulates in DECIMAL — event values reach ~490 so vm² sums
    // overflow BIGINT; the only float is the final division of
    // identical operands). DuckDB spells min_by/max_by as
    // arg_min/arg_max — same semantics. The packed key `vm·1e18 +
    // event_id` is collision-free by construction for 0 <= vm,
    // event_id < 1e18 (exact DECIMAL(38,0) on Spark / HUGEINT in the
    // oracle — DuckDB's arg_min has no struct-key overload), and a
    // per-row assert_true fails the query LOUDLY — not flakily — if a
    // regenerated fixture ever leaves that range.
    "a3_agg_breadth" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        col("event_id"),
        graft.operators.Events.micros(col("value")).as("vm"))
      val packBound = 1000000000000000000L // 1e18
      val guard = assert_true(
        col("event_id").between(0L, packBound - 1) &&
          col("vm").between(0L, packBound - 1),
        lit("a3_agg_breadth packed arg-key requires 0 <= event_id, vm < 1e18"))
      val key = when(guard.isNull,
        col("vm").cast(DecimalType(38, 0)) * lit(packBound) +
          col("event_id"))
      e.groupBy("event_type").agg(
          count_if(col("vm") > 500000L).as("n_big"),
          bool_and(col("vm") > 250000L).as("all_mid"),
          bool_or(col("vm") > 990000L).as("any_huge"),
          min_by(col("event_id"), key).as("min_event"),
          max_by(col("event_id"), key).as("max_event"),
          count(lit(1)).as("n"),
          sum(col("vm")).as("sx"),
          sum(col("vm").cast(DecimalType(19, 0)) * col("vm"))
            .as("sxx"))
        .select(col("event_type"), col("n_big"), col("all_mid"),
          col("any_huge"), col("min_event"), col("max_event"), col("n"),
          (expr("CAST(n AS DECIMAL(38,0)) * sxx") -
            expr("CAST(sx AS DECIMAL(38,0)) * sx")).cast(DoubleType)
            .divide(expr("CAST(n AS DECIMAL(38,0)) * n")
              .cast(DoubleType))
            .as("var_pop"))
        .orderBy("event_type")
    }),

    // ArrayType in the middle: per-customer sorted status set with
    // membership, intersect, except, and first-element reads,
    // serialized back to strings at the edge.
    "x5_array_ops" -> ((s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(array_sort(collect_set(col("o_orderstatus"))).as("sts"))
        .select(col("o_custkey"),
          concat_ws(",", col("sts")).as("status_set"),
          size(col("sts")).cast(LongType).as("n_statuses"),
          array_contains(col("sts"), "F").as("has_f"),
          concat_ws(",", array_sort(array_intersect(col("sts"),
            array(lit("F"), lit("P"))))).as("inter_fp"),
          concat_ws(",", array_sort(array_except(col("sts"),
            array(lit("P"))))).as("minus_p"),
          element_at(col("sts"), 1).as("first_status"))
        .orderBy("o_custkey"))
  )

  val oracles: Map[String, String] = Map(
    "a3_agg_breadth" ->
      """WITH e AS (SELECT event_type, event_id,
        |  CAST(floor(value * 1000000) AS BIGINT) AS vm FROM events),
        |a AS (SELECT event_type,
        |  CAST(count_if(vm > 500000) AS BIGINT) AS n_big,
        |  bool_and(vm > 250000) AS all_mid,
        |  bool_or(vm > 990000) AS any_huge,
        |  arg_min(event_id, CAST(vm AS HUGEINT) * 1000000000000000000
        |    + event_id) AS min_event,
        |  arg_max(event_id, CAST(vm AS HUGEINT) * 1000000000000000000
        |    + event_id) AS max_event,
        |  count(*) AS n, CAST(sum(vm) AS BIGINT) AS sx,
        |  sum(CAST(vm AS DECIMAL(19,0)) * vm) AS sxx
        |FROM e GROUP BY event_type)
        |SELECT event_type, n_big, all_mid, any_huge, min_event,
        |  max_event, n,
        |  CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |      - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
        |    / CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE) AS var_pop
        |FROM a ORDER BY event_type""".stripMargin,
    "f8_nfc_normalize" ->
      """WITH r AS (SELECT doc_id, text || ' cafe' || chr(769) AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
        |  length(raw) <> length(nfc_normalize(raw)) AS nfc_changed,
        |  md5(nfc_normalize(raw)) AS nfc_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    "f6_string_ops" ->
      """SELECT c_custkey,
        |  upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
        |  lpad(c_name, 22, '*') AS lpadded,
        |  rpad(c_mktsegment, 12, '.') AS rpadded,
        |  reverse(c_name) AS rev, repeat(c_mktsegment, 2) AS rep2,
        |  left(c_name, 8) AS l8, right(c_name, 4) AS r4,
        |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
        |  regexp_extract(c_name, '(\d+)', 1) AS digits,
        |  substring(c_name, 10, 4) AS sub4,
        |  split_part(c_name, '#', 2) AS after_hash,
        |  md5(c_name) AS name_md5,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  CAST(ascii(c_mktsegment) AS BIGINT) AS first_code,
        |  concat_ws('|', c_mktsegment, c_name) AS joined
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f7_datetime_ops" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
        |    AS month_start,
        |  CAST(o_orderdate + INTERVAL 7 DAY AS VARCHAR) AS plus_week,
        |  (946684800000000 - epoch_us(o_orderdate)) // 86400000000
        |    AS days_to_y2k,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)
        |    AS month_end,
        |  epoch_us(o_orderdate) AS us
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "x4_map_roundtrip" ->
      """SELECT o_custkey, o_orderstatus, count(*) * 2 AS n2
        |FROM orders GROUP BY o_custkey, o_orderstatus
        |HAVING count(*) >= 2
        |ORDER BY o_custkey, o_orderstatus""".stripMargin,
    "x5_array_ops" ->
      """WITH s AS (SELECT DISTINCT o_custkey, o_orderstatus FROM orders),
        |agg AS (SELECT o_custkey,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus)
        |    AS status_set,
        |  CAST(count(*) AS BIGINT) AS n_statuses,
        |  bool_or(o_orderstatus = 'F') AS has_f,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus)
        |    FILTER (WHERE o_orderstatus IN ('F', 'P')) AS inter_fp,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus)
        |    FILTER (WHERE o_orderstatus <> 'P') AS minus_p,
        |  min(o_orderstatus) AS first_status
        |FROM s GROUP BY o_custkey)
        |SELECT o_custkey, status_set, n_statuses, has_f,
        |  coalesce(inter_fp, '') AS inter_fp,
        |  coalesce(minus_p, '') AS minus_p, first_status
        |FROM agg ORDER BY o_custkey""".stripMargin
  )
}
