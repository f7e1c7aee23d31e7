package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Form700Pipeline => P, Restructure}

/** E1 registry — the assembled reference pipeline
  * (Form700.py:667-687) exposed as driver-checkable queries. Both sides
  * read the SAME JSON page fixtures: Spark via the classpath copy,
  * DuckDB via the source-tree copy (identical bytes, stable path).
  *
  * The oracle SQL is *generated* from the same helpers for every clean
  * rule (text escape, number sanitize, checkbox default, X1 serialize),
  * so Spark semantics and oracle semantics cannot drift independently.
  */
object RegistryForm700 {
  type Q = (SparkSession, String) => DataFrame

  /** Fixture paths for the DuckDB side, derived from the SAME
    * `fixtureRoot` resolution the Spark queries read through
    * (classpath copy on disk, or the one-time temp extraction when the
    * resources are packaged in a jar) — the two sides cannot diverge
    * across checkouts or packaging modes. DuckDB takes a bare path:
    * strip the `file:` scheme (any number of slashes — `file:/p` from
    * a URL, `file:///p` from a URI — collapses to the same POSIX
    * path). */
  private def oracleRoot(sparkRoot: String): String =
    sparkRoot.replaceFirst("^file:/*", "/")
  private lazy val OraclePages = oracleRoot(P.defaultPagesRoot)
  private lazy val OracleRedactedPages =
    oracleRoot(P.defaultRedactedPagesRoot)
  private lazy val OracleCorruptPages =
    oracleRoot(P.defaultCorruptPagesRoot)

  private def tables(s: SparkSession): Map[String, DataFrame] =
    P.run(s, P.defaultPagesRoot, Some(P.fixtureDoubles))

  /** The full 16-table dual pipeline (reference runs everything twice,
    * IsRedacted False then True — Form700.py:714-718). */
  private def tablesBoth(s: SparkSession): Map[String, DataFrame] =
    P.runBoth(s, P.defaultPagesRoot, P.defaultRedactedPagesRoot,
      Some(P.fixtureDoubles))

  // ------------------------------------------------------------------
  // Oracle SQL builders (DuckDB dialect) — one per clean rule.
  // ------------------------------------------------------------------

  /** F5: Python backslashreplace over an arbitrary string expression. */
  private def escSql(x: String): String =
    s"""COALESCE(list_aggr(list_transform(range(1, length($x)+1), i ->
       |    CASE WHEN unicode($x[i:i]) < 128 THEN $x[i:i]
       |         WHEN unicode($x[i:i]) <= 255 THEN '\\x' || format('{:02x}', unicode($x[i:i]))
       |         WHEN unicode($x[i:i]) <= 65535 THEN '\\u' || format('{:04x}', unicode($x[i:i]))
       |         ELSE '\\U' || format('{:08x}', unicode($x[i:i])) END),
       |  'string_agg', ''), '')""".stripMargin

  /** text clean: null→'', newline strip (F1), ascii escape (F5). */
  private def textSql(c: String, as: String): String =
    escSql(s"COALESCE(replace(CAST($c AS VARCHAR), chr(10), ''), '')") +
      s" AS \"$as\""
  private def textSql(c: String): String = textSql(c, c)

  /** number clean (F2+F3+F4): sanitize then long-or-zero / double-or-zero
    * per the column-global int-else-float decision (pinned, same as the
    * Spark side's fixtureDoubles). */
  private def numSql(c: String, as: String, double: Boolean = false): String = {
    val t = if (double) "DOUBLE" else "BIGINT"
    val z = if (double) "0.0" else "0"
    s"COALESCE(TRY_CAST(regexp_replace(CAST($c AS VARCHAR), '[a-zA-Z%]', '0', 'g') AS $t), $z) AS \"$as\""
  }

  // The explicit BOOLEAN cast matters for single-page readings where a
  // column is all-null: read_json_auto infers it as the JSON null type,
  // and a later UNION ALL against a BOOLEAN reading would otherwise
  // coerce both sides to VARCHAR ('true' strings).
  private def checkboxSql(c: String): String = checkboxSql(c, c)
  private def checkboxSql(c: String, as: String): String =
    s"COALESCE(CAST($c AS BOOLEAN), false) AS \"$as\""

  /** X1 serialize of an array-of-struct column, explicit field order
    * (matches Spark's alphabetical JSON struct inference). */
  private def serSql(c: String, fields: Seq[String]): String = {
    val kv = fields.map(f =>
      s"'$f:' || CASE WHEN s.$f IS NULL OR CAST(s.$f AS VARCHAR) = '' THEN 'None' ELSE CAST(s.$f AS VARCHAR) END")
      .mkString(" || ',' || ")
    s"array_to_string(list_transform($c, s -> $kv), '|')"
  }

  /** Cover CTEs: flattened filings + serialized offices, shared by every
    * oracle (the filer side of J1). Parameterized by the page-file glob
    * and CTE names so the redacted variant AND the upsert oracle (which
    * needs TWO cover readings in one query) reuse the identical clean
    * semantics. */
  private def coverCtesNamed(glob: String, cf: String,
                             cser: String): String =
    s"""$cf AS (
       |  SELECT unnest(filings, recursive := true)
       |  FROM read_json_auto('$glob')
       |), $cser AS (
       |  SELECT * REPLACE (${serSql("offices", Seq("code", "title"))} AS offices) FROM $cf
       |)""".stripMargin
  private def coverCteFor(root: String): String =
    coverCtesNamed(s"$root/cover/*.json", "cf", "cser")
  private val coverCte = coverCteFor(OraclePages)

  /** The cleaned-cover select list, with output names mapped through
    * `alias` (identity for the camelCase queries, the K2 snake_case
    * rename for sink-boundary queries). */
  private def coverSelectList(alias: String => String): String = {
    def t(c: String) = textSql(c, alias(c))
    def d(c: String) = s"""COALESCE($c, '') AS "${alias(c)}""""
    def n(c: String) = numSql(c, alias(c))
    def cb(c: String) = checkboxSql(c, alias(c))
    Seq(t("filingId"), t("filerId"), t("filerName"), t("departmentName"),
      t("positionName"), t("offices"), d("periodStart"), d("periodEnd"),
      d("filingDate"), t("agency"), cb("isAnnual"), cb("isCandidate"),
      n("scheduleA1Count"), n("scheduleDCount"), n("commentCount"),
      t("transactionType"), t("id")).mkString(",\n  ")
  }

  /** The full cleaned-cover oracle over a given cover CTE — shared
    * verbatim by the base and redacted variants (identical clean
    * semantics, different source root). */
  private def coverCleanSql(cte: String): String =
    s"""WITH $cte
       |SELECT ${coverSelectList(identity)}
       |FROM cser ORDER BY filingId""".stripMargin

  private val filerTextCols =
    Seq("filerName", "departmentName", "positionName", "offices")
  private val filerDateCols = Seq("periodStart", "periodEnd", "filingDate")

  /** Joined filer columns, cleaned (text rules; dates pass through). */
  private def filerSelect(alias: String): String =
    (filerTextCols.map(c => textSql(s"$alias.$c", c)) ++
      filerDateCols.map(c => s"""COALESCE($alias.$c, '') AS "$c""""))
      .mkString(",\n  ")

  // ------------------------------------------------------------------
  // Queries + oracles
  // ------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    // Full cleaned cover page — sources S2-S4, X1 serialize, F1-F5 casts,
    // P2 projection, pagination UNION ALL. The K2 sink-wide fillna("")
    // (Form700.py:470) is applied so no nulls reach the compare (dates
    // are pass-through text and may be null pre-sink).
    "e1_cover_clean" -> ((s, _) =>
      tables(s)("cover").na.fill("").orderBy("filingId")),

    // The REDACTED pipeline variant through runBoth: same clean rules
    // over the redacted endpoint's pages (masked filer identity) —
    // the dual-pipeline path a reference user runs twice a day. runBoth
    // builds all 16 LAZY plans; selecting one table here executes only
    // that plan (the other 15 DataFrames are never materialized — this
    // query spot-checks the dual-run wiring, not all 16 outputs, which
    // the other e1_* rows and Form700PipelineSpec cover).
    "e1_cover_redacted" -> ((s, _) =>
      tablesBoth(s)("cover_redacted").na.fill("").orderBy("filingId")),

    // scheduleD: S5 pluck, J1 broadcast filer join, X2 outer explode of
    // gifts, cleaning with the float-fallback amount column.
    "e1_schedule_d" -> ((s, _) =>
      tables(s)("scheduleD").na.fill("")
        .orderBy(col("id"), col("giftDate"))),

    // scheduleA2: X1 serialize (incomeSources) + X2/X3 prefixed explode
    // (realProperties) in one table.
    "e1_schedule_a2" -> ((s, _) =>
      tables(s)("scheduleA2").na.fill("")
        .orderBy(col("id"), col("realPropertyParcelAddress"))),

    // scheduleA1: the no-list-column clean path — S5 pluck, J1 join,
    // P2 project, F2/F4 number cast (fairMarketValue), F9 date
    // pass-through (dateAcquired). Covers Form700.py:678's clean of the
    // simplest schedule shape.
    "e1_schedule_a1" -> ((s, _) =>
      tables(s)("scheduleA1").na.fill("").orderBy("id")),

    // scheduleC: X1 serialize of incomeSources WITHOUT any explode —
    // the serialize-only dispatch branch (Form700.py:325-334) that
    // scheduleA2/D don't isolate. Also the empty-page case (page_2's
    // scheduleC array is empty → chain over an empty list).
    "e1_schedule_c" -> ((s, _) =>
      tables(s)("scheduleC").na.fill("").orderBy("id")),

    // scheduleE: the checkbox-heavy table — F3 null→false on two
    // checkbox columns plus a string-typed number column ("300") through
    // the F2 sanitize + F4 long cast.
    "e1_schedule_e" -> ((s, _) =>
      tables(s)("scheduleE").na.fill("").orderBy("id")),

    // comments: the F1 newline-strip table (fixture comment embeds \n).
    "e1_comments" -> ((s, _) =>
      tables(s)("comments").na.fill("").orderBy("id")),

    // scheduleB through the K2 sink boundary: dotted loan.* columns
    // renamed snake_case, string nulls filled — the exact frame the
    // K-family sink writes.
    "e1_schedule_b_sink" -> ((s, _) =>
      P.prepareForSink(tables(s)("scheduleB")).orderBy("id")),

    // O5/A1 audit: write all 8 tables to a scratch dir, compare written
    // vs expected counts. Rows-only check (side-effecting sink — not
    // SQL-expressible).
    "e1_audit" -> ((s, _) => {
      val out = graft.Scratch.dir("graft_e1_audit")
      P.writeAll(s, tables(s), out).orderBy("table_name")
    }),

    // K5 incremental load: the cover table as two page-chunks — page 1
    // REPLACES the sink (overwrite), page 2 APPENDS (the reference's
    // chunk[1:] upsert loop, Form700.py:498-502). The query asserts the
    // audit passed, then returns the SINK CONTENT read back from the
    // written parquet — so the replace+append path is hash-matched
    // against a union oracle over the same two page readings (pages
    // carry disjoint filings, so append ≙ upsert here by construction).
    "e1_audit_incremental" -> ((s, _) => {
      val root = P.defaultPagesRoot
      val out = graft.Scratch.dir("graft_e1_inc")
      val chunks = Seq("page_1.json", "page_2.json").map { p =>
        P.clean(graft.sources.Form700Source.cover(
          graft.sources.Form700Source.readPages(s, s"$root/cover/$p")),
          P.catalog("cover"), Some(Set.empty))
      }
      val audit = P.writeIncremental(s, "cover", chunks, out)
      require(audit.where(col("status") === "SUCCESS").count() == 1,
        "incremental audit reported FAILURE")
      s.read.parquet(s"$out/cover").orderBy("filing_id")
    }),

    // K5 keyed UPSERT (Form700.py:498-502 — client.upsert by row
    // identity): chunk 0 = the FULL cover load, chunk 1 = page 2
    // re-loaded as a correction, so its filings OVERLAP chunk 0. The
    // merged table must carry exactly one row per filingId with the
    // overlapping rows showing src_chunk = 1 (latest wins) — checked
    // value-for-value by a dedup-on-key oracle over the same two
    // readings (this one IS oracle-expressible, unlike the append
    // audits).
    "e1_audit_upsert" -> ((s, _) => {
      val root = P.defaultPagesRoot
      val out = graft.Scratch.dir("graft_e1_upsert")
      def coverOf(path: String) =
        P.clean(graft.sources.Form700Source.cover(
          graft.sources.Form700Source.readPages(s, path)),
          P.catalog("cover"), Some(Set.empty))
      val chunks = Seq(coverOf(s"$root/cover"),
        coverOf(s"$root/cover/page_2.json"))
      P.writeUpsert(s, "cover", chunks, "filing_id", out,
        graft.operators.RetryPolicy.NoWait)
      P.upsertedTable(s, "cover", out, chunks.size).orderBy("filing_id")
    }),

    // The STREAMING dual of e1_audit_upsert: the cover feed tails
    // through the paged DSv2 source one page per micro-batch
    // (maxPagesPerTrigger=1, AvailableNow draining to a snapshotted
    // bound), and every batch upserts into the generation table keyed
    // on filing_id — the reference's fetch-page/upsert-chunk loop
    // (Form700.py:107-144 + 498-502) as one streaming query. Pages
    // carry disjoint filings, so the merged table is both pages'
    // cleaned rows, each stamped with the batch (= page index) that
    // loaded it.
    "st_page_upsert" -> ((s, _) => {
      val root = s"${P.defaultPagesRoot}/cover"
      val out = graft.Scratch.dir("graft_st_upsert")
      val stream = s.readStream.format("graft.sources.PagedJsonSource")
        .option("path", root).option("maxPagesPerTrigger", 1).load()
      val perBatch: DataFrame => DataFrame = b =>
        P.prepareForSink(P.clean(
          graft.sources.Form700Source.cover(
            s.read.json(b.select("body")
              .as(org.apache.spark.sql.Encoders.STRING))),
          P.catalog("cover"), Some(Set.empty)))
      graft.streaming.StreamOps
        .runUpsertToCompletion(s, stream, perBatch, "filing_id", out)
        .orderBy("filing_id")
    }),

    // TIME TRAVEL over the generation-dir upsert: three chunks (full
    // load, page-2 correction, page-1 correction), then the table read
    // AS OF generation 1 — the snapshot BEFORE the page-1 correction
    // landed. Generations are immutable, so the result is exactly the
    // latest-wins merge of chunks 0..1 (the e1_audit_upsert oracle),
    // even though gen 2 exists and differs — the lakehouse
    // snapshot-as-of contract on the reference's own chunked layout.
    "k_time_travel" -> ((s, _) => {
      val root = P.defaultPagesRoot
      val out = graft.Scratch.dir("graft_k_ttravel")
      def coverOf(path: String) =
        P.clean(graft.sources.Form700Source.cover(
          graft.sources.Form700Source.readPages(s, path)),
          P.catalog("cover"), Some(Set.empty))
      val chunks = Seq(coverOf(s"$root/cover"),
        coverOf(s"$root/cover/page_2.json"),
        coverOf(s"$root/cover/page_1.json"))
      P.writeUpsert(s, "cover", chunks, "filing_id", out,
        graft.operators.RetryPolicy.NoWait)
      P.upsertedTableAsOf(s, "cover", out, gen = 1).orderBy("filing_id")
    }),

    // S2 PARSE TOLERANCE (Form700.py:123-126: try/except around
    // json.loads, print-and-continue): the corrupt fixture's page 2 is
    // truncated mid-object. The tolerant reader drops it, the surviving
    // page still yields its filings (guarded), and the audit report
    // carries one per-page parse-status line — the bad page is COUNTED,
    // not silently swallowed.
    "e1_audit_pages" -> ((s, _) => {
      val (pages, status) = graft.sources.Form700Source
        .readPagesWithStatus(s, s"${P.defaultCorruptPagesRoot}/cover")
      val survivors = graft.sources.Form700Source.cover(pages).count()
      require(survivors > 0,
        s"corrupt fixture: valid page produced no filings ($survivors)")
      P.pageParseAudit(status, "cover").orderBy("page")
    })
  )

  /** O5 audit-report oracle: per-table rows_expected == rows_written ==
    * the row count of that table's OWN cleaned-frame oracle, wrapped as
    * a count CTE — reusing the same SQL keeps the audit and the content
    * checks structurally in lockstep (a clean-rule change moves both or
    * neither). The catalog metadata columns (dataset name, four-by-four,
    * create-vs-replace mode) are generated from the same driver-side
    * catalog the write consults, including the deterministic
    * assignFourByFour id for not-yet-created tables. status is the
    * SUCCESS literal: if the Spark write ever loses rows, the Spark
    * side reports FAILURE and the hash compare catches it. */
  private def auditOracle(base: Map[String, String]): String = {
    val tableToOracle = Seq(
      "cover" -> "e1_cover_clean", "comments" -> "e1_comments",
      "scheduleA1" -> "e1_schedule_a1", "scheduleA2" -> "e1_schedule_a2",
      "scheduleB" -> "e1_schedule_b_sink", "scheduleC" -> "e1_schedule_c",
      "scheduleD" -> "e1_schedule_d", "scheduleE" -> "e1_schedule_e")
    def q(s: String): String = s.replace("'", "''")
    val ctes = tableToOracle.map { case (name, key) =>
      s"t_$name AS (\n${base(key)}\n)"
    }.mkString(",\n")
    val rows = tableToOracle.map { case (name, _) =>
      val spec = P.catalog(name)
      val mode = if (spec.needsCreate) "create" else "replace"
      val fxf = if (spec.needsCreate) P.assignFourByFour(spec.datasetName)
        else spec.fourByFour
      s"""SELECT '${q(name)}' AS table_name,
         |  '${q(spec.datasetName)}' AS dataset_name,
         |  '${q(fxf)}' AS four_by_four, '$mode' AS mode,
         |  (SELECT count(*) FROM t_$name) AS rows_expected,
         |  (SELECT count(*) FROM t_$name) AS rows_written,
         |  'SUCCESS' AS status""".stripMargin
    }
    s"WITH $ctes\nSELECT * FROM (\n${rows.mkString("\nUNION ALL\n")}" +
      "\n) ORDER BY table_name"
  }

  private val baseOracles: Map[String, String] = Map(
    "e1_cover_clean" -> coverCleanSql(coverCte),
    "e1_cover_redacted" -> coverCleanSql(coverCteFor(OracleRedactedPages)),

    "e1_schedule_d" ->
      s"""WITH $coverCte,
         |d0 AS (
         |  SELECT unnest(scheduleD) AS r
         |  FROM read_json_auto('$OraclePages/schedules/*.json')
         |), d1 AS (
         |  SELECT r.filingId AS filingId, r.id AS id,
         |    r.nameOfSource AS nameOfSource,
         |    unnest(CASE WHEN r.gifts IS NULL OR len(r.gifts) = 0
         |      THEN [NULL::STRUCT(amount DOUBLE, description VARCHAR, giftDate VARCHAR)]
         |      ELSE CAST(r.gifts AS STRUCT(amount DOUBLE, description VARCHAR, giftDate VARCHAR)[]) END) AS g
         |  FROM d0
         |)
         |SELECT ${textSql("d1.filingId", "filingId")}, ${textSql("d1.id", "id")},
         |  ${textSql("d1.nameOfSource", "nameOfSource")},
         |  ${numSql("g.amount", "amount", double = true)},
         |  ${textSql("g.description", "description")},
         |  COALESCE(g.giftDate, '') AS "giftDate",
         |  ${filerSelect("c")}
         |FROM d1 LEFT JOIN cser c ON d1.filingId = c.filingId
         |ORDER BY id, "giftDate"""".stripMargin,

    "e1_schedule_a2" -> {
      val rpType = "STRUCT(businessName VARCHAR, fairMarketValue BIGINT, natureOfInterest VARCHAR, parcelAddress VARCHAR)"
      s"""WITH $coverCte,
         |a0 AS (
         |  SELECT unnest(scheduleA2) AS r
         |  FROM read_json_auto('$OraclePages/schedules/*.json')
         |), a1 AS (
         |  SELECT r.filingId AS filingId, r.id AS id,
         |    r.entityName AS entityName, r.address AS address,
         |    ${serSql("r.incomeSources", Seq("address", "name"))} AS incomeSources,
         |    unnest(CASE WHEN r.realProperties IS NULL OR len(r.realProperties) = 0
         |      THEN [NULL::$rpType]
         |      ELSE CAST(r.realProperties AS $rpType[]) END) AS p
         |  FROM a0
         |)
         |SELECT ${textSql("a1.filingId", "filingId")}, ${textSql("a1.id", "id")},
         |  ${textSql("a1.entityName", "entityName")}, ${textSql("a1.address", "address")},
         |  ${textSql("a1.incomeSources", "incomeSources")},
         |  ${textSql("p.businessName", "realPropertyBusinessName")},
         |  ${textSql("p.parcelAddress", "realPropertyParcelAddress")},
         |  ${numSql("p.fairMarketValue", "realPropertyFairMarketValue")},
         |  ${textSql("p.natureOfInterest", "realPropertyNatureOfInterest")},
         |  ${filerSelect("c")}
         |FROM a1 LEFT JOIN cser c ON a1.filingId = c.filingId
         |ORDER BY id, "realPropertyParcelAddress"""".stripMargin
    },

    // scheduleA1: simplest clean shape — no list columns, one number
    // (BIGINT path) and the date pass-through.
    "e1_schedule_a1" ->
      s"""WITH $coverCte,
         |a0 AS (
         |  SELECT unnest(scheduleA1) AS r
         |  FROM read_json_auto('$OraclePages/schedules/*.json')
         |), a1 AS (
         |  SELECT r.filingId AS filingId, r.id AS id,
         |    r.nameOfBusinessEntity AS nameOfBusinessEntity,
         |    r.fairMarketValue AS fairMarketValue,
         |    r.fairMarketValueAsRange AS fairMarketValueAsRange,
         |    r.natureOfInvestment AS natureOfInvestment,
         |    r.dateAcquired AS dateAcquired,
         |    r.transactionType AS transactionType
         |  FROM a0
         |)
         |SELECT ${textSql("a1.filingId", "filingId")}, ${textSql("a1.id", "id")},
         |  ${textSql("a1.nameOfBusinessEntity", "nameOfBusinessEntity")},
         |  ${numSql("a1.fairMarketValue", "fairMarketValue")},
         |  ${textSql("a1.fairMarketValueAsRange", "fairMarketValueAsRange")},
         |  ${textSql("a1.natureOfInvestment", "natureOfInvestment")},
         |  COALESCE(a1.dateAcquired, '') AS "dateAcquired",
         |  ${textSql("a1.transactionType", "transactionType")},
         |  ${filerSelect("c")}
         |FROM a1 LEFT JOIN cser c ON a1.filingId = c.filingId
         |ORDER BY id""".stripMargin,

    // scheduleC: X1 serialize-only dispatch (no explode) + the
    // empty-page case (page_2's scheduleC is []).
    "e1_schedule_c" ->
      s"""WITH $coverCte,
         |c0 AS (
         |  SELECT unnest(scheduleC) AS r
         |  FROM read_json_auto('$OraclePages/schedules/*.json')
         |), c1 AS (
         |  SELECT r.filingId AS filingId, r.id AS id,
         |    r.nameOfIncomeSource AS nameOfIncomeSource,
         |    r.incomeGrossIncome AS incomeGrossIncome,
         |    ${serSql("r.incomeSources", Seq("address", "name"))} AS incomeSources
         |  FROM c0
         |)
         |SELECT ${textSql("c1.filingId", "filingId")}, ${textSql("c1.id", "id")},
         |  ${textSql("c1.nameOfIncomeSource", "nameOfIncomeSource")},
         |  ${numSql("c1.incomeGrossIncome", "incomeGrossIncome")},
         |  ${textSql("c1.incomeSources", "incomeSources")},
         |  ${filerSelect("c")}
         |FROM c1 LEFT JOIN cser c ON c1.filingId = c.filingId
         |ORDER BY id""".stripMargin,

    // scheduleE: checkbox defaults (F3 null→false) + the string-typed
    // number column ("300") through F2 sanitize + F4 long cast.
    "e1_schedule_e" ->
      s"""WITH $coverCte,
         |e0 AS (
         |  SELECT unnest(scheduleE) AS r
         |  FROM read_json_auto('$OraclePages/schedules/*.json')
         |), e1 AS (
         |  SELECT r.filingId AS filingId, r.id AS id,
         |    r.nameOfSource AS nameOfSource, r.amount AS amount,
         |    r.isNonprofit AS isNonprofit, r.madeSpeech AS madeSpeech,
         |    r.startDate AS startDate, r.endDate AS endDate
         |  FROM e0
         |)
         |SELECT ${textSql("e1.filingId", "filingId")}, ${textSql("e1.id", "id")},
         |  ${textSql("e1.nameOfSource", "nameOfSource")},
         |  ${numSql("e1.amount", "amount")},
         |  ${checkboxSql("e1.isNonprofit", "isNonprofit")},
         |  ${checkboxSql("e1.madeSpeech", "madeSpeech")},
         |  COALESCE(e1.startDate, '') AS "startDate",
         |  COALESCE(e1.endDate, '') AS "endDate",
         |  ${filerSelect("c")}
         |FROM e1 LEFT JOIN cser c ON e1.filingId = c.filingId
         |ORDER BY id""".stripMargin,

    // comments: the F1 newline-strip table (fixture comment embeds \n).
    "e1_comments" ->
      s"""WITH $coverCte,
         |m0 AS (
         |  SELECT unnest(comments) AS r
         |  FROM read_json_auto('$OraclePages/schedules/*.json')
         |), m1 AS (
         |  SELECT r.filingId AS filingId, r.id AS id, r.comment AS comment
         |  FROM m0
         |)
         |SELECT ${textSql("m1.filingId", "filingId")}, ${textSql("m1.id", "id")},
         |  ${textSql("m1.comment", "comment")},
         |  ${filerSelect("c")}
         |FROM m1 LEFT JOIN cser c ON m1.filingId = c.filingId
         |ORDER BY id""".stripMargin,

    "e1_schedule_b_sink" -> {
      def snake(n: String) = Restructure.toSinkName(n)
      s"""WITH $coverCte,
         |b0 AS (
         |  SELECT unnest(scheduleB) AS r
         |  FROM read_json_auto('$OraclePages/schedules/*.json')
         |), bj AS (
         |  SELECT r.filingId AS filingId, r.id AS id,
         |    r.parcelOrAddress AS parcelOrAddress,
         |    r.loan.nameOfLender AS ln, r.loan.highestBalance AS hb,
         |    r.loan.interestRate AS ir, r.loan.address AS la,
         |    ${serSql("r.incomeSources", Seq("address", "name"))} AS incomeSources,
         |    c.filerName AS filerName, c.departmentName AS departmentName,
         |    c.positionName AS positionName, c.offices AS offices,
         |    c.periodStart AS periodStart, c.periodEnd AS periodEnd,
         |    c.filingDate AS filingDate
         |  FROM b0 LEFT JOIN cser c ON r.filingId = c.filingId
         |)
         |SELECT ${textSql("bj.filingId", "filing_id")}, ${textSql("bj.id", "id")},
         |  ${textSql("bj.parcelOrAddress", "parcel_or_address")},
         |  ${textSql("bj.ln", snake("loan.nameOfLender"))},
         |  ${numSql("bj.hb", snake("loan.highestBalance"))},
         |  ${numSql("bj.ir", snake("loan.interestRate"), double = true)},
         |  ${textSql("bj.la", snake("loan.address"))},
         |  ${textSql("bj.incomeSources", "income_sources")},
         |  ${textSql("bj.filerName", "filer_name")},
         |  ${textSql("bj.departmentName", "department_name")},
         |  ${textSql("bj.positionName", "position_name")},
         |  ${textSql("bj.offices", "offices")},
         |  COALESCE(bj.periodStart, '') AS "period_start",
         |  COALESCE(bj.periodEnd, '') AS "period_end",
         |  COALESCE(bj.filingDate, '') AS "filing_date"
         |FROM bj ORDER BY id""".stripMargin
    },

    // Latest-chunk-wins dedup on the key over the same two cover
    // readings the Spark side merges: full load as chunk 0, page-2
    // correction as chunk 1.
    "e1_audit_upsert" -> {
      val snake = (n: String) => Restructure.toSinkName(n)
      s"""WITH ${coverCtesNamed(s"$OraclePages/cover/*.json", "cf", "cser")},
         |${coverCtesNamed(s"$OraclePages/cover/page_2.json", "cf2", "cser2")},
         |u AS (
         |  SELECT ${coverSelectList(snake)}, 0 AS src_chunk FROM cser
         |  UNION ALL
         |  SELECT ${coverSelectList(snake)}, 1 AS src_chunk FROM cser2
         |)
         |SELECT * FROM u
         |QUALIFY row_number() OVER (PARTITION BY filing_id ORDER BY src_chunk DESC) = 1
         |ORDER BY filing_id""".stripMargin
    },

    // One page per micro-batch, in page order: src_batch = page - 1.
    // Disjoint filings make the QUALIFY a no-op — kept so the oracle
    // states the merge contract, not just the union.
    "st_page_upsert" -> {
      val snake = (n: String) => Restructure.toSinkName(n)
      s"""WITH ${coverCtesNamed(s"$OraclePages/cover/page_1.json", "cf1", "cser1")},
         |${coverCtesNamed(s"$OraclePages/cover/page_2.json", "cf2", "cser2")},
         |u AS (
         |  SELECT ${coverSelectList(snake)}, CAST(0 AS BIGINT) AS src_batch FROM cser1
         |  UNION ALL
         |  SELECT ${coverSelectList(snake)}, CAST(1 AS BIGINT) AS src_batch FROM cser2
         |)
         |SELECT * FROM u
         |QUALIFY row_number() OVER (PARTITION BY filing_id ORDER BY src_batch DESC) = 1
         |ORDER BY filing_id""".stripMargin
    },
    // Replace-then-append over disjoint pages = the plain union of both
    // page readings in the sink frame.
    "e1_audit_incremental" -> {
      val snake = (n: String) => Restructure.toSinkName(n)
      s"""WITH ${coverCtesNamed(s"$OraclePages/cover/page_1.json", "cf1", "cser1")},
         |${coverCtesNamed(s"$OraclePages/cover/page_2.json", "cf2", "cser2")}
         |SELECT ${coverSelectList(snake)} FROM cser1
         |UNION ALL
         |SELECT ${coverSelectList(snake)} FROM cser2
         |ORDER BY filing_id""".stripMargin
    }
  )

  // e1_audit was the registry's one rows-only entry (side-effecting
  // sink); the report itself is pure, so it now carries the
  // catalog+count oracle built above.
  val oracles: Map[String, String] =
    baseOracles + ("e1_audit" -> auditOracle(baseOracles)) +
      // Time travel to generation 1 = the latest-wins merge of chunks
      // 0..1 — BY CONSTRUCTION the e1_audit_upsert oracle, verbatim:
      // the snapshot ignores chunk 2 even though gen 2 exists.
      ("k_time_travel" -> baseOracles("e1_audit_upsert")) +
      // Page parse status via DuckDB's own JSON validator over the raw
      // page text — an independent judgment of which pages parse. A
      // usable page must be a JSON OBJECT (the reference immediately
      // subscripts responseJson['totalMatchingPages'] — Form700.py:144
      // — so a valid-but-non-object body is as unusable as a parse
      // failure); `json_type(try_cast(...))` is NULL for invalid JSON,
      // so one predicate covers both. This matches the Spark probe's
      // struct-schema semantics (Form700Source.readPagesWithStatus) on
      // any input, not just the current fixtures.
      ("e1_audit_pages" ->
        s"""SELECT 'cover' AS source,
           |  CAST(regexp_extract(filename, 'page_(\\d+)\\.json', 1)
           |    AS BIGINT) AS page,
           |  COALESCE(json_type(TRY_CAST(content AS JSON)) = 'OBJECT',
           |    false) AS parse_ok,
           |  CASE WHEN COALESCE(
           |      json_type(TRY_CAST(content AS JSON)) = 'OBJECT', false)
           |    THEN 'SUCCESS' ELSE 'FAILURE' END AS status
           |FROM read_text('$OracleCorruptPages/cover/*.json')
           |ORDER BY page""".stripMargin)
}
