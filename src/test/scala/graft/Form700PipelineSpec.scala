package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.operators.Form700Pipeline

/** Golden end-to-end tests of the assembled E1 pipeline over the
  * reference-shaped JSON page fixtures (FIXTURES.md §B) — covers every
  * B3 edge case: pagination concat, empty arrays, ""→None serialization,
  * newline strip, number-sanitize quirk, int-else-float column decision,
  * non-ASCII escaping, null defaults, unmatched-join defaults. */
class Form700PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val tables =
    Form700Pipeline.run(spark, Form700Pipeline.defaultPagesRoot)

  private def rows(name: String, order: String*): Seq[Row] =
    tables(name).orderBy(order.head, order.tail: _*).collect().toSeq

  test("cover: pages concat (union), declared column order, cleaned types") {
    val df = tables("cover")
    assert(df.columns.toSeq ==
      Form700Pipeline.catalog("cover").fieldNames)
    val r = rows("cover", "filingId")
    assert(r.size == 3) // 2 filings page 1 + 1 filing page 2
    val byId = r.map(x => x.getAs[String]("filingId") -> x).toMap
    // F2 quirk: "3x" → "30" → 30; column stays LONG (all values parse)
    assert(byId("F001").getAs[Long]("scheduleDCount") == 2L)
    assert(byId("F003").getAs[Long]("scheduleDCount") == 30L)
    // F3: null number → 0
    assert(byId("F002").getAs[Long]("scheduleA1Count") == 0L)
    // checkbox: null → false
    assert(byId("F001").getAs[Boolean]("isCandidate") == false)
    assert(byId("F003").getAs[Boolean]("isAnnual") == false)
    // F1: newline stripped inside a text cell
    assert(byId("F003").getAs[String]("filerName") == "SamLee")
    // F5: non-ASCII backslash-escaped
    assert(byId("F002").getAs[String]("filerName") == "Ana N\\xfa\\xf1ez")
    // date columns pass through as text (cast disabled in reference)
    assert(byId("F002").getAs[String]("periodEnd") == null)
  }

  test("X1 serialize: struct order, empty string → None, empty array → \"\"") {
    val r = rows("cover", "filingId")
    val byId = r.map(x => x.getAs[String]("filingId") -> x).toMap
    // JSON structs infer alphabetical field order: code, title
    assert(byId("F001").getAs[String]("offices") ==
      "code:SFO,title:Office A|code:OAK,title:None")
    assert(byId("F002").getAs[String]("offices") == "")
  }

  test("J1: filer columns joined onto schedules; unmatched → defaults") {
    val r = rows("scheduleB", "id")
    val byId = r.map(x => x.getAs[String]("id") -> x).toMap
    assert(byId("b-1").getAs[String]("filerName") == "Jane Roe")
    assert(byId("b-1").getAs[String]("offices") ==
      "code:SFO,title:Office A|code:OAK,title:None")
    // F999 has no cover row: text defaults to "", date stays null
    assert(byId("b-2").getAs[String]("filerName") == "")
    assert(byId("b-2").getAs[String]("offices") == "")
    assert(byId("b-2").getAs[String]("periodStart") == null)
  }

  test("P1 dotted flatten + int-else-float column decision (scheduleB)") {
    val r = rows("scheduleB", "id")
    val byId = r.map(x => x.getAs[String]("id") -> x).toMap
    assert(byId("b-1").getAs[String]("loan.nameOfLender") == "First Bank")
    // highestBalance: 500 / null → all longs → LONG column with 0 default
    assert(byId("b-1").getAs[Long]("loan.highestBalance") == 500L)
    assert(byId("b-2").getAs[Long]("loan.highestBalance") == 0L)
    // interestRate: "3.5%" → "3.50" fails long parse → whole column DOUBLE
    assert(byId("b-1").getAs[Double]("loan.interestRate") == 3.5)
    assert(byId("b-2").getAs[Double]("loan.interestRate") == 4.0)
  }

  test("X2 explode gifts: child rows, empty array keeps parent") {
    val r = rows("scheduleD", "id", "giftDate")
    assert(r.size == 3) // F001 × 2 gifts + F002 × 1 retained parent
    val d1 = r.filter(_.getAs[String]("id") == "d-1")
    assert(d1.map(_.getAs[String]("description")) == Seq("Tickets", "Lunch"))
    // amount: 75.5 forces the whole column to DOUBLE
    assert(d1.map(_.getAs[Double]("amount")) == Seq(75.5, 25.0))
    val d2 = r.filter(_.getAs[String]("id") == "d-2").head
    assert(d2.getAs[Double]("amount") == 0.0) // null child → 0
    assert(d2.getAs[String]("description") == "")
    assert(d2.getAs[String]("giftDate") == null)
  }

  test("X2+X3 explode realProperties with prefix (scheduleA2)") {
    val r = rows("scheduleA2", "id", "realPropertyParcelAddress")
    assert(r.size == 3) // a2-1 × 2 properties + a2-2 retained parent
    val a1 = r.filter(_.getAs[String]("id") == "a2-1")
    assert(a1.map(_.getAs[String]("realPropertyBusinessName")).toSet ==
      Set("B Corp", "C Corp"))
    assert(a1.map(_.getAs[Long]("realPropertyFairMarketValue")).toSet ==
      Set(5000L, 750L))
    // ""→None inside serialized incomeSources (alphabetical field order)
    assert(a1.head.getAs[String]("incomeSources") == "address:None,name:Src")
    val a2 = r.filter(_.getAs[String]("id") == "a2-2").head
    assert(a2.getAs[String]("realPropertyBusinessName") == "")
    assert(a2.getAs[Long]("realPropertyFairMarketValue") == 0L)
    assert(a2.getAs[String]("incomeSources") == "")
  }

  test("comments: newline stripped; schedule page with empty array unions") {
    val r = rows("comments", "id")
    assert(r.map(_.getAs[String]("comment")) == Seq("line1line2", "ok"))
    assert(rows("scheduleC", "id").size == 1) // page_2 scheduleC is []
  }

  test("non-ASCII escapes: Latin-1 → \\xHH, BMP → \\uHHHH") {
    val a1 = rows("scheduleA1", "id")
    assert(a1.find(_.getAs[String]("id") == "a1-2").get
      .getAs[String]("nameOfBusinessEntity") == "B\\xfcro GmbH")
    val e = rows("scheduleE", "id")
    assert(e.find(_.getAs[String]("id") == "e-2").get
      .getAs[String]("nameOfSource") == "Nonprofit \\u0178")
    // scheduleE amount "300"/"120" all parse → LONG column
    assert(e.map(_.getAs[Long]("amount")).toSet == Set(300L, 120L))
  }

  test("runBoth: 16 logical tables, redacted source genuinely masked") {
    import org.apache.spark.sql.functions.col
    // the redacted variant reads its own source dir — server-side
    // redaction (IsRedacted=True) masks filer identity at the endpoint
    val both = Form700Pipeline.runBoth(spark,
      Form700Pipeline.defaultPagesRoot,
      Form700Pipeline.defaultRedactedPagesRoot,
      Some(Form700Pipeline.fixtureDoubles))
    assert(both.size == 16)
    assert(both.keySet.count(_.endsWith("_redacted")) == 8)
    // same row universe, masked content
    assert(both("scheduleD_redacted").count() == both("scheduleD").count())
    assert(both("cover").where(col("filerName") =!= "").count() == 3)
    assert(both("cover_redacted")
      .where(col("filerName") =!= "").count() == 0)
  }

  test("K sink + O5 audit: write all tables, counts match") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_e1_sink").toString
    val report = Form700Pipeline.writeAll(spark, tables, out)
      .collect().map(r => r.getAs[String]("table_name") -> r).toMap
    assert(report.size == 8)
    assert(report.values.forall(_.getAs[String]("status") == "SUCCESS"))
    // K2/F7: sink columns are dot-stripped snake_case
    val sunk = spark.read.parquet(s"$out/scheduleB")
    assert(sunk.columns.contains("loanname_of_lender") ||
      sunk.columns.contains("loan_name_of_lender"))
    // K1 metadata round-trip: catalog metadata lands in the audit report
    assert(report("cover").getAs[String]("dataset_name") ==
      "Form 700 Cover Page Private")
    assert(report("cover").getAs[String]("four_by_four") == "g4ft-c0v1")
    assert(report("cover").getAs[String]("mode") == "replace")
    // K1 create branch: FourByFour == 0 → create + assigned id
    assert(report("comments").getAs[String]("mode") == "create")
    assert(report("comments").getAs[String]("four_by_four") ==
      Form700Pipeline.assignFourByFour("Form 700 Comments Private"))
  }

  test("K1 catalog: 16 rows of dataset metadata, redacted shares schema") {
    val cat = Form700Pipeline.catalog
    assert(cat.size == 16)
    assert(cat.keySet.count(_.endsWith("_redacted")) == 8)
    val cover = cat("cover")
    assert(cover.category == "City Management and Ethics")
    assert(cover.tags == Seq("ethics", "form700"))
    assert(!cover.redacted && !cover.needsCreate)
    val red = cat("cover_redacted")
    assert(red.redacted)
    assert(red.datasetName == "Form 700 Cover Page") // no Private suffix
    assert(red.fieldNames == cover.fieldNames) // same field contract
    assert(cat("comments").needsCreate) // FourByFour == 0
  }

  test("K1 create branch fails visibly when the dataset already exists") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_e1_create").toString
    val one = Map("comments" -> tables("comments"))
    val first = Form700Pipeline.writeAll(spark, one, out).collect().head
    assert(first.getAs[String]("mode") == "create" &&
      first.getAs[String]("status") == "SUCCESS")
    // a second CREATE of the same dataset must fail the audit, not
    // silently clobber the existing data (reference: client.create of an
    // existing name would mint a duplicate; our sink refuses instead)
    val second = Form700Pipeline.writeAll(spark, one, out).collect().head
    assert(second.getAs[String]("status") == "FAILURE")
    assert(second.getAs[Long]("rows_written") == 0L)
  }

  test("K5 incremental: page-1 replace + page-2 append, combined audit") {
    val root = Form700Pipeline.defaultPagesRoot
    val out = java.nio.file.Files
      .createTempDirectory("graft_e1_incr").toString
    def chunk(p: String) = Form700Pipeline.clean(
      graft.sources.Form700Source.cover(
        graft.sources.Form700Source.readPages(spark, s"$root/cover/$p")),
      Form700Pipeline.catalog("cover"), Some(Set.empty))
    val chunks = Seq(chunk("page_1.json"), chunk("page_2.json"))
    val r = Form700Pipeline.writeIncremental(spark, "cover", chunks, out)
      .collect().head
    assert(r.getAs[String]("status") == "SUCCESS")
    assert(r.getAs[Long]("rows_written") == tables("cover").count())
    assert(r.getAs[String]("mode") == "replace+append:1")
    // re-running the incremental load must NOT double the data: the
    // first chunk truncates (overwrite) before the appends
    val r2 = Form700Pipeline.writeIncremental(spark, "cover", chunks, out)
      .collect().head
    assert(r2.getAs[Long]("rows_written") == tables("cover").count())
    assert(r2.getAs[String]("status") == "SUCCESS")
  }

  test("K5 upsert: overlapping chunks merge latest-wins on the key") {
    import graft.operators.RetryPolicy
    val root = Form700Pipeline.defaultPagesRoot
    val out = java.nio.file.Files
      .createTempDirectory("graft_e1_upsert").toString
    def coverOf(path: String) = Form700Pipeline.clean(
      graft.sources.Form700Source.cover(
        graft.sources.Form700Source.readPages(spark, path)),
      Form700Pipeline.catalog("cover"), Some(Set.empty))
    // chunk 0 = full load (3 filings), chunk 1 = page 2 re-loaded (its
    // 1 filing OVERLAPS chunk 0) — append would yield 4 rows, upsert 3.
    val chunks = Seq(coverOf(s"$root/cover"),
      coverOf(s"$root/cover/page_2.json"))
    val audit = Form700Pipeline.writeUpsert(spark, "cover", chunks,
      "filing_id", out, RetryPolicy.NoWait).collect().head
    assert(audit.getAs[String]("status") == "SUCCESS")
    assert(audit.getAs[String]("mode") == "upsert:2")
    assert(audit.getAs[Long]("rows_written") == 3L)
    val merged = Form700Pipeline
      .upsertedTable(spark, "cover", out, chunks.size)
      .collect().map(r => r.getAs[String]("filing_id") -> r).toMap
    assert(merged.size == 3)
    // latest wins: the overlapping filing carries chunk-1 lineage, the
    // page-1-only filings keep chunk 0
    assert(merged("F003").getAs[Int]("src_chunk") == 1)
    assert(merged("F001").getAs[Int]("src_chunk") == 0)
    assert(merged("F002").getAs[Int]("src_chunk") == 0)
  }

  test("time travel: each retained generation is the consistent " +
      "snapshot of its chunk prefix, and generations are immutable") {
    import graft.operators.RetryPolicy
    val root = Form700Pipeline.defaultPagesRoot
    val out = java.nio.file.Files
      .createTempDirectory("graft_ttravel").toString
    def coverOf(path: String) = Form700Pipeline.clean(
      graft.sources.Form700Source.cover(
        graft.sources.Form700Source.readPages(spark, path)),
      Form700Pipeline.catalog("cover"), Some(Set.empty))
    // chunk 0 = full load; chunk 1 corrects F003 (page 2); chunk 2
    // corrects F001+F002 (page 1) — three distinct snapshots.
    val chunks = Seq(coverOf(s"$root/cover"),
      coverOf(s"$root/cover/page_2.json"),
      coverOf(s"$root/cover/page_1.json"))
    Form700Pipeline.writeUpsert(spark, "cover", chunks, "filing_id",
      out, RetryPolicy.NoWait)
    def lineage(gen: Int): Map[String, Int] =
      Form700Pipeline.upsertedTableAsOf(spark, "cover", out, gen)
        .collect()
        .map(r => r.getAs[String]("filing_id") ->
          r.getAs[Int]("src_chunk")).toMap
    // gen 0: everything from the full load
    assert(lineage(0) ==
      Map("F001" -> 0, "F002" -> 0, "F003" -> 0))
    // gen 1: only F003 corrected — the state BEFORE chunk 2, still
    // readable after gen 2 was written (immutability)
    assert(lineage(1) ==
      Map("F001" -> 0, "F002" -> 0, "F003" -> 1))
    // gen 2 == the current state (upsertedTable)
    assert(lineage(2) ==
      Map("F001" -> 2, "F002" -> 2, "F003" -> 1))
    assert(Form700Pipeline.upsertedTable(spark, "cover", out, 3)
      .collect().map(_.getAs[String]("filing_id")).sorted.toSeq ==
      Seq("F001", "F002", "F003"))
  }

  test("O4 job report: CSV artifact + SUCCESS/FAILURE subject line") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_e1_report").toString
    val audit = Form700Pipeline.writeAll(spark,
      Map("cover" -> tables("cover"), "comments" -> tables("comments")),
      s"$out/sink")
    val subject = Form700Pipeline.writeJobReport(audit, s"$out/report")
    assert(subject == "Form700 ETL SUCCESS: 2/2 tables loaded")
    val back = spark.read.option("header", "true").csv(s"$out/report")
    assert(back.count() == 2)
    assert(back.columns.contains("status") &&
      back.columns.contains("rows_written"))
    // FAILURE propagates to the subject (reference: any failed table
    // flips the email subject, Form700.py:520-529)
    val failed = audit.withColumn("status",
      org.apache.spark.sql.functions.lit("FAILURE"))
    assert(Form700Pipeline.jobReportSubject(failed)
      == "Form700 ETL FAILURE: 0/2 tables loaded")
  }

  test("retry policy: backoff schedule, reference constants, give-up") {
    import graft.operators.{Retry, RetryPolicy}
    // reference parity: @retry(tries=10, delay=1, backoff=2) + 0.25 s
    // rate limit (Form700.py:491-502)
    assert(RetryPolicy.Reference ==
      RetryPolicy(tries = 10, delayMs = 1000, backoff = 2.0,
        rateLimitMs = 250))
    // a block failing twice then succeeding: 3 attempts, sleeps 1s, 2s
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val got = Retry.withRetry(RetryPolicy.Reference, sleeps.append(_)) {
      calls += 1
      if (calls < 3) sys.error("transient") else 42
    }
    assert(got == 42 && calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L))
    // a block that never succeeds exhausts tries and rethrows
    var attempts = 0
    val e = intercept[RuntimeException] {
      Retry.withRetry(RetryPolicy(tries = 4, delayMs = 0), _ => ()) {
        attempts += 1; sys.error("down")
      }
    }
    assert(e.getMessage == "down" && attempts == 4)
  }

  test("runWithPageAudit: the tables plus a per-page parse-status " +
      "report from the same tolerant read (all SUCCESS on the clean " +
      "fixture)") {
    import graft.operators.{Form700Pipeline => P}
    val (tables, audit) = P.runWithPageAudit(spark, P.defaultPagesRoot,
      Some(P.fixtureDoubles))
    assert(tables.keySet.contains("cover") && tables.size == 8)
    val rows = audit.orderBy("source", "page").collect()
    // 2 cover pages + 2 schedule pages, every one a parse SUCCESS
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("cover", 1L), ("cover", 2L),
        ("schedules", 1L), ("schedules", 2L)))
    assert(rows.forall(_.getString(3) == "SUCCESS"))
    // the tables from the audited run equal the plain run's
    assert(tables("cover").collect().toSeq ==
      P.run(spark, P.defaultPagesRoot, Some(P.fixtureDoubles))("cover")
        .collect().toSeq)
  }
}
