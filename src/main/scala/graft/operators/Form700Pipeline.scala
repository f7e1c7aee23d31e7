package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.AsciiBackslash.asciiBackslash
import graft.sources.Form700Source

/** The assembled E1 pipeline — `getDataAndUpload`
  * (Form700.py:667-687) re-expressed Spark-first: paged-JSON sources →
  * J1 broadcast filer join → X4 catalog dispatch (serialize / explode) →
  * P2 schema projection → F1–F5 casts → K-family parquet sink with the
  * O5/A1 row-count audit.
  *
  * The catalog (§1.4 of SURVEY.md) stays *data*: table list-columns and
  * per-table field contracts load from CSV resources
  * (`src/main/resources/form700/`) shaped like the reference's
  * form700_schemas (Form700.py:246-253, form700_tables.csv) — authored
  * for the fixture corpus, not copied.
  */
object Form700Pipeline {

  // ------------------------------------------------------------------
  // Catalog (driver-side only — a few KB of config, never shipped to
  // executors; SURVEY.md §7.4 "catalog only on driver").
  // ------------------------------------------------------------------

  final case class FieldSpec(dataType: String, fieldName: String,
                             displayName: String)
  /** One catalog row (K1/K6 — the reference's form700_tables.csv
    * header: df_name, dataset_name, category, description, tags,
    * list_columns, FourByFour, redacted). `fourByFour == "0"` marks a
    * dataset not yet created in the sink catalog — the K1
    * create-vs-replace branch (Form700.py:439-454). */
  final case class TableSpec(name: String, datasetName: String,
                             category: String, description: String,
                             tags: Seq[String], listColumns: Seq[String],
                             fourByFour: String, redacted: Boolean,
                             fields: Seq[FieldSpec]) {
    def fieldNames: Seq[String] = fields.map(_.fieldName)
    def needsCreate: Boolean = fourByFour == "0"
  }

  /** Columns that explode to child rows (X2) rather than serialize to a
    * string (X1) — Form700.py:335-343. */
  private val Explodable = Set("gifts", "realProperties")
  /** X3 (Form700.py:356-362): only realProperties children are
    * prefixed. */
  private val ExplodePrefix = Map("realProperties" -> "realProperty")

  private def resourceLines(path: String): Seq[String] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** K6 analog (Form700.py:402-404) — the table catalog, loaded once.
    * 16 rows: 8 base tables + their `_redacted` variants (same field
    * schema, own dataset metadata — Form700.py:99). */
  lazy val catalog: Map[String, TableSpec] =
    resourceLines("/form700/tables.csv").drop(1).map { line =>
      val cols = line.split(",", -1)
      require(cols.length == 8,
        s"bad catalog row (expected 8 comma-separated fields, " +
          s"got ${cols.length}): $line")
      val Array(name, dsName, category, desc, tags, listCols, fxf, red) = cols
      val base = name.stripSuffix("_redacted")
      val fields = resourceLines(s"/form700/schema/form700_${base}_schema.csv")
        .drop(1).map { l =>
          val fc = l.split(",", -1)
          require(fc.length == 3,
            s"bad schema row for $name (expected 3 fields): $l")
          FieldSpec(fc(0), fc(1), fc(2))
        }
      name -> TableSpec(name, dsName, category, desc,
        tags.split(":").toIndexedSeq.filter(_.nonEmpty),
        listCols.split(":").toIndexedSeq.filter(_.nonEmpty),
        fxf, red.equalsIgnoreCase("true"), fields)
    }.toMap

  /** Known fixture page files (FIXTURES.md §B) — same layout under the
    * base and redacted roots. */
  private val pageFiles = Seq(
    "cover/page_1.json", "cover/page_2.json",
    "schedules/page_1.json", "schedules/page_2.json")

  /** The corrupt-page fixture (S2 parse tolerance — Form700.py:123-126):
    * page 1 valid, page 2 truncated mid-object. */
  private val corruptPageFiles = Seq(
    "cover/page_1.json", "cover/page_2.json")

  /** Location of a page-fixture root as a `file:`-readable directory.
    * When the classpath copy sits on disk we use it directly; when it is
    * packaged inside a jar (sbt runMain), the files are extracted once
    * to a temp dir — Hadoop's FileSystem cannot read `jar:` URIs. */
  private def fixtureRoot(resRoot: String,
                          files: Seq[String] = pageFiles): String = {
    val url = getClass.getResource(resRoot)
    if (url != null && url.getProtocol == "file") url.toString
    else {
      val tmp = java.nio.file.Files.createTempDirectory("graft_f700_pages")
      files.foreach { rel =>
        val in = getClass.getResourceAsStream(s"$resRoot/$rel")
        require(in != null, s"missing resource $resRoot/$rel")
        val dst = tmp.resolve(rel)
        java.nio.file.Files.createDirectories(dst.getParent)
        try java.nio.file.Files.copy(in, dst) finally in.close()
      }
      tmp.toUri.toString
    }
  }

  lazy val defaultPagesRoot: String = fixtureRoot("/form700/pages")

  /** The redacted endpoint's pages (IsRedacted=True — server-side
    * masking of filer identity; Form700.py:121): same layout, masked
    * values. */
  lazy val defaultRedactedPagesRoot: String =
    fixtureRoot("/form700/pages_redacted")

  /** The corrupt-page fixture root (one valid page, one truncated). */
  lazy val defaultCorruptPagesRoot: String =
    fixtureRoot("/form700/pages_corrupt", corruptPageFiles)

  // ------------------------------------------------------------------
  // J1 — joinFilerToSchedule (Form700.py:346-352)
  // ------------------------------------------------------------------

  /** The 8 filer-identity columns denormalized onto every schedule row
    * (Form700.py:347). */
  val filerCols: Seq[String] = Seq("filingId", "filerName",
    "departmentName", "positionName", "offices", "periodStart",
    "periodEnd", "filingDate")

  /** Left-outer equi-join of each schedule with the cover projection on
    * `filingId`. The cover side is tiny relative to schedules (one row
    * per filing vs many rows per schedule) — broadcast it so the fact
    * side never shuffles, at any scale. */
  def joinFilerToSchedule(schedules: Map[String, DataFrame],
                          cover: DataFrame): Map[String, DataFrame] = {
    val filer = broadcast(
      cover.select(filerCols.map(c => col(s"`$c`")): _*))
    schedules.map { case (n, df) =>
      n -> df.join(filer, Seq("filingId"), "left_outer")
    }
  }

  // ------------------------------------------------------------------
  // cleanDataSet (Form700.py:246-289): X4 dispatch → P2 project →
  // F1 newline strip → castFields
  // ------------------------------------------------------------------

  /** X4 (Form700.py:325-344): serialize every list column except
    * gifts/realProperties; explode those (with the X3 prefix). */
  def dispatchListColumns(df: DataFrame, spec: TableSpec): DataFrame = {
    val present = df.columns.toSet
    val (explodeCols, serializeCols) =
      spec.listColumns.partition(Explodable.contains)
    var d = df
    serializeCols.filter(present.contains).foreach { c =>
      d = Restructure.serializeStructArray(d, c)
    }
    explodeCols.filter(present.contains).foreach { c =>
      d = Restructure.explodeStructArray(d, c, ExplodePrefix.get(c))
    }
    d
  }

  /** castFields (Form700.py:258-289). Type semantics:
    *  - text:     null→"", string cast, non-ASCII backslash-escaped (F5)
    *  - number:   sanitize [a-zA-Z%]→'0' (F2), then the reference's
    *              column-global int-else-float decision (F4): LONG if
    *              every non-null sanitized value parses as long, else
    *              DOUBLE; nulls/unparseable → 0 / 0.0 (F3)
    *  - checkbox: null→false
    *  - date:     pass-through (the reference's date cast is disabled,
    *              Form700.py:285-288 — dates stay text)
    *
    * `numberAsDouble` pins the per-column decision without the extra
    * inspection pass — the scale path when the contract is known. When
    * absent, one narrow aggregate over just the number columns decides
    * (column-pruned scan, one job, no collect of data rows). */
  def castFields(df: DataFrame, spec: TableSpec,
                 numberAsDouble: Option[Set[String]] = None): DataFrame = {
    def c(n: String): Column = col(s"`$n`")
    val numberCols = spec.fields.filter(_.dataType == "number")
      .map(_.fieldName)
    val doubles: Set[String] = numberAsDouble.getOrElse {
      if (numberCols.isEmpty) Set.empty
      else {
        val flags = df.agg(
          max(lit(0)).as("__pad"), // keeps agg non-empty if 1 col
          numberCols.map { n =>
            val s = Cleaning.sanitizeNumber(c(n))
            max(when(s.isNotNull && s.try_cast(LongType).isNull, 1)
              .otherwise(0)).as(n)
          }: _*).head()
        numberCols.filter(n => flags.getAs[Int](n) == 1).toSet
      }
    }
    val outCols = spec.fields.map { f =>
      val in = c(f.fieldName)
      val out = f.dataType match {
        case "text" => asciiBackslash(Cleaning.textOrEmpty(in))
        case "number" =>
          if (doubles.contains(f.fieldName)) Cleaning.toDoubleOrZero(in)
          else Cleaning.toLongOrZero(in)
        case "checkbox" => Cleaning.checkboxOrFalse(in)
        case _ => in // date: disabled cast, flows through as-is
      }
      out.as(f.fieldName)
    }
    df.select(outCols: _*)
  }

  /** Full clean pass for one table (cleanDataSet, Form700.py:246-256). */
  def clean(df: DataFrame, spec: TableSpec,
            numberAsDouble: Option[Set[String]] = None): DataFrame = {
    val dispatched = dispatchListColumns(df, spec)
    val projected = Cleaning.projectToSchema(dispatched, spec.fieldNames)
    castFields(Cleaning.removeNewLines(projected), spec, numberAsDouble)
  }

  // ------------------------------------------------------------------
  // E1 assembled (getDataAndUpload, Form700.py:667-687)
  // ------------------------------------------------------------------

  /** Per-table number columns that take the reference's float fallback
    * on the fixture corpus — pinning these keeps `run` fully lazy (no
    * per-table inspection job). Derived from the fixtures; a deployment
    * against other data either pins its own map or passes None to let
    * the inspection pass decide. */
  val fixtureDoubles: Map[String, Set[String]] = Map(
    "scheduleB" -> Set("loan.interestRate"),
    "scheduleD" -> Set("amount"))

  /** Source → join → clean for all 8 tables. With `doublesByTable`
    * pinned, lazy end to end: nothing executes until a sink action. */
  def run(spark: SparkSession, pagesRoot: String,
          doublesByTable: Option[Map[String, Set[String]]] = None)
      : Map[String, DataFrame] = runWithPageAudit(
    spark, pagesRoot, doublesByTable)._1

  /** [[run]] plus the per-feed page-parse audit ([[pageParseAudit]]
    * over both page feeds' status relations — the S2 tolerance's
    * accounting, Form700.py:123-126): the job-report shape that counts
    * a malformed page instead of silently shrinking a table. The
    * status relations come from the SAME tolerant read the tables are
    * built from — no second pass over the feed is planned. */
  def runWithPageAudit(spark: SparkSession, pagesRoot: String,
                       doublesByTable: Option[Map[String, Set[String]]] =
                         None)
      : (Map[String, DataFrame], DataFrame) = {
    val (coverPages, coverStatus) =
      Form700Source.readPagesWithStatus(spark, s"$pagesRoot/cover")
    val (schedPages, schedStatus) =
      Form700Source.readPagesWithStatus(spark, s"$pagesRoot/schedules")
    val coverRaw = Form700Source.cover(coverPages)
    val schedulesRaw = Form700Source.schedules(schedPages)
    val joined = joinFilerToSchedule(schedulesRaw, coverRaw)
    val tables = (joined + ("cover" -> coverRaw)).map { case (n, df) =>
      n -> clean(df, catalog(n),
        doublesByTable.map(_.getOrElse(n, Set.empty)))
    }
    val audit = pageParseAudit(coverStatus, "cover")
      .unionByName(pageParseAudit(schedStatus, "schedules"))
    (tables, audit)
  }

  /** Both privacy variants — the reference runs the whole pipeline
    * twice, `isRedacted` False then True (Form700.py:714-718), against
    * the same endpoints with the `IsRedacted` request flag; redaction
    * happens SERVER-side (SURVEY.md §1.4), so here the flag selects a
    * source directory and suffixes every table name `_redacted`
    * (Form700.py:99,170). 16 logical tables total. */
  def runBoth(spark: SparkSession, pagesRoot: String,
              redactedPagesRoot: String,
              doublesByTable: Option[Map[String, Set[String]]] = None)
      : Map[String, DataFrame] =
    run(spark, pagesRoot, doublesByTable) ++
      run(spark, redactedPagesRoot, doublesByTable)
        .map { case (n, df) => s"${n}_redacted" -> df }

  // ------------------------------------------------------------------
  // Sink + audit (K1–K5 — Form700.py:439-506; O5/A1 — :588-655)
  // ------------------------------------------------------------------

  /** K2 sink prep (Form700.py:465-470): snake_case dot-stripped column
    * names, string nulls → "" (the reference's sink-wide fillna). */
  def prepareForSink(df: DataFrame): DataFrame =
    Restructure.renameForSink(df).na.fill("")

  /** Deterministic stand-in for the sink catalog's assigned dataset id
    * (the reference gets a fresh FourByFour back from dataset creation,
    * Form700.py:443-446): first 8 md5 hex digits of the dataset name,
    * formatted xxxx-xxxx — stable across runs and engines. */
  def assignFourByFour(datasetName: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(datasetName.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    s"${hex.take(4)}-${hex.drop(4)}"
  }

  /** Write every table, then audit written counts against expected —
    * the O5 SUCCESS/FAILURE check, returned as a report DataFrame
    * instead of an email.
    *
    * K1 create-vs-replace (Form700.py:439-454): a table whose catalog
    * row carries `FourByFour == 0` does not exist in the sink yet — it
    * is CREATED (write fails if the path already exists) and assigned a
    * deterministic id; every other table is REPLACED (truncate-and-load
    * overwrite, K4; the reference's chunked upsert + retry collapses
    * into Spark's task-level writes and retries). The report carries the
    * catalog metadata (dataset_name, four_by_four, mode) so the audit
    * is checkable against the catalog. */
  def writeAll(spark: SparkSession, tables: Map[String, DataFrame],
               outDir: String): DataFrame = {
    // Tables are independent → submit their jobs concurrently (Spark's
    // scheduler interleaves them); wall time is the slowest table, not
    // the sum of eight small write+audit round trips.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      Future {
        val spec = catalog.get(name)
        val create = spec.exists(_.needsCreate)
        val fxf = spec.map(s =>
          if (s.needsCreate) assignFourByFour(s.datasetName)
          else s.fourByFour).getOrElse("")
        // persist: the audit needs both a pre-sink count and the write —
        // without it the whole upstream pipeline executes twice.
        val prepared = prepareForSink(df).persist()
        val dsName = spec.map(_.datasetName).getOrElse(name)
        val mode = if (create) "create" else "replace"
        try {
          val expected = prepared.count()
          val path = s"$outDir/$name"
          try {
            prepared.write
              .mode(if (create) "errorifexists" else "overwrite")
              .parquet(path)
            val written = spark.read.parquet(path).count()
            Row(name, dsName, fxf, mode, expected, written,
              if (written == expected) "SUCCESS" else "FAILURE")
          } catch {
            // reference parity: a failed create is reported, not thrown
            // (Form700.py:447-452 prints the error and carries on)
            case _: org.apache.spark.sql.AnalysisException =>
              Row(name, dsName, fxf, mode, expected, 0L, "FAILURE")
          }
        } finally prepared.unpersist()
      }
    }
    val report = futures.map(Await.result(_, Duration.Inf))
    auditFrame(spark, report)
  }

  private val auditSchema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("dataset_name", StringType, nullable = false),
    StructField("four_by_four", StringType, nullable = false),
    StructField("mode", StringType, nullable = false),
    StructField("rows_expected", LongType, nullable = false),
    StructField("rows_written", LongType, nullable = false),
    StructField("status", StringType, nullable = false)))

  private def auditFrame(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      auditSchema)

  /** Per-page PARSE-STATUS audit — the accounting half of the
    * reference's page-parse tolerance (Form700.py:123-126 catches a
    * `json.loads` failure, prints "could not load content as json",
    * and carries on; the failure reaches no report). Here the same
    * tolerance is data: one audit line per fetched page with the
    * reference's SUCCESS/FAILURE vocabulary, so a bad page is COUNTED
    * in the job report instead of silently shrinking a table. Stays
    * fully distributed — the status relation is one row per page, the
    * page bodies themselves never leave their scan tasks. */
  def pageParseAudit(status: DataFrame, source: String): DataFrame =
    status.select(lit(source).as("source"),
      col("page").cast(LongType).as("page"), col("parse_ok"),
      when(col("parse_ok"), "SUCCESS").otherwise("FAILURE").as("status"))

  /** K5 incremental load (Form700.py:493-502): the reference REPLACES
    * the dataset with the first chunk and UPSERTS every later chunk.
    * The Spark analog takes the chunks as DataFrames (e.g. one per
    * source page): the head chunk writes mode=overwrite
    * (truncate-and-load), tail chunks mode=append.
    *
    * NOTE: append ≙ the reference's upsert ONLY for key-disjoint chunks
    * (true for page-chunked loads, where each row identity appears in
    * exactly one page); overlapping chunks would double rows here where
    * the reference updates in place — use [[writeUpsert]] for that case.
    * The reference's per-chunk `@retry` policy is surfaced on
    * [[writeUpsert]] and collapses into Spark task retries here. The
    * audit compares the summed chunk counts against the combined
    * read-back count — same report shape as [[writeAll]]. */
  def writeIncremental(spark: SparkSession, name: String,
                       chunks: Seq[DataFrame], outDir: String): DataFrame = {
    require(chunks.nonEmpty, s"writeIncremental($name): no chunks")
    val spec = catalog.get(name)
    val fxf = spec.map(s =>
      if (s.needsCreate) assignFourByFour(s.datasetName)
      else s.fourByFour).getOrElse("")
    val path = s"$outDir/$name"
    var expected = 0L
    chunks.zipWithIndex.foreach { case (c, i) =>
      val prepared = prepareForSink(c).persist()
      try {
        expected += prepared.count()
        prepared.write.mode(if (i == 0) "overwrite" else "append")
          .parquet(path)
      } finally prepared.unpersist()
    }
    val written = spark.read.parquet(path).count()
    auditFrame(spark, Seq(Row(name,
      spec.map(_.datasetName).getOrElse(name), fxf,
      s"replace+append:${chunks.size - 1}", expected, written,
      if (written == expected) "SUCCESS" else "FAILURE")))
  }

  /** K5 keyed UPSERT — the reference's true chunk[1:] semantics
    * (Form700.py:498-502: `client.upsert` inserts-or-updates by row
    * identity): chunk 0 replaces the dataset; each later chunk merges
    * latest-chunk-wins on `key`. Re-loading a correction chunk with
    * overlapping keys UPDATES those rows instead of duplicating them
    * (contrast [[writeIncremental]], which is append-only and correct
    * only for key-disjoint chunks).
    *
    * Layout: immutable GENERATION directories (`gen_0`, `gen_1`, …) —
    * each merge reads generation i-1 and writes generation i, so no
    * read-modify-overwrite of a path Spark is still lazily reading (the
    * same write-new-files-then-advance discipline table formats like
    * Iceberg/Delta use for their merge). The merge itself is one window
    * dedup per chunk: shuffle on `key`, keep the row with the highest
    * source-chunk index. Rows carry their `src_chunk` lineage so
    * latest-wins is observable (and oracle-checkable) in the output.
    *
    * Preconditions: `key` is unique WITHIN each chunk (the reference's
    * row-identity assumption). `retry` surfaces the reference's
    * tries/delay/backoff/rate-limit constants ([[RetryPolicy.Reference]])
    * around each chunk's write job. */
  def writeUpsert(spark: SparkSession, name: String, chunks: Seq[DataFrame],
                  key: String, outDir: String,
                  retry: RetryPolicy = RetryPolicy.Reference): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(chunks.nonEmpty, s"writeUpsert($name): no chunks")
    val spec = catalog.get(name)
    val fxf = spec.map(s =>
      if (s.needsCreate) assignFourByFour(s.datasetName)
      else s.fourByFour).getOrElse("")
    val base = s"$outDir/$name"
    chunks.zipWithIndex.foreach { case (c, i) =>
      val incoming = prepareForSink(c).withColumn("src_chunk", lit(i))
      val merged =
        if (i == 0) incoming
        else {
          val prev = spark.read.parquet(s"$base/gen_${i - 1}")
          val w = Window.partitionBy(col(s"`$key`"))
            .orderBy(col("src_chunk").desc)
          prev.unionByName(incoming)
            .withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1)
            .drop("__rn")
        }
      Retry.withRetry(retry) {
        merged.write.mode("overwrite").parquet(s"$base/gen_$i")
      }
      if (i < chunks.size - 1) Retry.rateLimit(retry)
    }
    val finalDf = upsertedTable(spark, name, outDir, chunks.size)
    val written = finalDf.count()
    // expected = distinct key count across all chunks (every identity
    // appears exactly once after the merge).
    val expected = chunks.map(c => prepareForSink(c).select(col(s"`$key`")))
      .reduce(_.unionAll(_)).distinct().count()
    auditFrame(spark, Seq(Row(name,
      spec.map(_.datasetName).getOrElse(name), fxf,
      s"upsert:${chunks.size}", expected, written,
      if (written == expected) "SUCCESS" else "FAILURE")))
  }

  /** The current state of an upserted table: its latest generation. */
  def upsertedTable(spark: SparkSession, name: String, outDir: String,
                    nChunks: Int): DataFrame =
    spark.read.parquet(s"$outDir/$name/gen_${nChunks - 1}")

  /** TIME-TRAVEL read: the upserted table AS OF generation `gen`
    * (0-based; `nChunks - 1` is the current state). [[writeUpsert]]'s
    * generation dirs are IMMUTABLE — gen i is written once as the
    * merge of gen i-1 with chunk i and never rewritten — so every
    * retained generation is a consistent snapshot: exactly the
    * latest-wins merge of chunks 0..gen. This is the snapshot-as-of
    * read table formats (Iceberg `VERSION AS OF`, Delta time travel)
    * expose, carried by the layout the chunked upsert already pays
    * for — no extra metadata, no extra write cost. Retention is the
    * caller's dial: drop old `gen_*` dirs to reclaim space and the
    * remaining generations stay readable. */
  def upsertedTableAsOf(spark: SparkSession, name: String, outDir: String,
                        gen: Int): DataFrame = {
    require(gen >= 0, s"generation must be >= 0: $gen")
    spark.read.parquet(s"$outDir/$name/gen_$gen")
  }

  // ------------------------------------------------------------------
  // O4 — job report artifact (Form700.py:520-583 builds a per-table
  // CSV report + subject line; :638-655 emails it). SMTP itself is a
  // side channel outside the dataflow; the ARTIFACT — the report CSV
  // and its SUCCESS/FAILURE subject — is modeled here so a deployment
  // can attach any transport to it.
  // ------------------------------------------------------------------

  /** The reference's email subject: overall status + table tally
    * (Form700.py:520-529 — FAILURE if any table failed). Derived from
    * the audit report frame; the collect is 1 row per table (bounded by
    * the catalog, never by data). */
  def jobReportSubject(audit: DataFrame): String = {
    val counts = audit.agg(
      count(lit(1)).as("n"),
      sum(when(col("status") === "SUCCESS", 1).otherwise(0)).as("ok"))
      .head()
    val (n, ok) = (counts.getAs[Long]("n"), counts.getAs[Long]("ok"))
    val status = if (ok == n) "SUCCESS" else "FAILURE"
    s"Form700 ETL $status: $ok/$n tables loaded"
  }

  /** Write the audit report as ONE csv file with a header — the email
    * attachment analog (Form700.py:571-583 writes the report CSV before
    * sending). Returns the subject line for the caller's transport. */
  def writeJobReport(audit: DataFrame, path: String): String = {
    audit.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
    jobReportSubject(audit)
  }
}
