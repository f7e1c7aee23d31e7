package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Restructure

/** S2–S5 — the reference's paged-JSON ingest
  * (Form700.py:115-181), rebuilt file-first: each API page is one JSON
  * object in a file, a directory of pages is one `spark.read.json` scan,
  * and the reference's page-concat loop (Form700.py:136-144, the
  * `itertools.chain` at :180) becomes the scan's implicit UNION ALL over
  * files — embarrassingly parallel, one task per file split at scale.
  *
  * The "pluck one key and normalize" steps (Form700.py:139-140,151 for
  * `filings`; :178-181 per schedule) become `explode` of the plucked
  * array plus a recursive struct flatten (P1).
  */
object Form700Source {

  /** Schedule table names, private variant (Form700.py:98). */
  val scheduleNames: Seq[String] = Seq(
    "scheduleA1", "scheduleA2", "scheduleB", "scheduleC",
    "scheduleD", "scheduleE", "comments")

  /** Name of the synthetic corrupt-record column [[readPagesWithStatus]]
    * parses into (never part of any page's real schema). */
  val CorruptPageCol = "_corrupt_page"

  /** Read a paged source (S2/S3) TOLERANTLY: page bodies come through
    * the [[PagedJsonSource]] DataSourceV2 connector — one task per
    * page, pluggable fetcher (file-backed here; an HTTP deployment
    * registers its client as a [[PageFetcher]]) — and decode via
    * `from_json`, with per-page parse tolerance: the Spark form of the
    * reference's try/except around `json.loads` (Form700.py:123-126:
    * print "could not load content as json" and continue). Returns
    *  - `pages`: the successfully parsed page objects (bad pages
    *    DROPPED, exactly as the reference's `None` response is), and
    *  - `status`: one row per page `(page, parse_ok)` — the accounting
    *    the reference only printed, surfaced as data so the audit
    *    report can count parse failures ([[graft.operators
    *    .Form700Pipeline.pageParseAudit]]).
    *
    * Validity is probed by a SEPARATE tiny parse (a one-field corrupt-
    * record schema) and the filter applies to the raw body BELOW the
    * data parse — deliberately, so the data `from_json` sits directly
    * under each consumer's pluck and Catalyst's JSON-expression
    * optimization can PRUNE its parse schema: a table that plucks one
    * schedule array materializes just that array, not the whole page
    * object (PlanQualitySpec asserts this). The body text is tokenized
    * twice (validity probe + data parse) — cheap next to materializing
    * 8 unused nested arrays per table at scale.
    *
    * The schema is inferred from the page bodies (malformed bodies
    * contribute Spark's `_corrupt_record` inference column, which is
    * stripped from the data schema). */
  def readPagesWithStatus(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val raw = spark.read
      .format("graft.sources.PagedJsonSource")
      .option("path", path).load()
    val bodies = raw.select("body")
      .as(org.apache.spark.sql.Encoders.STRING)
    val inferredCorrupt =
      spark.conf.get("spark.sql.columnNameOfCorruptRecord",
        "_corrupt_record")
    val dataSchema = org.apache.spark.sql.types.StructType(
      spark.read.json(bodies).schema
        .filterNot(_.name == inferredCorrupt))
    val probeSchema = new org.apache.spark.sql.types.StructType()
      .add(CorruptPageCol, org.apache.spark.sql.types.StringType)
    // Spark's from_json maps an empty/whitespace body to a NULL struct
    // (not a corrupt-populated row), so blank bodies need their own
    // clause — an empty 200 response is a parse FAILURE (DuckDB's
    // json_valid('') agrees), not a page of nulls.
    // PAGE CONTRACT: a usable page is a JSON OBJECT. The struct-schema
    // probe marks a valid-but-non-object body (array/string/number/
    // bare null) as a FAILURE too — deliberately: the reference
    // subscripts responseJson['totalMatchingPages'] unconditionally
    // (Form700.py:144), so a non-object page is exactly as unusable as
    // a truncated one. The e1_audit_pages oracle states the same rule
    // (json_type = 'OBJECT').
    def parseOk = col("body").isNotNull &&
      trim(col("body")) =!= "" &&
      from_json(col("body"), probeSchema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptPageCol))
        .getField(CorruptPageCol).isNull
    val status = raw.select(col("page"), parseOk.as("parse_ok"))
    val pages = raw.where(parseOk)
      .select(from_json(col("body"), dataSchema).as("j"))
      .select("j.*")
    (pages, status)
  }

  /** The parsed pages alone — [[readPagesWithStatus]] without the
    * status relation. Malformed pages are dropped (reference parity);
    * callers that must ACCOUNT for them use the two-sided form. */
  def readPages(spark: SparkSession, path: String): DataFrame =
    readPagesWithStatus(spark, path)._1

  /** S4 (Form700.py:146-158): pluck the `filings` array from every cover
    * page, concat across pages, flatten nested structs to dotted
    * columns. */
  def cover(pages: DataFrame): DataFrame =
    Restructure.flattenStruct(
      pages.select(explode(col("filings")).as("f")).select(col("f.*")))

  /** S5 (Form700.py:160-181): pluck one schedule's array from every page
    * object, concat, flatten. Pages where the array is empty contribute
    * no rows (the reference's chain over empty lists). */
  def schedule(pages: DataFrame, name: String): DataFrame =
    Restructure.flattenStruct(
      pages.select(explode(col(s"`$name`")).as("r")).select(col("r.*")))

  /** All schedule tables from one page scan. The single `pages` plan is
    * reused per schedule; Spark reads the JSON once per materialized
    * table but prunes to just that schedule's column. */
  def schedules(pages: DataFrame): Map[String, DataFrame] =
    scheduleNames.map(n => n -> schedule(pages, n)).toMap
}
