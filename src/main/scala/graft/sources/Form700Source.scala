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

  /** Read a paged source (S2/S3): page bodies come through the
    * [[PagedJsonSource]] DataSourceV2 connector — one task per page,
    * pluggable fetcher (file-backed here; an HTTP deployment registers
    * its client as a [[PageFetcher]]) — and the one-object-per-response
    * bodies decode through Spark's JSON reader with inferred schema,
    * exactly as `spark.read.json` on files would. */
  def readPages(spark: SparkSession, path: String): DataFrame = {
    val bodies = spark.read
      .format("graft.sources.PagedJsonSource")
      .option("path", path).load()
      .select("body")
      .as(org.apache.spark.sql.Encoders.STRING)
    spark.read.json(bodies)
  }

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
