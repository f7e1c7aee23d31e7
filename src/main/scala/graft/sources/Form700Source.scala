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

  /** Read a directory of page files (one JSON object per file —
    * `multiLine` exactly like the API's one-object-per-response). */
  def readPages(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

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
