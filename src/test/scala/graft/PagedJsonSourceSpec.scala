package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Form700Pipeline
import graft.sources.{Form700Source, PagedJsonSource, PageFetcher}

/** The DataSourceV2 paged source: file-backed reads, the pluggable
  * fetcher plug point (the reference's HTTP loop seam,
  * Form700.py:107-144), and page-per-partition parallelism. */
class PagedJsonSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def coverDir = s"${Form700Pipeline.defaultPagesRoot}/cover"

  test("file-backed: one row per page file, numeric page order") {
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", coverDir).load()
    val rows = df.orderBy("page").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows.forall(_.getString(1).contains("filings")))
    // the paging loop parallelizes: one input partition per page
    assert(df.rdd.getNumPartitions == 2)
  }

  test("single-file path reads exactly that page") {
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", s"$coverDir/page_2.json").load()
    assert(df.count() == 1)
  }

  test("registered fetcher: the API-loop seam, bound read at planning") {
    // a stand-in for the HTTP client: 3 pages, bodies generated
    class FakeApi extends PageFetcher {
      override def totalPages(): Int = 3
      override def fetchPage(page: Int): String =
        s"""{"filings": [{"filingId": "P$page", "filerName": "n$page"}]}"""
    }
    PagedJsonSource.registerFetcher("fake_api", new FakeApi)
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("fetcher", "fake_api").load()
    assert(df.rdd.getNumPartitions == 3)
    val parsed = Form700Source.cover(
      spark.read.json(df.select("body")
        .as(org.apache.spark.sql.Encoders.STRING)))
    assert(parsed.select("filingId").collect().map(_.getString(0)).sorted
      .toSeq == Seq("P1", "P2", "P3"))
  }

  test("readPages over the connector matches the direct JSON scan") {
    val viaConnector = Form700Source.readPages(spark, coverDir)
    val direct = spark.read.option("multiLine", "true").json(coverDir)
    assert(viaConnector.schema == direct.schema)
    assert(viaConnector.count() == direct.count())
  }
}
