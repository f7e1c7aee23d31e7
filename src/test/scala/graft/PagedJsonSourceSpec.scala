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

  test("streaming read: page index as offset; new pages picked up incrementally") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_paged_stream").toString
    def writePage(n: Int): Unit =
      Files.writeString(Paths.get(s"$dir/page_$n.json"),
        s"""{"filings": [{"filingId": "S$n"}]}""")
    writePage(1); writePage(2)
    val q = spark.readStream.format("graft.sources.PagedJsonSource")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("paged_stream_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("paged_stream_sink").count() == 2)
      // the feed grows between triggers: only the NEW page is planned
      // (offset advanced past 2), and the earlier rows are not re-emitted
      writePage(3)
      q.processAllAvailable()
      val rows = spark.table("paged_stream_sink")
        .orderBy("page").collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
      assert(rows.last.getString(1).contains("S3"))
    } finally q.stop()
  }

  test("maxPagesPerTrigger=1: AvailableNow drains one page per batch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    class Api4 extends PageFetcher {
      override def totalPages(): Int = 4
      override def fetchPage(page: Int): String =
        s"""{"filings": [{"filingId": "B$page"}]}"""
    }
    PagedJsonSource.registerFetcher("api4", new Api4)
    val perBatch = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft.sources.PagedJsonSource")
      .option("fetcher", "api4").option("maxPagesPerTrigger", 1).load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val n = b.count()
        if (n > 0) perBatch.add(n)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 4 pages, cap 1 → four one-page batches, drained to the bound
    // snapshotted at start
    import scala.jdk.CollectionConverters._
    assert(perBatch.asScala.toSeq == Seq(1L, 1L, 1L, 1L))
  }

  test("corrupt page: tolerated, dropped from data, counted in status " +
      "(Form700.py:123-126)") {
    class Mixed extends PageFetcher {
      override def totalPages(): Int = 4
      override def fetchPage(page: Int): String = page match {
        case 2 => """{"filings": [{"filingId": "C2""" // truncated
        case 4 => "  " // blank 200 response — also a parse failure
        case p => s"""{"filings": [{"filingId": "C$p"}]}"""
      }
    }
    PagedJsonSource.registerFetcher("mixed3", new Mixed)
    // route the registered fetcher through the Form700Source path by
    // reading the raw feed the same way readPagesWithStatus does
    val raw = spark.read.format("graft.sources.PagedJsonSource")
      .option("fetcher", "mixed3").load()
    // the public entry: file-backed variant via a temp dir
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt")
    (1 to 4).foreach { p =>
      java.nio.file.Files.writeString(dir.resolve(s"page_$p.json"),
        new Mixed().fetchPage(p))
    }
    val (pages, status) = graft.sources.Form700Source
      .readPagesWithStatus(spark, dir.toUri.toString)
    val st = status.orderBy("page").collect()
    assert(st.map(r => (r.getInt(0), r.getBoolean(1))).toSeq ==
      Seq((1, true), (2, false), (3, true), (4, false)))
    // bad page dropped, good pages parsed; schema carries no corrupt col
    val filings = graft.sources.Form700Source.cover(pages)
      .orderBy("filingId").collect().map(_.getString(0)).toSeq
    assert(filings == Seq("C1", "C3"))
    assert(!pages.columns.contains(
      graft.sources.Form700Source.CorruptPageCol))
    // the audit report counts the failure with the reference vocabulary
    val audit = graft.operators.Form700Pipeline
      .pageParseAudit(status, "cover").orderBy("page").collect()
    assert(audit.map(_.getString(3)).toSeq ==
      Seq("SUCCESS", "FAILURE", "SUCCESS", "FAILURE"))
    assert(raw.count() == 4) // the raw feed still surfaces every page
  }
}
