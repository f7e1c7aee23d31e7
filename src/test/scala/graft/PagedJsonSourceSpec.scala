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

  test("loopback HTTP: HttpPageFetcher carries S1 auth + S2 paging " +
      "through the registered DSv2 path (Form700.py:107-127 shape)") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import java.nio.charset.StandardCharsets.UTF_8
    def fixtureText(p: Int): String = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        java.net.URI.create(s"$coverDir/page_$p.json"))), UTF_8)
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val authBodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pageReqs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      x.sendResponseHeaders(code, b.length)
      try x.getResponseBody.write(b) finally x.getResponseBody.close()
    }
    // S1: the session-auth endpoint — form-POST credentials in, session
    // cookie out (the password arrives DECODED: Form700.py:112).
    server.createContext("/auth", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        authBodies.add(new String(x.getRequestBody.readAllBytes(), UTF_8))
        x.getResponseHeaders.add("Set-Cookie", "session=tok123; Path=/")
        respond(x, 200, "ok")
      }
    })
    // S2: the paged endpoint — session cookie required, reference query
    // params, fixture page bodies (totalMatchingPages included).
    server.createContext("/api/cover", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val q = Option(x.getRequestURI.getQuery).getOrElse("")
        pageReqs.add(q + "|cookie=" +
          Option(x.getRequestHeaders.getFirst("Cookie")).getOrElse("") +
          "|ct=" +
          Option(x.getRequestHeaders.getFirst("Content-type")).getOrElse(""))
        if (!Option(x.getRequestHeaders.getFirst("Cookie"))
            .exists(_.contains("session=tok123"))) respond(x, 403, "no auth")
        else {
          val page = "CurrentPageIndex=(\\d+)".r.findFirstMatchIn(q)
            .map(_.group(1).toInt).getOrElse(0)
          if (page >= 1 && page <= 2) respond(x, 200, fixtureText(page))
          else respond(x, 404, "no such page")
        }
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val passwordB64 = java.util.Base64.getEncoder
        .encodeToString("s3cret!".getBytes(UTF_8))
      val fetcher = new graft.sources.HttpPageFetcher(
        s"http://127.0.0.1:$port/auth",
        s"http://127.0.0.1:$port/api/cover", "etl_user", passwordB64)
      PagedJsonSource.registerFetcher("loopback_http", fetcher)
      val viaHttp = spark.read.format("graft.sources.PagedJsonSource")
        .option("fetcher", "loopback_http").load()
        .orderBy("page").collect()
        .map(r => (r.getInt(0), r.getString(1)))
      // the live-HTTP read is byte-identical to the file-backed one
      val viaFiles = spark.read.format("graft.sources.PagedJsonSource")
        .option("path", coverDir).load()
        .orderBy("page").collect()
        .map(r => (r.getInt(0), r.getString(1)))
      assert(viaHttp.toSeq == viaFiles.toSeq)
      // ... and parses to the same cover rows downstream
      val parsed = Form700Source.cover(
        spark.read.json(spark.createDataset(viaHttp.map(_._2).toSeq)(
          org.apache.spark.sql.Encoders.STRING)))
      assert(parsed.count() > 0)
      // S1: auth happened, with the reference's form fields and the
      // base64-DECODED password
      import scala.jdk.CollectionConverters._
      assert(authBodies.asScala.nonEmpty)
      assert(authBodies.asScala.forall(b =>
        b.contains("UserName=etl_user") &&
          b.contains("Password=s3cret%21")))
      // S2: every page request carried the reference params, the JSON
      // content type, and the session cookie
      val reqs = pageReqs.asScala.toSeq
      assert(reqs.nonEmpty)
      assert(reqs.forall(r => r.contains("AgencyPrefix=SF") &&
        r.contains("PageSize=1000") && r.contains("IsRedacted=False") &&
        r.contains("cookie=session=tok123") &&
        r.contains("ct=application/json")))
      // S3: the bound came from page 1's totalMatchingPages (a probe
      // fetch of page 1, then the planned pages 1..2)
      val pagesAsked = reqs.flatMap(r =>
        "CurrentPageIndex=(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toInt))
      assert(pagesAsked.toSet == Set(1, 2))
    } finally server.stop(0)
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
