package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zValue interleaves bits: a on even positions, b on odd") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L),
        (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (5L, 6L))
      .toDF("a", "b")
      .select(Layout.zValue($"a", $"b")).as[Long].collect().toSeq
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    assert(got == Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (5L, 6L)).map((ref _).tupled))
  }

  test("writePartitioned: pruned read lists directories, not data — " +
       "PartitionFilters carry the predicate; few files per partition") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_part_spec").toString
    val df = (1 to 1000).map(i => (i.toLong, s"t${i % 4}", i * 1.5))
      .toDF("id", "kind", "v")
      .repartition(8) // many input tasks: the write must still coalesce
    Layout.writePartitioned(df, out, "kind")

    // one directory per kind; the pre-shuffle keeps files-per-dir low
    // (not 8 per input task)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("kind="))
    assert(dirs.length == 4)
    dirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= 2, s"${d.getName} has $files files — write blew up")
    }

    val read = spark.read.parquet(out).where($"kind" === "t1")
    read.collect()
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
           scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
             .contains("kind"),
      s"kind predicate must be a partition filter:\n$scan")
    // and the values survive the roundtrip
    val got = read.agg(sum($"v"), count(lit(1)))
      .as[(Double, Long)].head()
    val want = df.where($"kind" === "t1").agg(sum($"v"), count(lit(1)))
      .as[(Double, Long)].head()
    assert(got == want)
  }

  test("file-STREAM partition pruning: the micro-batch scan reads only " +
       "the matching partition directory (PartitionFilters + numFiles)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val out = java.nio.file.Files
      .createTempDirectory("graft_part_stream_spec").toString
    val df = (1 to 1000).map(i => (i.toLong, s"t${i % 4}", i * 1.5))
      .toDF("id", "kind", "v")
    Layout.writePartitioned(df, out, "kind")
    def filesIn(d: java.io.File): Int =
      d.listFiles().count(_.getName.endsWith(".parquet"))
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("kind="))
    val matchFiles = dirs.filter(_.getName == "kind=t1").map(filesIn).sum
    val allFiles = dirs.map(filesIn).sum
    assert(matchFiles > 0 && matchFiles < allFiles)

    val src = spark.readStream
      .schema(spark.read.parquet(out).schema)
      .parquet(out)
      .where($"kind" === "t1")
    val q = src.writeStream.format("memory")
      .queryName("layout_stream_prune")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // directory-listing evidence from the LAST micro-batch's physical
    // plan: the kind predicate must sit in PartitionFilters (answered
    // from directory names, pre-IO) and the scan's numFiles metric
    // must equal the matching partition's file count — the other three
    // directories' files were never opened
    val exec = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution
    val scans = exec.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty, "no FileSourceScanExec in the micro-batch plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "kind")),
      s"kind predicate must be a partition filter: ${scan.partitionFilters}")
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles == matchFiles,
      s"scan read $numFiles files, expected only the $matchFiles in " +
        s"kind=t1 (of $allFiles total)")
    // and the streamed rows are exactly the matching partition's rows
    assert(spark.table("layout_stream_prune").count() == 250)
  }

  test("clusterByZ: disjoint partition key ranges, tight 2-D tiles") {
    // A full 64×64 grid into 16 partitions: perfect z-tiles would be
    // 16×16 blocks (extent 15 per dimension) vs the global extent 63.
    val grid = spark.range(4096).selectExpr("id % 64 AS x", "id div 64 AS y")
    val out = Layout.clusterByZ(grid, "x", "y", 16)
    val stats = out
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("z").as("zlo"), max("z").as("zhi"),
        (max("x") - min("x")).as("xext"), (max("y") - min("y")).as("yext"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // Range partitioning on z ⇒ partitions cover disjoint key intervals.
    stats.sliding(2).foreach {
      case Array((_, hi, _, _), (lo, _, _, _)) => assert(hi <= lo)
      case _ =>
    }
    // Every partition's 2-D tile is far tighter than the global 63×63:
    // that tightness is exactly what parquet min/max pruning exploits.
    val (xAvg, yAvg) = (stats.map(_._3).sum / stats.length.toDouble,
      stats.map(_._4).sum / stats.length.toDouble)
    assert(xAvg <= 24 && yAvg <= 24, s"loose tiles: xAvg=$xAvg yAvg=$yAvg")
    assert(stats.forall { case (_, _, xe, ye) => xe <= 48 && ye <= 48 })
  }

  test("compact: 64-way fragmentation collapses to the size-targeted " +
      "file count, content unchanged") {
    import spark.implicits._
    val frag = graft.Scratch.dir("graft_spec_compact_src")
    val out = graft.Scratch.dir("graft_spec_compact_dst")
    val df = spark.range(20000)
      .select($"id", md5($"id".cast("string")).as("payload"))
    df.repartition(64).write.mode("overwrite").parquet(frag)
    // huge target → everything fits one file
    val (before, after, bytes) =
      graft.operators.Layout.compact(spark, frag, out, 1L << 30)
    assert(before == 64L, s"fragmented write should leave 64 files: $before")
    assert(after == 1L, s"one output file expected: $after")
    assert(bytes > 0L)
    val got = spark.read.parquet(out).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == df.orderBy("id").as[(Long, String)].collect().toSeq)
    // a target forcing a split: ceil(bytes / (bytes/3)) ≈ 3-4 files
    val third = math.max(1L, bytes / 3)
    val (_, after2, _) =
      graft.operators.Layout.compact(spark, frag, out, third)
    assert(after2 >= 3L && after2 <= 4L,
      s"size-targeted split expected ~3 files: $after2")
  }
}
