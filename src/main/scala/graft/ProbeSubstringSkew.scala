package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType}

/** One-off diagnostic main (round 22) — the NEGATIVE-RESULT evidence
  * behind keeping [[graft.operators.Dedup]]'s single-pass window count:
  * per-task shuffle-read distribution and wall time of the
  * substring-dedup duplicate decision on a BOILERPLATE-HEAVY fixture
  * (every document opens with the same `hotTokens`-token license
  * header, so each header window digest occurs once per document
  * corpus-wide — the workload the operator family exists for, and the
  * skew shape the round-21 verdict flagged). Compares the SHIPPED form
  * (whole-partition window count; the hot digest's task buffers its
  * partition) against the skew-bounded count-then-join-over-reused-
  * exchange rewrite that was built for round 22 and REJECTED on these
  * measurements: flat at sf0.1, 1.9× slower at a 62M-row fixture —
  * a hash aggregate over nearly-unique 16-byte digests loses to the
  * sort the window performs anyway (a salted (g, salt) two-level
  * variant measured 2-3.4× slower again). Not part of the driver
  * contract.
  *
  * Usage: runMain graft.ProbeSubstringSkew [numDocs] [hotTokens]
  */
object ProbeSubstringSkew {
  private def taskDist(spark: org.apache.spark.sql.SparkSession)
                      (action: => Unit): (Long, Long, Long, Int) = {
    val perTask = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          perTask.add(m.shuffleReadMetrics.recordsRead)
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(l)
    try {
      action
      var last = -1
      var same = 0
      while (same < 6) {
        Thread.sleep(250)
        val n = perTask.size()
        if (n == last) same += 1 else { same = 0; last = n }
      }
    } finally sc.removeSparkListener(l)
    val a = perTask.toArray(Array.empty[java.lang.Long]).map(_.longValue)
      .sorted
    if (a.isEmpty) (0L, 0L, 0L, 0)
    else (a.last, a((a.length * 99) / 100 min (a.length - 1)),
      a.sum / a.length, a.length)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("probe-substring-skew")
    import spark.implicits._
    val numDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val hotTokens = args.lift(1).map(_.toInt).getOrElse(40)
    val w = 4
    // Every doc: the SAME hotTokens-token header + 24 unique tokens.
    val docs = spark.range(numDocs.toLong).select(
      $"id".as("doc_id"),
      concat_ws(" ",
        (Seq(concat_ws(" ", (0 until hotTokens)
          .map(i => lit(s"lic$i")): _*)) ++
          (0 until 24).map(i =>
            concat(lit(s"u${i}_"), $"id".cast("string")))): _*)
        .as("text")).persist()
    println(s"DOCS ${docs.count()} hotTokens=$hotTokens w=$w")

    // same digest construction as Dedup.windowDigests
    def positions(df: DataFrame): DataFrame = {
      val toks = df.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("wtk"))
      val grams = transform(sequence(lit(1), size(col("wtk")) - (w - 1)),
        i => unhex(md5(array_join(slice(col("wtk"), i, lit(w)), " "))))
      val guarded = when(size(col("wtk")) >= w, grams)
        .otherwise(array().cast(ArrayType(BinaryType)))
      toks.select(col("doc_id"), posexplode(guarded).as(Seq("p0", "g")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("g"))
    }

    // per-job wall/taskTime/shuffle rows (the ProbeJobs convention), so
    // a fixture slowdown is attributable to a stage, not guessed at
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, System.nanoTime())
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStart.get(e.jobId)).foreach { t0 =>
          println(f"JOB ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        }
    })
    def run(label: String)(a: => Unit): Unit = {
      val t0 = System.nanoTime()
      val (mx, p99, mean, n) = taskDist(spark)(a)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DIST $label%-22s max=$mx%11d p99=$p99%11d " +
        f"mean=$mean%10d tasks=$n%5d sec=$sec%7.1f")
    }

    // r21 shape: whole-partition window count over the digest key
    run("window_per_digest") {
      positions(docs).withColumn("cnt",
          count(lit(1)).over(Window.partitionBy("g")))
        .where(col("cnt") > 1)
        .agg(sum(col("pos")), count(lit(1))).collect(); ()
    }
    // r22 shape: in-place complete-mode count over the repartitioned
    // rows, cnt>1-gated inner join back over the SAME exchange
    run("count_join_reuse") {
      val base = positions(docs)
        .where(col("g").isNotNull)
        .repartition(col("g"))
      val counts = base.groupBy("g")
        .agg(count(lit(1)).as("cnt"),
          min(xxhash64(col("doc_id"), col("pos"))).as("first"))
        .where(col("cnt") > 1 && col("first").isNotNull)
      // consume BOTH row columns like the registry queries do — a
      // pos-only aggregate would prune doc_id from the probe branch
      // and break the exchange parity this form relies on
      base.join(counts.hint("SHUFFLE_HASH"), Seq("g"))
        .agg(sum(col("pos")), sum(col("doc_id")), count(lit(1)))
        .collect(); ()
    }
    spark.stop()
  }
}
