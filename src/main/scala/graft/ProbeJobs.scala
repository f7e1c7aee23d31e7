package graft

import org.apache.spark.scheduler._

/** One-off diagnostic main (optimization rounds): run ONE registry
  * query end-to-end (noop sink, like Bench) with a listener printing
  * every JOB's wall-clock, stage count, task time, and shuffle rows —
  * the decomposition an iterative kernel needs (its work happens in
  * construction-time jobs, one per round, that a query-level timer
  * cannot attribute). Not part of the driver contract.
  *
  * Usage: runMain graft.ProbeJobs <query> [reps]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("gr_hits")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get("probe-jobs")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var printing = false
    val stageRows = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobStart.put(e.jobId, (System.nanoTime(), desc))
        jobStages.put(e.jobId, e.stageIds)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        stageRows.put(e.stageInfo.stageId,
          (m.shuffleWriteMetrics.recordsWritten,
            m.shuffleReadMetrics.recordsRead, m.executorRunTime))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(e.jobId)).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          if (printing) {
            val stages = jobStages.getOrDefault(e.jobId, Seq.empty)
            val (w, r, rt) = stages.flatMap(s => Option(stageRows.get(s)))
              .foldLeft((0L, 0L, 0L)) { case ((a, b, c), (x, y, z)) =>
                (a + x, b + y, c + z) }
            println(f"JOB ${e.jobId}%4d  ${dt}%8.3f s  stages=${stages.size}%2d " +
              f"taskTime=${rt / 1000.0}%8.1f s  shWrote=$w%10d shRead=$r%10d  $desc")
          }
        }
      }
    })
    val fn = SparkEntry.queries(name)
    // Whole-stage-codegen compile accounting per rep: a warm rep that
    // still runs janino compiles is paying per-round plan-shape or
    // literal churn (the generated-source cache misses). Count +
    // cumulative ms come from Spark's own CodegenMetrics histograms.
    val cgT = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    // compile_ms is the delta of sums over the histogram's SAMPLING
    // reservoir: once getCount passes the reservoir size (1028) values
    // drop out of the snapshot and the delta can be understated or even
    // negative. codegen_compiles (a counter delta) is always exact and
    // is the primary signal; compile_ms is labeled invalid past the
    // reservoir instead of printing a misleading number (r21 advisory).
    def cgTotalMs: Long = {
      val s = cgT.getSnapshot
      s.getValues.sum // reservoir values; exact while count <= 1028
    }
    for (rep <- 1 to reps) {
      printing = rep == reps // print only the last (warm) rep
      if (printing) println(s"=== $name rep $rep (of $reps) ===")
      val (c0, m0) = (cgT.getCount, cgTotalMs)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // let async job-end events drain before the total line
      Thread.sleep(300)
      val msNote =
        if (cgT.getCount > 1028) "compile_ms=n/a(reservoir overflow)"
        else f"compile_ms~${cgTotalMs - m0}"
      println(f"REP $rep total ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  codegen_compiles=${cgT.getCount - c0}" +
        f" $msNote")
    }
    spark.stop()
  }
}
