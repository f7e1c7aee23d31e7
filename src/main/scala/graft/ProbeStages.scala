package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** One-off diagnostic main (round 19): per-stage shuffle-write rows for
  * a single registry query, to locate which exchange re-executes at
  * high partition counts. Not part of the driver contract. */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("probe-stages")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val name = args.headOption.getOrElse("gr_pagerank")
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val w = si.taskMetrics.shuffleWriteMetrics.recordsWritten
        val r = si.taskMetrics.shuffleReadMetrics.recordsRead
        val rt = si.taskMetrics.executorRunTime / 1000.0
        if (w > 0 || r > 0 || rt >= 0.05)
          println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"runTime=$rt%7.2f s wrote=$w%12d read=$r%12d  " +
            si.name.takeWhile(_ != '\n').take(70))
      }
    }
    spark.sparkContext.addSparkListener(l)
    val n = SparkEntry.queries(name)(spark, dir).count()
    println(s"RESULT rows=$n")
    spark.stop()
  }
}
