package graft

import java.nio.file.{Files, Paths}

/** One-off diagnostic main (optimization rounds): dump
  * `explain("formatted")` for named registry queries to files —
  * the plan evidence `plans/rNN/<query>_<tag>.txt` the optimization
  * deliverables require. Not part of the driver contract.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <query>[,<query>...]
  *
  * Note: queries that drive their own jobs during CONSTRUCTION
  * (iterative graph kernels, trainers) return a final small plan over
  * checkpointed RDDs; for those the per-round evidence is ProbeJobs'
  * job timeline, and this dump still records the final-plan shape the
  * driver sees.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get("graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
