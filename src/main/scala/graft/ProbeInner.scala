package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-off diagnostic main (optimization rounds): reconstruct the
  * per-round inner plan of the iterative graph kernels against a
  * checkpointed node vector and print explain("formatted") — the
  * inner-round evidence PlanDump cannot capture (the registry query
  * returns only the final small join over checkpointed RDDs). Not part
  * of the driver contract. */
object ProbeInner {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get("probe-inner")
    val li = Tables.load(spark, sfDir, "lineitem")
    val edges = graft.operators.Graph.coOrderedParts(li, distinct = false)
    val eS = edges.repartition(col("src")).distinct().persist()
    val nodes = eS.select(col("src").as("node")).distinct().persist()
    val n = nodes.count()
    println(s"nodes=$n edges=${eS.count()}")
    val hubs = nodes.select(col("node"), lit(1000000L).as("hub_q"))
      .localCheckpoint(true)
    // the HITS auth gather, exactly as hitsQ builds it
    val raw = eS.join(hubs.withColumnRenamed("node", "src"), Seq("src"))
      .groupBy(col("dst"))
      .agg(sum(col("hub_q").cast(DecimalType(38, 0))).as("raw"))
    println("=== gather plan (auth half-round) ===")
    println(raw.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    // the full normalized plan incl. the broadcast tot subquery
    val tot = raw.agg(sum(col("raw")).as("tot"))
    val norm = nodes.join(raw.withColumnRenamed("dst", "node"),
        Seq("node"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("node"),
        expr(s"CAST(coalesce(raw, 0) AS DECIMAL(38,0)) * 1000000000000 div tot")
          .as("auth_q"))
    println("=== normalized plan (with tot broadcast) ===")
    println(norm.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
