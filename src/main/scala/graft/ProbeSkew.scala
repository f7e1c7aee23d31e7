package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.{Events, Joins}

/** One-off diagnostic main (round 19): per-task shuffle-read
  * distribution for the hot-key operators at sf10 MAGNITUDE, plain vs
  * 2-level — the scale measurement behind PlanQualitySpec's
  * fixture-size skew-evidence tests (same 80%-hot shape, 1000×
  * the rows). AQE stays ON (the production setting): the point is
  * that AQE's skew-join split cannot rescue a WINDOW exchange — the
  * partition key itself must bound the task — while the 2-level
  * rewrite bounds it by construction. Prints max/p99/ideal task
  * shuffle-read records per (operator, form). Not part of the driver
  * contract. */
object ProbeSkew {
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
      // diagnostic-grade bus settle (the test tree's ListenerBridge is
      // not on the main classpath; a short quiesce loop is enough here)
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
    val spark = Sessions.get("probe-skew")
    import spark.implicits._
    val total = args.headOption.map(_.toLong).getOrElse(40000000L)
    val hotRows = total * 8 / 10
    val baseUs = 1704067200L * 1000000L
    // Hot user 1: 80% of all events, 96 s apart (≈900/day, years of
    // span); cold users 2..5001 share the rest.
    val events = spark.range(total).select(
      $"id".as("event_id"),
      when($"id" < hotRows, 1L)
        .otherwise(lit(2L) + pmod($"id", lit(5000L))).as("user_id"),
      timestamp_micros(
        when($"id" < hotRows, lit(baseUs) + $"id" * 96L * 1000000L)
          .otherwise(lit(baseUs) + $"id" * 17L * 1000000L)).as("ts"))
      .persist()
    println(s"EVENTS ${events.count()} hot=$hotRows")

    def run(label: String)(a: => Unit): Unit = {
      val t0 = System.nanoTime()
      val (mx, p99, mean, n) = taskDist(spark)(a)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DIST $label%-22s max=$mx%11d p99=$p99%11d " +
        f"mean=$mean%10d tasks=$n%5d sec=$sec%7.1f")
    }
    run("sessionize_plain") {
      Events.sessionize(events.toDF(), 1800L)
        .agg(sum($"n_events")).collect(); ()
    }
    run("sessionize_2level") {
      Events.sessionize2Level(events.toDF(), 1800L)
        .agg(sum($"n_events")).collect(); ()
    }

    // As-of join, same hot shape: 80% of probes on key 1; right side
    // 20 keys x 20k ticks.
    val left = events.select($"user_id".as("key"),
      unix_micros($"ts").as("t"), $"event_id".as("probe_id"))
    val right = spark.range(20L * 20000L).select(
      ($"id" % 20L + 1L).as("key"),
      (($"id" / 20L) * 250L + $"id" % 20L).as("t"), $"id".as("v"))
      .persist()
    right.count()
    run("asof_plain") {
      Joins.asofJoin(left, right, "key", "t", Seq("v"))
        .agg(sum($"v")).collect(); ()
    }
    run("asof_2level") {
      Joins.asofJoin2Level(left, right, "key", "t", Seq("v"),
        bucketWidth = 86400L * 1000000L)
        .agg(sum($"v")).collect(); ()
    }
    spark.stop()
  }
}
