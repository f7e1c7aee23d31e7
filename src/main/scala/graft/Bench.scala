package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Each query runs `SPARK_GRAFT_BENCH_REPS` times
  * (default 3) and reports the MEDIAN — a single-run bench swings 3-5×
  * per query under host contention (observed r1→r2), which no 2×
  * acceptance bar can survive. Failures are never silently timed: a
  * query that fails every rep is OMITTED from `queries` and enumerated
  * in the `errors` map instead.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = Sessions.get("graft-bench")
    // Warmup: absorb JVM/codegen/scan-setup cost so per-query numbers
    // reflect steady state rather than first-query initialization.
    try Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Optional args = query-name filter, for timing one query while
    // iterating. The driver passes no args → full suite.
    val selected = if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink: materializes EVERY output column. A count() here
        // would let Catalyst prune projections entirely and time only
        // the scan for map-only queries.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
            None
        }
      }
      // None marks a query that failed every rep; it is reported ONLY in
      // `errors`, never in `queries` — no sentinel can leak into a
      // consumer that sums or compares per-query times.
      name -> (if (times.isEmpty) None else Some(median(times)))
    }
    val qs = results.collect { case (k, Some(v)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val ok = results.values.flatten
    val total = if (ok.nonEmpty) ok.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
