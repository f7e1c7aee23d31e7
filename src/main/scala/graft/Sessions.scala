package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction so Verify / Bench / tests agree on config.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting),
  * shuffle partitions sized to the executor core count (never the 200
  * default), UTC everywhere for oracle parity.
  */
object Sessions {
  def cpus: String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)

  /** Shuffle partition count, overridable INDEPENDENTLY of the core
    * count (SPARK_GRAFT_SHUFFLE_PARTITIONS): on a real cluster
    * partitions scale with input while cores-per-executor stay fixed —
    * the partition-scaling measurements (BASELINE.md round 18) hold
    * local[cpus] constant and vary only this. */
  def shufflePartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)

  /** Extra session confs for measurement runs, as
    * `SPARK_GRAFT_EXTRA_CONF="k=v;k=v"` — e.g. pinning
    * `spark.sql.autoBroadcastJoinThreshold=-1` so shuffle-row records
    * at different scales compare at MATCHED join plans (a broadcast→
    * shuffle transition between decades otherwise shifts the rows
    * measure mid-series; BASELINE.md round 19). Empty by default —
    * Verify/tests/driver runs never set it. */
  def extraConf: Seq[(String, String)] =
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2); (k.trim, v.trim)
      }

  def builder(appName: String): SparkSession.Builder = {
    val base = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Cost-based optimization ON — the 100 TB posture. Inert for the
      // registry's path-based scans (no catalog stats exist for them;
      // plans unchanged), active for ANALYZEd catalog tables
      // (RegistryCbo): stats-driven join reorder + broadcast selection.
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      // The app status store runs EVEN WITH THE UI OFF and retains, by
      // default, the last 1000 SQL executions (full plan graphs +
      // SQLPlanMetric rows + plan strings) and 100k task wrappers in
      // driver heap. A long-lived session executing hundreds of
      // registry queries accumulates this into the hundreds of MB at
      // small scale (jmap: 350k SQLPlanMetric live mid-Verify) and into
      // a driver OOM on the 251-query sf1 schedule at the default 8 GiB
      // heap (round 19). Nothing reads the store here (UI off, no
      // history server), so retain just enough for post-hoc debugging
      // of the LAST few executions. The 100 TB posture: a production
      // driver running a query-per-minute for a month holds 43k
      // executions' worth of plan metadata unless this is bounded.
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "2000")
      // events.parquet carries TIMESTAMP(NANOS); read as long, normalized
      // to TimestampType in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Generated-code cache sized for a MANY-QUERY session (static
      // conf, default 100 entries): the registry's 256 queries emit a
      // few thousand distinct codegen units, so at the default size a
      // query's units are evicted between its own interleaved bench
      // reps and every rep re-compiles — ev_asof_nearest_2level
      // measured 39-48 janino compiles (~0.7-1.0 s) on WARM reps,
      // 0 compiles / −14% wall with the cache raised (r22). The same
      // holds for any long-lived production driver running a query mix;
      // ~5000 compiled classes are tens of MB of driver heap, noise
      // next to the 8 GiB default.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    // extraConf LAST so a measurement run can override ANY default
    // above (a later .config wins for the same key) — e.g. restoring
    // spark.sql.ui.retainedExecutions=1000 to measure what the
    // status-store bound saves (BASELINE.md round 20), or pinning the
    // broadcast threshold for matched-plan records (round 19).
    extraConf.foldLeft(base)((b, kv) => b.config(kv._1, kv._2))
  }

  /** Ckpt.release unpersists superseded localCheckpoint RDDs by
    * design; each emits a WARN ("...lineage has been truncated and
    * cannot be recomputed after unpersisting") that is the intended
    * outcome, not a problem. Deny exactly that message — a level
    * override on the RDD logger would also swallow legitimate
    * cache-loss / recompute warnings from the same class. */
  private object LineageTruncationFilter
      extends org.apache.logging.log4j.core.filter.AbstractFilter {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.Marker
    import org.apache.logging.log4j.core.Filter.Result
    import org.apache.logging.log4j.core.{LogEvent, Logger => CoreLogger}
    import org.apache.logging.log4j.message.Message

    private def decide(loggerName: String, msg: String): Result =
      if (loggerName != null && msg != null &&
          loggerName.startsWith("org.apache.spark.rdd.") &&
          msg.contains("cannot be recomputed after unpersisting"))
        Result.DENY
      else Result.NEUTRAL

    // A context-wide filter is consulted BOTH pre-event-construction
    // (the Logger/... overloads) and with the built LogEvent — cover
    // every message-bearing path.
    override def filter(e: LogEvent): Result =
      decide(e.getLoggerName, e.getMessage.getFormattedMessage)
    override def filter(l: CoreLogger, lv: Level, m: Marker,
                        msg: String, params: AnyRef*): Result =
      decide(l.getName, msg)
    override def filter(l: CoreLogger, lv: Level, m: Marker,
                        msg: Any, t: Throwable): Result =
      decide(l.getName, String.valueOf(msg))
    override def filter(l: CoreLogger, lv: Level, m: Marker,
                        msg: Message, t: Throwable): Result =
      decide(l.getName,
        if (msg == null) null else msg.getFormattedMessage)
  }

  private val filterInstalled =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  def get(appName: String): SparkSession = {
    // Memory-backed ImageIO streams, set HERE — the single
    // deterministic early init point every entry path (Verify, Bench,
    // tests, driver) passes through — so the JVM-wide flag does not
    // depend on which imageio codec class happens to load first, and
    // any ImageIO use that precedes codec class-load already runs
    // cache-free. The codecs ALSO set it at class init: on a real
    // cluster decode tasks run in executor JVMs where this driver-side
    // bootstrap never executes, so the class-load site is the
    // executor-side guarantee and this is the driver-side one.
    javax.imageio.ImageIO.setUseCache(false)
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    if (filterInstalled.compareAndSet(false, true)) {
      LineageTruncationFilter.start()
      ctx.getConfiguration.addFilter(LineageTruncationFilter)
      ctx.updateLoggers()
    }
    CodegenHealth.install()
    s
  }
}
