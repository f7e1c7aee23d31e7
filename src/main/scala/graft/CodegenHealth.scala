package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Codegen-health gate: counts Spark codegen compile failures as they
  * are logged, so Verify can emit `codegen_errors: N` per run and a
  * broken generated-Java expression can never again ship silently in
  * interpreted-fallback mode (the `MinhashSigExpr` nullability bug ran
  * ~10 rounds that way — every containing stage quietly lost
  * whole-stage codegen while results stayed correct).
  *
  * Mechanism: a context-wide log4j2 filter (same install path as
  * [[Sessions]]' lineage filter) that never filters anything
  * (`NEUTRAL` always) but counts events whose message carries one of
  * Spark's codegen-failure signatures:
  *
  *  - `"failed to compile"` — `CodeGenerator.doCompile`'s error log on
  *    a janino `CompileException`;
  *  - `"codegen error and falling back to interpreter"` —
  *    `CodeGeneratorWithInterpretedFallback`'s warn for expression-level
  *    fallback (projections/predicates).
  *
  * `WholeStageCodegenExec`'s "Whole-stage codegen disabled for plan" is
  * counted in a separate [[sizeFallbacks]] bucket: Spark also logs it
  * for legitimate size-based fallbacks (hugeMethodLimit /
  * maxLinesPerFunction), where interpretation is intended behavior —
  * only true compile failures gate strict mode.
  *
  * Counting at the log seam (not by patching Spark) keeps this purely
  * observational: zero behavior change, works for every code path that
  * compiles generated Java.
  */
object CodegenHealth {
  private val errorCount = new AtomicLong(0)
  private val sizeFallbackCount = new AtomicLong(0)
  private val lastMessage = new AtomicReference[String]("")

  // matched case-insensitively — Spark 4.1 says "Failed to compile the
  // generated Java code.", older releases "failed to compile: ...".
  // TRUE compile failures only: these gate strict mode.
  private val signatures = Seq(
    "failed to compile",
    "codegen error and falling back to interpreter")

  // Counted in a SEPARATE bucket: WholeStageCodegenExec also logs this
  // for LEGITIMATE size-based fallbacks (generated code exceeding
  // spark.sql.codegen.hugeMethodLimit / maxLinesPerFunction), where the
  // plan is healthy and interpretation is the intended behavior — a
  // large-but-correct plan must not trip the strict gate or flag a
  // bench non-regression.
  private val sizeSignatures = Seq(
    "whole-stage codegen disabled for plan")

  private[graft] def observe(rawMsg: String): Unit = {
    val msg = if (rawMsg == null) null
              else rawMsg.toLowerCase(java.util.Locale.ROOT)
    if (msg != null) {
      if (signatures.exists(msg.contains)) {
        errorCount.incrementAndGet()
        lastMessage.set(rawMsg.take(500))
      } else if (sizeSignatures.exists(msg.contains)) {
        sizeFallbackCount.incrementAndGet()
      }
    }
  }

  /** TRUE codegen compile failures observed since JVM start (or last
    * [[reset]]) — the strict-gate signal. */
  def count: Long = errorCount.get()

  /** Size-based whole-stage disables (huge-method fallback) — healthy
    * plans that merely exceeded codegen limits; reported separately,
    * never gated on. */
  def sizeFallbacks: Long = sizeFallbackCount.get()

  /** Truncated text of the most recent failure, for diagnostics. */
  def last: String = lastMessage.get()

  /** Test hook: zero the counters so a spec can isolate its own window. */
  def reset(): Unit = {
    errorCount.set(0); sizeFallbackCount.set(0); lastMessage.set("")
  }

  /** The counting filter. NEUTRAL on every path — observation only. */
  private object CountingFilter
      extends org.apache.logging.log4j.core.filter.AbstractFilter {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.Marker
    import org.apache.logging.log4j.core.Filter.Result
    import org.apache.logging.log4j.core.{LogEvent, Logger => CoreLogger}
    import org.apache.logging.log4j.message.Message

    private def see(msg: String): Result = { observe(msg); Result.NEUTRAL }

    override def filter(e: LogEvent): Result =
      see(if (e.getMessage == null) null
          else e.getMessage.getFormattedMessage)
    override def filter(l: CoreLogger, lv: Level, m: Marker,
                        msg: String, params: AnyRef*): Result = see(msg)
    override def filter(l: CoreLogger, lv: Level, m: Marker,
                        msg: Any, t: Throwable): Result =
      see(String.valueOf(msg))
    override def filter(l: CoreLogger, lv: Level, m: Marker,
                        msg: Message, t: Throwable): Result =
      see(if (msg == null) null else msg.getFormattedMessage)
  }

  /** Idempotently attach the counting filter context-wide. Called from
    * [[Sessions.get]] so every Verify/Bench/test session is covered.
    *
    * Idempotence is PER-CONFIGURATION, not per-JVM: Spark's first
    * `Logging` init REPLACES the log4j2 configuration (it loads
    * `log4j2-defaults.properties`), dropping any filter added to the
    * previous configuration — so install() must be safe to call again
    * after SparkSession construction and must detect whether the
    * CURRENT configuration still carries the filter. */
  def install(): Unit = synchronized {
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val conf = ctx.getConfiguration
    val present = conf.getFilter match {
      case CountingFilter => true
      case c: org.apache.logging.log4j.core.filter.CompositeFilter =>
        c.getFiltersArray.contains(CountingFilter)
      case _ => false
    }
    if (!present) {
      if (!CountingFilter.isStarted) CountingFilter.start()
      conf.addFilter(CountingFilter)
      ctx.updateLoggers()
    }
  }
}
