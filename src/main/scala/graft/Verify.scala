package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg (dev only; the driver passes two): run only
    // queries whose name starts with one of the comma-separated
    // prefixes. Empty elements are dropped (",q1" must not match
    // everything); a filter arg with NO usable prefix is an error, not
    // a silent empty run.
    val rawFilter = args.lift(2)
    val prefixes = rawFilter
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq(""))
    require(prefixes.nonEmpty,
      s"prefix filter '${rawFilter.getOrElse("")}' selects nothing")
    def matches(n: String) = prefixes.exists(n.startsWith)
    val spark = Sessions.get("graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => matches(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(q => matches(q._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Codegen-health gate: a compile failure in generated Java is a
    // silent perf regression (Spark falls back to interpreted mode and
    // results stay correct — the MinhashSigExpr bug shipped ~10 rounds
    // that way). CodegenHealth counts the failure log signatures
    // session-wide; any nonzero count here is a red flag even when
    // every oracle matches.
    val cg = CodegenHealth.count
    val szf = CodegenHealth.sizeFallbacks
    println(s"[verify] codegen_errors: $cg (size_fallbacks: $szf)" +
      (if (cg > 0) s" (last: ${CodegenHealth.last})" else ""))
    Files.writeString(Paths.get(s"$outDir/codegen_health.json"),
      s"""{"codegen_errors": $cg, "size_fallbacks": $szf, "last": ${q(CodegenHealth.last)}}""")
    spark.stop()
    // Strict mode (dev gate): nonzero exit on any codegen failure. Kept
    // opt-in so a hypothetical false-positive signature match can never
    // invalidate a driver correctness run whose artifacts are all good
    // — the count + artifact above are always emitted either way.
    if (cg > 0 && sys.env.contains("GRAFT_CODEGEN_STRICT")) sys.exit(2)
  }
}
