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

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long, normalized
      // to TimestampType in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(appName: String): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Ckpt.release unpersists superseded localCheckpoint RDDs by
    // design; each emits a WARN ("lineage truncated ... cannot be
    // recomputed") that is the intended outcome, not a problem —
    // silence that one logger so real warnings stay visible.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
