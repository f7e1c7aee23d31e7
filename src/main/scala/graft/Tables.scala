package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet fixtures (see TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives a scale-factor directory and
  * reads only through here, so scan options stay in one place. Parquet +
  * column pruning + predicate pushdown means each query reads only the
  * row groups / columns it names — the property that matters at 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` normalization to one canonical microsecond
    * TimestampType, whatever the fixture generation encoded:
    *  - TIMESTAMP(NANOS) parquet arrives as a raw nanosecond LONG
    *    (spark.sql.legacy.parquet.nanosAsLong) → integral `div 1000`
    *    then `timestamp_micros` (a double division would lose precision
    *    at 1e18 ns);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    *    TIMESTAMP_NTZ → cast to TimestampType, value-preserving because
    *    the session time zone is pinned to UTC (Sessions.builder) — the
    *    same naive micros DuckDB reads, so oracle parity holds;
    *  - TimestampType passes through. */
  private def canonTs(name: String, dt: DataType): Option[Column] = dt match {
    // `div` (integral) has no Column-API spelling, so the LongType
    // branch is built from the column NAME — taking a Column and
    // ignoring it was a reuse trap (the old lambda hardcoded `ts`).
    case LongType => Some(expr(s"timestamp_micros(`$name` div 1000)"))
    case TimestampNTZType => Some(col(name).cast(TimestampType))
    case _ => None
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      canonTs("ts", df.schema("ts").dataType)
        .map(c => df.withColumn("ts", c)).getOrElse(df)
    else df
  }

  /** Streaming read of the same fixture (file source needs an explicit
    * schema — taken from a batch scan of the footer, no data read), with
    * the identical `ts` normalization so stream and batch plans see one
    * canonical type. */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // The fixture is a bare parquet FILE; a glob path (brace alternative)
    // makes the file source treat the parent dir as basePath — a literal
    // file path fails with "'basePath' must be a directory".
    val df = spark.readStream.schema(raw.schema)
      .parquet(s"$dir/{$name}.parquet")
    if (name == "events")
      canonTs("ts", raw.schema("ts").dataType)
        .map(c => df.withColumn("ts", c)).getOrElse(df)
    else df
  }
}
