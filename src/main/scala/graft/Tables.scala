package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS), which Spark only reads as a raw
    // nanosecond long (spark.sql.legacy.parquet.nanosAsLong — set by
    // Sessions.tune). Normalize to a microsecond TimestampType here so
    // every consumer sees one canonical type. `div` keeps the arithmetic
    // integral (a double division would lose precision at 1e18 ns).
    if (name == "events" && df.schema("ts").dataType != org.apache.spark.sql.types.TimestampType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
    if (name == "events" && raw.schema("ts").dataType != org.apache.spark.sql.types.TimestampType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
