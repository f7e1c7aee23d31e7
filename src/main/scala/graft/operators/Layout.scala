package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-
  * dimensional scan pruning.
  *
  * Why it matters at 100 TB: parquet row-group min/max statistics prune
  * scans only along the SORT dimension — a table sorted by `user_id`
  * answers `user_id = ?` cheaply but scans everything for `ts BETWEEN`.
  * Interleaving the bits of two dimensions into one Morton key and
  * range-partitioning + sorting by it keeps row-group extents tight in
  * BOTH dimensions at once, so predicates on either column (or both)
  * skip most of the file footprint. This is the same layout idea behind
  * Delta/Iceberg `ZORDER BY`, re-expressed with public Spark operators:
  * a codegen'd bit-twiddle expression + `repartitionByRange` +
  * `sortWithinPartitions` — no custom writer needed.
  *
  * The bit spread is the classic magic-number expansion (five
  * shift-or-mask steps per operand, branch-free, fully inside
  * whole-stage codegen — no UDF). Inputs are masked to 31 bits (the
  * z-key is a LAYOUT key, not data: masking only perturbs clustering
  * for out-of-range values, never correctness), so the interleaved
  * result occupies 62 bits and no sign-bit edge exists in any engine's
  * BIGINT.
  */
object Layout {

  /** (shift, mask) steps of the 32→64-bit spread; shared with the
    * DuckDB oracle generator so both engines inline identical
    * constants. */
  val ZSpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 31 bits of `c` so value bit i lands at result bit
    * 2i (even positions). */
  def spreadBits(c: Column): Column =
    ZSpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 62-bit Morton key: bits of `a` on even positions, `b` on odd. */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Cluster rows for two-dimensional scan pruning: range-partition on
    * the Morton key of (`colA`, `colB`), sort within partitions, drop
    * the key. Written out, each file/row-group covers a compact 2-D
    * tile, so parquet min/max stats prune on EITHER column. One shuffle
    * (the range exchange samples the key distribution first). */
  def clusterByZ(df: DataFrame, colA: String, colB: String,
                 partitions: Int): DataFrame =
    df.withColumn("__z", zValue(col(s"`$colA`"), col(s"`$colB`")))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Hive-style partitioned parquet layout — the coarse-grained
    * complement to [[clusterByZ]]'s row-group clustering and the
    * bucketed-table co-location in `Joins.writeBucketed`: one
    * directory per distinct `partCol` value, so a reader's equality /
    * IN predicate on that column is answered by LISTING, not scanning
    * (`PartitionFilters` in the scan node; zero bytes read outside the
    * selected directories). The write pre-shuffles on the partition
    * column so each Hive partition is authored by few tasks — without
    * it, every one of the N input tasks opens a file in every
    * partition directory (N·P small files, the classic 100 TB
    * partitioned-write failure). `partitionOverwriteMode=dynamic` is
    * the production default this models: re-running a day replaces
    * only that day's directory, never truncating the table. */
  def writePartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.repartition(col(s"`$partCol`"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(dir)

  /** Small-file COMPACTION — the table-maintenance pass every
    * long-lived ingest needs: streaming/chunked writers fragment a
    * directory into per-trigger files, and at 100 TB the resulting
    * listing/open overhead (and 1-row row groups) dominates scan cost
    * long before data size does. Rewrites `srcDir` into
    * ⌈bytes/targetBytes⌉ files at `dstDir` — sizing from the ACTUAL
    * on-disk bytes, not a guessed file count — and returns
    * (filesBefore, filesAfter, bytes). File discovery is RECURSIVE, so
    * Hive-partitioned / nested source layouts are sized correctly (the
    * scan itself already reads them). Content is untouched: when the
    * input has at least nOut splits the rewrite is scan → coalesce →
    * write (no shuffle — coalesce only glues input splits together);
    * when the input has FEWER partitions than nOut (coalesce can only
    * merge, never split) it falls back to a round-robin repartition so
    * the requested file count is actually honored. */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
              dstDir: String, targetBytes: Long): (Long, Long, Long) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fs = new org.apache.hadoop.fs.Path(srcDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var nBefore = 0L
    var bytes = 0L
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(srcDir), true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        nBefore += 1; bytes += f.getLen
      }
    }
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    val src = spark.read.parquet(srcDir)
    val sized =
      if (src.rdd.getNumPartitions >= nOut) src.coalesce(nOut.toInt)
      else src.repartition(nOut.toInt)
    sized.write.mode("overwrite").parquet(dstDir)
    var after = 0L
    val outIt = fs.listFiles(new org.apache.hadoop.fs.Path(dstDir), true)
    while (outIt.hasNext) {
      val f = outIt.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) after += 1
    }
    (nBefore, after, bytes)
  }
}
