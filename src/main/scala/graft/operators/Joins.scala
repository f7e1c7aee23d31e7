package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Join kernel.
  *
  * The reference's only semantic join (J1) denormalizes a small projection
  * of the cover table onto every schedule table with a left-outer
  * equi-join on `filingId` (reference: Form700.py:346-352). The cover side
  * is always small relative to the schedules, so at cluster scale the
  * right plan is a broadcast-hash join — no shuffle of the big side.
  */
object Joins {

  /** J1 (Form700.py:346-352): left-outer equi-join of a fact table with a
    * small, explicitly broadcast dimension projection.
    *
    * @param fact      the big side (schedule analog); never shuffled
    * @param dim       the small side (cover projection analog)
    * @param key       equi-join key present on both sides
    * @param dimCols   columns to carry over from the dim (key included)
    */
  def filerToSchedule(fact: DataFrame, dim: DataFrame, key: String,
                      dimCols: Seq[String]): DataFrame = {
    val proj = dim.select(dimCols.head, dimCols.tail: _*)
    fact.join(broadcast(proj), Seq(key), "left_outer")
  }

  /** Skew-busting salted inner equi-join for when the dim is too big to
    * broadcast AND the fact key is skewed: the fact side gets a
    * DETERMINISTIC salt (hash of all fact columns mod `salts` — never
    * `rand()`, which breaks retry/replay), the dim side is replicated
    * `salts` ways, and the join key becomes (key, salt). A hot fact key
    * now spreads over `salts` reducers instead of one.
    *
    * AQE's skew-join split handles most cases at runtime; explicit
    * salting remains the tool when a single key exceeds what one task
    * can hold even after splitting, or when AQE is unavailable
    * (streaming joins). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val factSalted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(c => col(s"`$c`")): _*), lit(salts))
        .cast(IntegerType))
    val dimSalted = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast(IntegerType))
    factSalted.join(dimSalted, Seq(key, "__salt")).drop("__salt")
  }

  /** Persist a table BUCKETED (and sorted) by its join key — the
    * co-location tool for big-to-big equi-joins that recur on the same
    * key: two tables bucketed the same way join with NO exchange on
    * either side (each task reads matching bucket files), which at
    * 100 TB removes the single largest cost of a repeated fact-fact
    * join. Bucketing goes through the session catalog (`saveAsTable` —
    * bucket metadata lives in the table definition, not the files), so
    * this is the ingest-side twin of [[saltedJoin]]'s read-side skew
    * fix: pay one clustered write, then every later join is
    * shuffle-free. A `PlanQualitySpec` test proves the join plan has no
    * Exchange and one SortMergeJoin over bucketed scans. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
