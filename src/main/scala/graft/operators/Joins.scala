package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

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
}
