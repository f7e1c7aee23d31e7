package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Checkpoint discipline for iterative fixed-point loops (PageRank,
  * HITS, label propagation, connected components, k-core, BPE
  * training, MMR selection).
  *
  * Per-round `localCheckpoint(true)` keeps the LOGICAL plan flat —
  * every round plans against a materialized LogicalRDD instead of the
  * whole nested iteration history — but each checkpoint also REGISTERS
  * a persisted RDD that outlives the loop: without an explicit
  * release, every invocation (each bench rep, each pipeline stage)
  * strands `iters` node- or edge-sized cache entries until the driver
  * GCs the DataFrames. [[replace]] pairs the two halves of the
  * contract: eagerly checkpoint the new round, then unpersist the
  * rounds it supersedes — safe exactly because the new checkpoint is
  * already materialized, so the superseded RDDs are dead lineage.
  *
  * The one intentional survivor is the RETURNED result of an operator
  * (callers consume it lazily); a call therefore retains at most one
  * checkpoint RDD, which PlanQualitySpec's leak guard allows.
  */
object Ckpt {

  /** Eagerly localCheckpoint `next`, then release every `prevs`
    * checkpoint. `prevs` entries that are not checkpointed DataFrames
    * (e.g. a loop's round-0 initializer) are ignored, so loop code can
    * pass the previous round unconditionally. */
  def replace(next: DataFrame, prevs: DataFrame*): DataFrame = {
    val out = next.localCheckpoint(true)
    prevs.foreach(release)
    out
  }

  /** Unpersist the RDD behind an eagerly-checkpointed DataFrame; no-op
    * for any other plan shape. Non-blocking: the executor-side drop
    * overlaps the next round's compute. */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false); ()
    case _ => ()
  }
}
