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

/** Bounded NON-BLOCKING read of an [[org.apache.spark.sql.Observation]]
  * — the shared helper behind the iterative kernels' ride-along
  * convergence/argmax metrics (hitsQ, connectedComponents,
  * kMeansInitFarthest). The metric normally lands with the
  * checkpoint/action job that has already completed, so the first poll
  * usually hits; polling `getOrEmpty` instead of parking a thread in
  * the blocking `get` means a timeout leaks nothing (the earlier
  * `Await(Future(obs.get))` form left one global-pool thread blocked
  * forever per timed-out read — obs.get has no deadline), and ANY
  * failure, not just TimeoutException, yields None so every caller
  * falls back to its exact aggregate. */
object Obs {
  def poll(obs: org.apache.spark.sql.Observation,
           timeoutMs: Long = 10000L): Option[Map[String, Any]] =
    try {
      // Await on the observation's own future: a bounded wait on the
      // CALLING thread (throws on deadline — nothing leaks), unlike
      // wrapping the blocking `get` in a pool Future, which cannot be
      // cancelled and parks its thread forever on timeout.
      val row = scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(timeoutMs,
          java.util.concurrent.TimeUnit.MILLISECONDS))
      Some(row.schema.fieldNames.zip(row.toSeq).toMap)
    } catch { case scala.util.control.NonFatal(_) => None }
}
