package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** LARGE-k nearest-centroid assignment — the scale path past the
  * literal-codebook projection (`Similarity.assignLit`), which inlines
  * one struct per centroid into the plan and therefore caps k at
  * codegen/constant-pool limits (Janino's 64 KB method ceiling lands
  * around k·dim ≈ a few 10⁵ plan literals — fine for codebook-sized k,
  * fatal for SemDeDup's "k is millions" design point).
  *
  * Here the codebook is a FIELD of the expression, not plan literals:
  * the expression registers ITSELF as the whole-stage-codegen reference
  * object ([[BloomMightContainExpr]]'s pattern), so the generated code
  * is one virtual call per row regardless of k, and the codebook rides
  * the task binary — which Spark ships via its internal broadcast, one
  * copy per executor, the same transport an explicit broadcast variable
  * uses. k is bounded by executor memory and argmin compute
  * (k·dim multiplies per row), not by plan size; past THAT ceiling the
  * answer is coarse-then-fine assignment (IVF over the codebook), not a
  * bigger linear scan.
  *
  * Semantics are EXACTLY [[graft.operators.Similarity]]'s `assignLit`:
  * exact BIGINT argmin of (‖c‖² − 2·q·c, cid) — lexicographic, tie →
  * smaller cid — over the same quantized vectors, so the two paths are
  * interchangeable (pinned by the SimilaritySpec parity test) and share
  * one DuckDB oracle formulation.
  */
object NearestCentroid {

  /** Column-API entry: `nearest($"q", codebook)` with the codebook as
    * driver-side `(cid, centroid)` pairs (any size). */
  def nearest(c: Column, cents: Seq[(Long, Seq[Long])]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NearestCentroidExpr(Bridge.expression(c),
      cents.map(_._1).toArray, cents.map(_._2.toArray).toArray))
  }
}

/** Native argmin probe: the L2-nearest centroid id for the child
  * `array<bigint>` quantized vector. `cids`/`cents` are parallel arrays
  * (codebook order is irrelevant — the tie-break is explicit). */
case class NearestCentroidExpr(child: Expression, cids: Array[Long],
                               cents: Array[Array[Long]])
    extends UnaryExpression {

  require(cids.length == cents.length && cents.nonEmpty,
    s"codebook shape: ${cids.length} ids, ${cents.length} centroids")

  /** ‖c‖² per centroid, computed once per (driver, executor) instance —
    * the |v|² term is constant per row across centroids, so
    * argmin(‖c‖² − 2·q·c) ≡ argmin(Σ(q−c)²). */
  @transient private lazy val norms: Array[Long] =
    cents.map(c => { var s = 0L; var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }; s })

  /** Instance worker shared by interpreted eval and generated code —
    * one flat k·dim loop, no per-row allocation. */
  def assign(q: ArrayData): Long = {
    val ns = norms
    var bestD = Long.MaxValue
    var bestCid = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var dot = 0L
      var j = 0
      while (j < c.length) { dot += q.getLong(j) * c(j); j += 1 }
      val d = ns(i) - 2L * dot
      if (d < bestD || (d == bestD && cids(i) < bestCid)) {
        bestD = d; bestCid = cids(i)
      }
      i += 1
    }
    bestCid
  }

  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroidExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}
