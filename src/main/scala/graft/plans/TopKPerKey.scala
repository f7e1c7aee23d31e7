package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.execution.SparkStrategy

import scala.collection.mutable

/** TopK-per-key pushdown — the whole-operator Catalyst extension
  * (SURVEY.md §7.3 tier (c)): logical node + optimizer Rule + planner
  * Strategy + physical operators, registered through
  * [[graft.functions.GraftExtensions]].
  *
  * The declarative formulation of "top k rows per key" —
  * `row_number().over(partitionBy(key).orderBy(...))` then
  * `filter(rank <= k)` — plans in stock Spark 4 as Sort →
  * WindowGroupLimit(Partial) → Exchange → Sort → WindowGroupLimit
  * (Final) → Window → Filter (SPARK-37099 prunes rows past rank k
  * early, a big improvement over pre-3.5). What remains expensive is
  * the pair of FULL PARTITION SORTS: every input partition is sorted
  * end-to-end (O(n log n), spillable) before its group limit can scan
  * in order, and the shuffled side sorts again. A bounded per-key heap
  * — Trino's TopNRowNumberOperator, DuckDB's perfect-hash TopN — does
  * the same job in O(n log k) with O(keys × k) state and NO sort at
  * all; this file is that operator for Spark.
  *
  * [[RewriteWindowTopK]] conservatively matches Filter-over-Window where
  * the window computes exactly one `row_number` and the predicate bounds
  * it by a small literal, and rewrites to the [[TopKPerKey]] logical
  * node. [[TopKStrategy]] plans it as TWO physical stages mirroring
  * partial aggregation: [[TopKPerKeyPartialExec]] prunes each MAP
  * partition to its local top-k per key before the exchange (correct
  * because the global top-k is a subset of the union of local top-k's),
  * so at most k rows per (key, map partition) ever shuffle; then
  * [[TopKPerKeyExec]] — which declares `ClusteredDistribution(keys)`, so
  * EnsureRequirements inserts the hash exchange — merges to the exact
  * global top-k and emits the 1-based rank. State is O(keys × k) rows
  * per task, never a key's full row set; no Sort, no Window, no spill.
  *
  * Rank ties follow `row_number` semantics: arbitrary unless the order
  * is total (the registry queries all use total orders — oracle-checked
  * end to end, e.g. `ev_top_n`, `tx_tfidf`).
  */
object TopKPushdown {
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteWindowTopK)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }

  /** Shared bounded insert: keep `buf` sorted ascending by `ord`,
    * capped at k — O(log k) search + O(k) arraycopy per accepted row,
    * O(1) reject for rows past a full buffer's last element. */
  private[plans] def boundedInsert(buf: mutable.ArrayBuffer[InternalRow],
                                   row: InternalRow, k: Int,
                                   ord: Ordering[InternalRow]): Unit = {
    if (buf.length == k && ord.compare(row, buf.last) >= 0) return
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(row, buf(mid)) < 0) hi = mid else lo = mid + 1
    }
    buf.insert(lo, row.copy())
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  /** Per-partition top-k pruning shared by both physical stages. */
  private[plans] def pruneToTopK(iter: Iterator[InternalRow],
                                 keys: Seq[Expression],
                                 order: Seq[SortOrder], k: Int,
                                 schema: Seq[Attribute])
      : mutable.LinkedHashMap[UnsafeRow, mutable.ArrayBuffer[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keys, schema)
    val ord = GenerateOrdering.generate(order, schema)
    val heaps =
      mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
    iter.foreach { row =>
      // keyProj returns a reused buffer: look up with it (content hash),
      // copy only when the key is first seen.
      val key = keyProj(row)
      val buf = heaps.get(key) match {
        case Some(b) => b
        case None =>
          val b = new mutable.ArrayBuffer[InternalRow](k)
          heaps.put(key.copy(), b)
          b
      }
      boundedInsert(buf, row, k, ord)
    }
    heaps
  }
}

/** Logical: top `k` rows per `keys` group under `order`, emitting the
  * 1-based rank as `rankAttr` (same exprId as the replaced
  * `row_number` alias, so downstream references resolve unchanged). */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is a constructor Expression, so it lands in `references`;
  // declaring it produced keeps missingInput empty (no `!` bad-plan tag).
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

/** Conservative Filter-over-Window matcher. Fires only when the Window
  * computes exactly ONE expression, it is `row_number()`, and the whole
  * filter condition is `rank <= k` / `rank < k` / `rank = 1` (possibly
  * through an integral up-cast) with small literal k — anything else is
  * left for Spark's stock planning. */
object RewriteWindowTopK extends Rule[LogicalPlan] {
  private val MaxK = 1024

  /** Strip an integral widening cast around the rank reference. */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(inner, dt, _, _)
        if dt.isInstanceOf[org.apache.spark.sql.types.LongType.type] ||
          dt.isInstanceOf[org.apache.spark.sql.types.IntegerType.type] =>
      inner
    case other => other
  }

  private def litK(e: Expression): Option[Int] = e match {
    case Literal(v: Int, _) => Some(v)
    case Literal(v: Long, _) if v <= Int.MaxValue => Some(v.toInt)
    case _ => None
  }

  /** Extract the bound k if `cond` is exactly a rank-bounding predicate
    * on `rank`. */
  private def boundOf(cond: Expression, rank: Attribute): Option[Int] = {
    def isRank(e: Expression): Boolean = stripCast(e) match {
      case a: Attribute => a.semanticEquals(rank)
      case _ => false
    }
    cond match {
      case LessThanOrEqual(l, r) if isRank(l) => litK(r)
      case LessThan(l, r) if isRank(l) => litK(r).map(_ - 1)
      case GreaterThanOrEqual(l, r) if isRank(r) => litK(l)
      case GreaterThan(l, r) if isRank(r) => litK(l).map(_ - 1)
      case EqualTo(l, r) if isRank(l) && litK(r).contains(1) => Some(1)
      case EqualTo(l, r) if isRank(r) && litK(l).contains(1) => Some(1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(
          WindowExpression(_: RowNumber,
            WindowSpecDefinition(partSpec, orderSpec, _)), _)),
          _, _, child, _)) if partSpec.nonEmpty && orderSpec.nonEmpty =>
      boundOf(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && k <= MaxK =>
          TopKPerKey(partSpec, orderSpec, k, alias.toAttribute, child)
        case _ => f
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Map-side pruning BEFORE the exchange: local top-k per key, no rank
  * yet (ranks are only correct after the global merge). Shuffles at
  * most k rows per (key, input partition). */
case class TopKPerKeyPartialExec(keys: Seq[Expression],
                                 order: Seq[SortOrder], k: Int,
                                 child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext,
      "number of local groups"))
  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (ks, os, kk) = (keys, order, k)
    val (outRows, groups) = (longMetric("numOutputRows"),
      longMetric("numGroups"))
    child.execute().mapPartitions({ iter =>
      val heaps = TopKPushdown.pruneToTopK(iter, ks, os, kk, schema)
      groups += heaps.size
      heaps.valuesIterator.flatMap(_.iterator)
        .map { r => outRows += 1; r }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyPartialExec = copy(child = newChild)
}

/** Final merge on the clustered side of the exchange: exact global
  * top-k per key, emitting rows in rank order with the 1-based rank
  * appended as `rankAttr`. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext,
      "number of keys"))
  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val outAttrs = output
    val (ks, os, kk) = (keys, order, k)
    val (outRows, groups) = (longMetric("numOutputRows"),
      longMetric("numGroups"))
    child.execute().mapPartitions({ iter =>
      val heaps = TopKPushdown.pruneToTopK(iter, ks, os, kk, schema)
      groups += heaps.size
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.valuesIterator.flatMap { buf =>
        buf.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          outRows += 1
          proj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}
