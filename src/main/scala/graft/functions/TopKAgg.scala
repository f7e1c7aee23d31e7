package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into the top-k heap. Field order is the
  * call-site column order (dot, cand_id, cosine). */
case class ScoredCand(dot: Long, cand_id: Long, cosine: Double)

/** [[ScoredCand]] plus one opaque payload carried through the heap
  * unexamined (e.g. the IVF centroid id of the candidate) — never part
  * of the ordering. */
case class ScoredCandTag(dot: Long, cand_id: Long, cosine: Double, tag: Long)

/** Shared bounded-buffer maintenance for the top-k aggregators. */
private[functions] object BoundedTopK {
  /** Insert into a best-first sorted buffer, keeping at most k entries.
    * Steady state (full buffer, x worse than the k-th) is one comparison
    * with no allocation; an accepted row is a single O(k) positional
    * insert — no re-sort. */
  def insert[T](buf: Seq[T], x: T, k: Int)(better: (T, T) => Boolean): Seq[T] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val i = buf.indexWhere(b => better(x, b))
      val pos = if (i < 0) buf.size else i
      ((buf.take(pos) :+ x) ++ buf.drop(pos)).take(k)
    }

  /** Merge two best-first sorted buffers into one, keeping k. */
  def merge[T](a: Seq[T], b: Seq[T], k: Int)(better: (T, T) => Boolean): Seq[T] =
    b.foldLeft(a)((acc, x) => insert(acc, x, k)(better))
}

/** Bounded top-k aggregate: the two-phase exact top-k primitive.
  *
  * `groupBy(query).agg(topK(...))` runs this as a partial-then-final
  * ObjectHashAggregate: every map task reduces its slice of scored rows
  * to a ≤ k-entry buffer PER QUERY before the exchange, so the shuffle
  * on the query key carries O(queries · mapTasks · k) heap entries — not
  * the n·q scored rows a `row_number() OVER (PARTITION BY query)` window
  * shuffles. At 100 TB the window plan funnels the entire scored corpus
  * into q reducer partitions; this plan's reducers merge only
  * already-bounded buffers.
  *
  * Ordering is total and deterministic: dot DESC, then cand_id ASC
  * (cand_id is unique per query), so results are bit-identical to the
  * window formulation and to the SQL oracle's row_number ranking.
  */
class TopKByDot(k: Int)
    extends Aggregator[ScoredCand, Seq[ScoredCand], Seq[ScoredCand]] {

  private def better(a: ScoredCand, b: ScoredCand): Boolean =
    a.dot > b.dot || (a.dot == b.dot && a.cand_id < b.cand_id)

  override def zero: Seq[ScoredCand] = Nil

  override def reduce(buf: Seq[ScoredCand], x: ScoredCand): Seq[ScoredCand] =
    BoundedTopK.insert(buf, x, k)(better)

  override def merge(a: Seq[ScoredCand], b: Seq[ScoredCand]): Seq[ScoredCand] =
    BoundedTopK.merge(a, b, k)(better)

  override def finish(r: Seq[ScoredCand]): Seq[ScoredCand] = r

  override def bufferEncoder = ExpressionEncoder[Seq[ScoredCand]]()
  override def outputEncoder = ExpressionEncoder[Seq[ScoredCand]]()
}

object TopKByDot {
  /** Untyped-aggregation handle: `topK(k)(col("dot"), col("cand_id"),
    * col("cosine"))` inside a `groupBy(...).agg(...)`. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKByDot(k), ExpressionEncoder[ScoredCand]())
}

/** [[TopKByDot]] with one payload column riding along (identical
  * ordering — the tag never participates in comparisons). Used by the
  * IVF top-k, whose output carries the candidate's centroid id. */
class TopKByDotTag(k: Int)
    extends Aggregator[ScoredCandTag, Seq[ScoredCandTag], Seq[ScoredCandTag]] {

  private def better(a: ScoredCandTag, b: ScoredCandTag): Boolean =
    a.dot > b.dot || (a.dot == b.dot && a.cand_id < b.cand_id)

  override def zero: Seq[ScoredCandTag] = Nil

  override def reduce(buf: Seq[ScoredCandTag], x: ScoredCandTag): Seq[ScoredCandTag] =
    BoundedTopK.insert(buf, x, k)(better)

  override def merge(a: Seq[ScoredCandTag], b: Seq[ScoredCandTag]): Seq[ScoredCandTag] =
    BoundedTopK.merge(a, b, k)(better)

  override def finish(r: Seq[ScoredCandTag]): Seq[ScoredCandTag] = r

  override def bufferEncoder = ExpressionEncoder[Seq[ScoredCandTag]]()
  override def outputEncoder = ExpressionEncoder[Seq[ScoredCandTag]]()
}

object TopKByDotTag {
  /** `topK(k)(col("dot"), col("cand_id"), col("cosine"), col("tag"))`. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKByDotTag(k), ExpressionEncoder[ScoredCandTag]())
}
