package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch: the aggregate state is
  * the k SMALLEST DISTINCT hash values seen, kept ascending — the
  * classic mergeable cardinality sketch (Bar-Yossef et al. 2002;
  * the θ-sketch family's base case). With hashes uniform on [0, 2³²),
  * the k-th smallest value h₍k₎ estimates the distinct count as
  * (k−1) · 2³² / h₍k₎.
  *
  * Where this sits on the engine's distinct-count spectrum:
  * `countDistinct` (exact, shuffles one row per distinct pair),
  * [[BitmapDistinct]] (exact AND bounded, but state ∝ id-domain
  * pages), HLL `approx_count_distinct` (bounded, engine-internal and
  * NOT replayable cross-engine) — and this: bounded at exactly k
  * longs per group AND deterministically replayable, because the
  * k-minima of a fixed hash function are a pure set property of the
  * input, independent of row order, partitioning, and merge shape.
  * That makes KMV the one APPROXIMATE cardinality sketch whose output
  * the DuckDB oracle can reproduce bit-for-bit (a `row_number() OVER
  * (ORDER BY hash)` prefix), so the estimate itself — not just a
  * tolerance band — is under the hash-parity contract.
  *
  * Scale shape: `groupBy(key).agg(kmv(k)(hash))` plans as a
  * partial-then-final ObjectHashAggregate — every map task reduces its
  * slice to ≤ k longs per key BEFORE the exchange, so the shuffle
  * carries O(keys · mapTasks · k) values no matter how many rows or
  * distinct ids flow in (the [[TopKByDot]] argument, pointed at
  * cardinality instead of rank). Sketches for different partitions /
  * days / sources union by the same `merge`, which is how 100 TB
  * rollups keep distinct counts without re-touching raw data.
  *
  * Steady-state `reduce` (full buffer, x above the k-th minimum) is
  * one comparison with no allocation; an accepted value is a single
  * O(k) positional insert. Duplicates never enter the buffer — KMV is
  * defined over the distinct hash SET. The Seq rebuild per accepted
  * insert is deliberate at k = 64 (accepts are rare once the buffer
  * fills — P[accept] = k/n under uniform hashing); if k is ever
  * raised past a few hundred, switch the buffer to a fixed-size
  * Array[Long] with binary-search insert and keep the Seq shape only
  * at the encoder boundary.
  */
class KmvMinHashes(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, s"KmvMinHashes: k=$k")

  override def zero: Seq[Long] = Nil

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = insert(buf, x)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[Long]): Seq[Long] = r

  private def insert(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.size >= k && buf.last <= x) buf
    else {
      val i = buf.indexWhere(b => x <= b)
      if (i >= 0 && buf(i) == x) buf // already in the set
      else {
        val pos = if (i < 0) buf.size else i
        ((buf.take(pos) :+ x) ++ buf.drop(pos)).take(k)
      }
    }

  override def bufferEncoder = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder = ExpressionEncoder[Seq[Long]]()
}

object KmvMinHashes {
  /** Untyped-aggregation handle: `kmv(k)(col("h"))` inside a
    * `groupBy(...).agg(...)`. */
  def kmv(k: Int): UserDefinedFunction =
    udaf(new KmvMinHashes(k), ExpressionEncoder[Long]())
}
