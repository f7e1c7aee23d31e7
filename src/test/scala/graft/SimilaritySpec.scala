package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("quantize floors to scaled longs") {
    val out = emb((0L, Seq(1.0f, -0.5f, 0.0015f)))
      .select(Similarity.quantize($"embedding").as("q"))
      .as[Seq[Long]].head()
    assert(out == Seq(1000L, -500L, 1L))
  }

  test("bruteForceTopK ranks by dot product with id tiebreak") {
    // query 0 = (1,0); candidates along decreasing x-projection
    val df = emb(
      (0L, Seq(1f, 0f)),
      (1L, Seq(2f, 0f)),    // dot 2e6
      (2L, Seq(1f, 1f)),    // dot 1e6
      (3L, Seq(0f, 1f)),    // dot 0
      (4L, Seq(-1f, 0f)))   // dot -1e6
    val out = Similarity.bruteForceTopK(df, 1L, 3)
      .select("query_id", "cand_id", "rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(out.toSeq == Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
  }

  test("cosine of parallel vectors is 1.0") {
    val df = emb((0L, Seq(1f, 2f, 2f)), (1L, Seq(2f, 4f, 4f)))
    val cos = Similarity.bruteForceTopK(df, 1L, 1)
      .select("cosine").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-9)
  }

  test("planes are deterministic ±1 and lshTopK only scores same-bucket") {
    val ps = Similarity.planes(4, 8)
    assert(ps == Similarity.planes(4, 8))
    assert(ps.flatten.forall(v => v == 1L || v == -1L))

    val df = emb(
      (0L, Seq(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (1L, Seq(1f, 1f, 1f, 1f, 1f, 1f, 1f, 0.9f)),   // same orthant → same bucket
      (2L, Seq(-1f, -1f, -1f, -1f, -1f, -1f, -1f, -1f))) // opposite bucket
    val out = Similarity.lshTopK(df, 1L, 10, 4, 8)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)))
    assert(!out.contains((0L, 2L)))
  }

  test("ivfTopK: probed lists find the near neighbor, skip far lists") {
    // centroids = vec 0 and 1 (numCentroids = 2): two opposite lists
    val df = emb(
      (0L, Seq(1f, 1f, 1f, 1f)),     // centroid/list A (also the query)
      (1L, Seq(-1f, -1f, -1f, -1f)), // centroid/list B
      (2L, Seq(1f, 1f, 1f, 0.5f)),   // assigned to A — must be found
      (3L, Seq(-1f, -1f, -1f, -0.5f))) // assigned to B
    val out = Similarity.ivfTopK(df, 1L, 10, numCentroids = 2,
        numProbes = 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 2L)))
    assert(!out.contains((0L, 3L)), "far list must not be probed")
    // with numProbes = 2 every list is probed → the far vector appears
    val all = Similarity.ivfTopK(df, 1L, 10, numCentroids = 2,
        numProbes = 2)
      .select("cand_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L))
  }

  test("ivfTopK recovers an exact duplicate at rank 1") {
    val base = Seq.tabulate(8)(i => (i.toFloat + 1) / 8f)
    val df = emb(
      (0L, base), (1L, base.map(-_)), // two centroids
      (5L, Seq.fill(8)(0.3f)), (6L, base))
    val top = Similarity.ivfTopK(df, 1L, 1, numCentroids = 2,
        numProbes = 1)
      .select("query_id", "cand_id", "cosine")
      .as[(Long, Long, Double)].collect().head
    assert(top._1 == 0L && top._2 == 6L)
    assert(math.abs(top._3 - 1.0) < 1e-9)
  }
}
