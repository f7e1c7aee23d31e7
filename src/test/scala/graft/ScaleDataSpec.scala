package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants of the derived scale step (BASELINE.md round 14): the
  * scaling measurements are only meaningful if the derived copies are
  * disjoint in keys/time and NOT near-duplicates in content — a copy
  * that collided or duplicated would silently change every kernel's
  * workload shape. */
class ScaleDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 8 copies so the perturbation checks cover copy indexes past any
  // small-modulus degeneracy (a round-14 review found the original
  // delta formula collapsed to a constant for copy 7).
  private val Copies = 8

  private lazy val out: String = {
    val dir = Scratch.dir("scaledata_spec")
    ScaleData.run(spark, "/root/testdata/sf0.001", dir, Copies)
    dir
  }

  test("copies multiply row counts and keep key/time ranges disjoint") {
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val ev = spark.read.parquet(s"$out/events.parquet")
    assert(ev.count() == Copies * src.count())
    // per-copy key ranges are disjoint: bucketing ids by the offset
    // recovers exactly the copy index, and each bucket holds one copy
    val byCopy = ev.groupBy((col("event_id") / 10000000L).cast("long")
        .as("copy"))
      .agg(count(lit(1)).as("n"), min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("copy").collect()
    assert(byCopy.map(_.getLong(0)).toSeq ==
      (0L until Copies.toLong).toSeq)
    assert(byCopy.forall(_.getLong(1) == src.count()))
    // time ranges are strictly ordered copy-to-copy (no window overlap)
    byCopy.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(3).before(b.getTimestamp(2)),
        s"copy time ranges overlap: ${a.getTimestamp(3)} vs " +
          s"${b.getTimestamp(2)}")
    }
  }

  test("fact-to-dim joins resolve for EVERY copy — dims scale in " +
      "lockstep, so no copy's rows silently drop from dim-joining " +
      "queries at the derived step") {
    def tb(n: String) = spark.read.parquet(s"$out/$n.parquet")
    val (li, ord, cust) = (tb("lineitem"), tb("orders"), tb("customer"))
    val (part, supp, nat) = (tb("part"), tb("supplier"), tb("nation"))
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"),
      "left_anti").count() == 0, "lineitem rows without an order")
    assert(li.join(part, li("l_partkey") === part("p_partkey"),
      "left_anti").count() == 0, "lineitem rows without a part")
    assert(li.join(supp, li("l_suppkey") === supp("s_suppkey"),
      "left_anti").count() == 0, "lineitem rows without a supplier")
    assert(ord.join(cust, ord("o_custkey") === cust("c_custkey"),
      "left_anti").count() == 0, "orders rows without a customer")
    // the unscaled bounded enumerations still cover every copy's refs
    assert(cust.join(nat, cust("c_nationkey") === nat("n_nationkey"),
      "left_anti").count() == 0, "customer rows without a nation")
    // and the dims really scaled (disjoint per-copy key ranges)
    assert(ord.count() == Copies *
      Tables.load(spark, "/root/testdata/sf0.001", "orders").count())
  }

  test("document copies are NOT near-duplicates of their base doc " +
      "(shingle overlap below dedup thresholds)") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val base = docs.where(col("doc_id") < 10000000L)
      .select(col("doc_id").as("b_id"), col("text").as("b_text"))
    val copy1 = docs
      .where(col("doc_id") >= 10000000L && col("doc_id") < 20000000L)
      .select((col("doc_id") - 10000000L).as("b_id"),
        col("text").as("c_text"))
    // 5-gram word shingle Jaccard per (copy-0, copy-1) pair — the
    // quantity MinHash dedup estimates. The every-4th-word copy tag
    // puts a copy-unique token inside every 5-shingle, so cross-copy
    // Jaccard must sit far below any near-dup threshold (~0.7+).
    def shingles(c: org.apache.spark.sql.Column) =
      array_distinct(transform(
        slice(split(c, " "), 1, 10000),
        (w: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
          concat_ws(" ", slice(split(c, " "), i + 1, lit(5)))))
    val j = base.join(copy1, "b_id")
      .select(
        (size(array_intersect(shingles(col("b_text")),
          shingles(col("c_text")))).cast("double") /
          size(array_union(shingles(col("b_text")),
            shingles(col("c_text")))).cast("double")).as("jac"))
      .agg(max("jac"), avg("jac")).head()
    assert(j.getDouble(0) < 0.6,
      s"max cross-copy shingle Jaccard ${j.getDouble(0)} — copies " +
        "would register as near-duplicates and distort dd_* scaling")
    assert(j.getDouble(1) < 0.45, s"avg Jaccard ${j.getDouble(1)}")
  }

  test("derived documents are SELF-SIMILAR: zero cross-copy duplication " +
      "at the granularities the hot kernels block on, and fuzzy blocks " +
      "stay under the maxBlock cap") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
      .withColumn("copy", (col("doc_id") / 10000000L).cast("long"))

    // 1) Zero cross-copy duplicated 4-token windows (SubstringW=4):
    //    every window contains one churned j%4==3 token, whose copy tag
    //    makes cross-copy equality impossible. This is the structural
    //    fact that pins dd_substring_* / tx_line_dedup row exponents to
    //    1.0 — duplicated-window mass is within-copy only, so it
    //    scales exactly linearly in copies.
    val win = docs.select(col("copy"), posexplode(
        filter(transform(split(col("text"), " "),
          (w: org.apache.spark.sql.Column,
           j: org.apache.spark.sql.Column) =>
            concat_ws(" ", w,
              try_element_at(split(col("text"), " "), j + 2),
              try_element_at(split(col("text"), " "), j + 3),
              try_element_at(split(col("text"), " "), j + 4))),
          (s: org.apache.spark.sql.Column) =>
            size(split(s, " ")) === 4)))
      .select(col("copy"), col("col").as("w"))
    val crossCopyWindows = win.groupBy("w")
      .agg(countDistinct("copy").as("nc"))
      .where(col("nc") > 1).count()
    assert(crossCopyWindows == 0,
      s"$crossCopyWindows 4-token windows recur across copies — " +
        "duplicated fraction would grow with copies again")

    // 2) Fuzzy-dedup prefix blocks (normalized 8-char) bounded under
    //    FuzzyMaxBlock=200 everywhere: the word-0 copy tag keeps blocks
    //    within-copy (6 base chars of discrimination), so the cap never
    //    engages and pair work is linear in copies.
    val clean = regexp_replace(
      regexp_replace(trim(lower(col("text"))), "\\s+", " "), "[^ -~]", "")
    val maxBlock = docs.select(substring(clean, 1, 8).as("block"))
      .groupBy("block").count().agg(max("count")).head().getLong(0)
    assert(maxBlock <= 200,
      s"a derived fuzzy block reached $maxBlock docs (cap 200) — the " +
        "maxBlock exclusion would distort the scaling measurement")

    // 3) Zero cross-copy duplicate LINES ('. ' sentence breaking, the
    //    tx_line_dedup shape): fixture sentences are ≥10 words, so each
    //    carries at least two churned tokens.
    val lines = docs.select(col("copy"),
        explode(split(regexp_replace(col("text"), "\\. ", ".\n"), "\n"))
          .as("line"))
    val crossCopyLines = lines.groupBy("line")
      .agg(countDistinct("copy").as("nc"))
      .where(col("nc") > 1).count()
    assert(crossCopyLines == 0,
      s"$crossCopyLines lines recur across copies")
  }

  test("EVERY embedding copy is decorrelated from the base AND from " +
      "every other copy (distinct rotations — no clone neighborhoods)") {
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    def copyOf(i: Int) = emb
      .where(col("vec_id") >= i * 10000000L &&
        col("vec_id") < (i + 1) * 10000000L)
      .select((col("vec_id") - i * 10000000L).as("b_id"),
        col("embedding").as(s"e$i"))
    def l1Stats(i: Int, k: Int) =
      copyOf(i).join(copyOf(k), "b_id")
        .select(aggregate(zip_with(col(s"e$i"), col(s"e$k"),
            (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column)
              => abs(x - y)),
          lit(0.0d), (acc: org.apache.spark.sql.Column,
                      d: org.apache.spark.sql.Column) => acc + d).as("l1"))
        .agg(min("l1"), avg("l1")).head()
    // every copy vs the base, and every adjacent copy pair: rotation
    // must decorrelate (avg L1 far beyond the ±0.006 micro-
    // perturbation's 0.384 cap), and nothing may be identical
    (1 until Copies).foreach { i =>
      val vsBase = l1Stats(0, i)
      assert(vsBase.getDouble(0) > 0.0,
        s"copy $i has an embedding identical to its base")
      assert(vsBase.getDouble(1) > 1.0,
        s"copy $i is not decorrelated from base (avg L1 " +
          s"${vsBase.getDouble(1)}) — clone neighborhoods would " +
          "degenerate every ANN kernel at sf1")
      if (i + 1 < Copies) {
        val vsNext = l1Stats(i, i + 1)
        assert(vsNext.getDouble(0) > 0.0 && vsNext.getDouble(1) > 1.0,
          s"copies $i and ${i + 1} are clones (min " +
            s"${vsNext.getDouble(0)}, avg ${vsNext.getDouble(1)})")
      }
    }
  }
}
