package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DERIVED scale-step generator (not driver data): unions a source
  * scale-factor directory `copies` times with disjoint key / time
  * ranges per copy, so the iterative kernels can be MEASURED at ~10×
  * the largest provided fixture (BASELINE.md records the resulting
  * scaling curves). The driver's testdata tops out at sf0.1; design
  * claims beyond that were plan-asserted only — this closes the gap
  * with data.
  *
  * Per-copy transforms (copy 0 is the identity — sf1 ⊇ sf0.1 — for
  * every table EXCEPT `documents`, whose copies must be mutually
  * symmetric for the self-similarity argument below):
  *  - `lineitem` (the graph family's source): order/part/supp keys
  *    offset by `i·10⁷` — ten disjoint co-order graphs. The offset is
  *    divisible by the BFS/PPR seed mods (100, 10), so each copy seeds
  *    the same node fraction and iteration workload scales cleanly.
  *  - `events`: event/user ids offset by `i·10⁷`; `ts` offset by
  *    `i·(span + 1 day)` so copies never share session/as-of windows.
  *  - `documents`: doc ids offset; EVERY copy (including copy 0) gets
  *    an identical-in-distribution copy-unique churn so the derived
  *    corpus is SELF-SIMILAR — the duplicated share is scale-invariant
  *    (constant fraction, within-copy only) and cross-copy duplication
  *    is zero at every granularity the dedup/text kernels block on.
  *    See the documents branch below for the full design.
  *  - `embeddings`: vec ids offset; for i>0 each dimension is
  *    perturbed by a deterministic ±0.006 hash ramp — breaks exact
  *    vector duplication (which would collapse kNN graphs) without
  *    moving points between neighborhoods.
  *  - `orders` / `customer` / `part` / `supplier`: keys offset IN
  *    LOCKSTEP with the facts that reference them (`o_orderkey`/
  *    `l_orderkey`, `o_custkey`/`c_custkey`, `p_partkey`/`l_partkey`,
  *    `s_suppkey`/`l_suppkey`), so every fact-to-dim join resolves for
  *    EVERY copy — the whole registry is semantically valid at the
  *    derived step, not just the dim-free kernels (a pass-through dim
  *    would leave 90% of fact rows unmatched and silently measure a
  *    skewed workload). `nation`/`region` stay unscaled: they are
  *    bounded real-world enumerations (25/5 rows at every TPC-H scale
  *    factor), and `c_nationkey`/`s_nationkey` pass through unchanged,
  *    so the geography joins stay valid too.
  */
object ScaleData {

  private val KeyOffset = 10000000L // divisible by the seed mods 10/100

  private def withCopies(spark: SparkSession, copies: Int)
                        (one: Int => DataFrame): DataFrame =
    (0 until copies).map(one).reduce(_.unionAll(_))

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/scaledata/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // Optional 4th arg: comma-list of tables to derive — a SLICE for
    // targeted scale decades (e.g. "lineitem,embeddings" is all the
    // top-shuffler kernels gr_*/sim_knn_* read; deriving 10 tables ×
    // 100 copies to measure 5 queries would be waste, not rigor).
    val only = args.lift(3).map(_.split(",").toSet)
      .getOrElse(Tables.all.toSet)
    val spark = Sessions.get("graft-scaledata")
    run(spark, src, dst, copies, only)
    spark.stop()
  }

  /** The derivation itself, session-supplied (tests reuse the shared
    * session; `main` owns its own). */
  def run(spark: SparkSession, src: String, dst: String,
          copies: Int, only: Set[String] = Tables.all.toSet): Unit = {
    def sel(name: String): Boolean = only.contains(name)
    def write(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    // lineitem: disjoint key ranges per copy (graph source).
    if (sel("lineitem")) {
    val li = Tables.load(spark, src, "lineitem")
    write("lineitem", withCopies(spark, copies) { i =>
      val off = lit(i * KeyOffset)
      li.withColumn("l_orderkey", col("l_orderkey") + off)
        .withColumn("l_partkey", col("l_partkey") + off)
        .withColumn("l_suppkey", col("l_suppkey") + off)
    }, 32)
    }

    // events: disjoint ids and time ranges per copy.
    if (sel("events")) {
    val ev = Tables.load(spark, src, "events")
    val (minUs, maxUs) = {
      val r = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head()
      (r.getLong(0), r.getLong(1))
    }
    val spanUs = maxUs - minUs + 86400L * 1000000L
    write("events", withCopies(spark, copies) { i =>
      val off = lit(i * KeyOffset)
      ev.withColumn("event_id", col("event_id") + off)
        .withColumn("user_id", col("user_id") + off)
        .withColumn("ts",
          timestamp_micros(unix_micros(col("ts")) + lit(i * spanUs)))
    }, 32)
    }

    // documents: CONSTANT-duplication-fraction derivation (round-19 —
    // replaces the round-14 every-5th-word scheme whose 80% cross-copy
    // word sharing saturated the duplicated fraction as copies grew:
    // 56% → 63% → ~100%, inflating the substring/line-dedup sf1→sf10
    // row exponents to 1.20–1.30 and driving fuzzy blocks toward the
    // maxBlock cap; VERDICT r18 task 1). EVERY copy, including copy 0,
    // gets an identical-in-distribution per-copy churn, making the
    // derived family exactly SELF-SIMILAR: corpus structure at N copies
    // = N disjoint replicas of the one-copy structure, so every
    // duplication-driven quantity is linear in copies BY CONSTRUCTION
    // and the scaling tables measure it instead of adjudicating it.
    // Cross-copy duplication is zero at every granularity the hot
    // operators block on:
    //  - a 2-char copy tag prepended to word 0 breaks fuzzyPairs'
    //    8-char normalized-prefix block (within-copy blocks keep 6
    //    base chars of discrimination — sf0.1 max block 197, still
    //    under FuzzyMaxBlock=200, so the cap never engages on the
    //    derived corpus);
    //  - an "x{i}z" prefix on every 4th word (j%4==3) puts a
    //    copy-unique token inside EVERY 4-consecutive-token window
    //    (4 consecutive indices cover all residues mod 4), killing all
    //    cross-copy SubstringW=4 spans, every ≥4-word shingle, and —
    //    because the fixture's sentences are ≥10 words — every
    //    cross-copy duplicate line. The prefix form (never a suffix)
    //    leaves trailing '.' intact, so '. '-based sentence breaking
    //    is unchanged. "x{i}z" tags are mutually prefix-free and the
    //    pattern has zero hits in the fixture vocabulary, so a tagged
    //    token can never equal another copy's token.
    // WITHIN a copy the base corpus's natural duplication (4-gram
    // repetition, near-dup docs, prefix blocks) is preserved under the
    // position-deterministic churn — that constant fraction is the
    // dedup operators' workload, identical for every copy. Copy 0 is
    // deliberately NOT the identity here (unlike the key-offset
    // tables): exponent baselines come from a 1-copy derivation of the
    // same generator (scaledata/sf0.1d), keeping all three decades on
    // one self-similar family. Token COUNTS are unchanged (prefixes,
    // not new words); n_chars grows ~14%, recomputed below.
    if (sel("documents")) {
    require(copies <= 676, "2-char base-26 copy tag supports ≤ 676 copies")
    val docs = Tables.load(spark, src, "documents")
    write("documents", withCopies(spark, copies) { i =>
      val tag2 = s"${('a' + (i / 26) % 26).toChar}${('a' + i % 26).toChar}"
      val wtag = s"x${i}z"
      docs.withColumn("doc_id", col("doc_id") + lit(i * KeyOffset))
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            (w: Column, j: Column) =>
              when(j === 0, concat(lit(tag2), w))
                .when(j % 4 === 3, concat(lit(wtag), w))
                .otherwise(w)),
          " "))
        .withColumn("n_chars", length(col("text")))
    }, 16)
    }

    // embeddings: each copy ROTATES the dimension order by a distinct
    // amount (i·7 mod 64 — all ten rotations distinct), then adds a
    // deterministic mod-13 micro-perturbation keyed on the BASE id.
    // Rotation is the load-bearing part: it decorrelates every copy
    // from the base AND from every other copy (a rotated random
    // vector is near-orthogonal to the original), so each copy
    // occupies its own kNN neighborhood — a shift-only perturbation
    // keeps all ten siblings cosine-identical clones of one point,
    // which degenerates every ANN kernel measured at sf1 (two
    // review rounds proved modular-shift schemes also collapse to ≤7
    // distinct variants). The micro-perturbation (±0.006, keyed on
    // the base id so the formula cannot cancel against the copy
    // offset) breaks residual exactness; ScaleDataSpec asserts both
    // properties per copy.
    if (sel("embeddings")) {
    val emb = Tables.load(spark, src, "embeddings")
    write("embeddings", withCopies(spark, copies) { i =>
      val base = emb.withColumn("vec_id", col("vec_id") + lit(i * KeyOffset))
      if (i == 0) base
      else {
        val r = (i * 7) % 64
        val rotated =
          concat(slice(col("embedding"), r + 1, 64 - r),
            slice(col("embedding"), 1, r))
        // Rotations cycle mod 64, so copy 64+j would re-use copy j's
        // orientation and sit ±0.006 from it — a near-duplicate that
        // collapses kNN neighborhoods at ≥ 64 copies (observed as the
        // sf10 exponent caveat). NEGATION is a second isometry axis:
        // cosine flips sign, so a negated sibling is maximally far
        // from its rotation twin — 128 distinct isometries total.
        // i < 64 is untouched, so sf1 (10 copies) replays identically.
        val sign = if ((i / 64) % 2 == 1) lit(-1.0f) else lit(1.0f)
        val baseId = col("vec_id") - lit(i * KeyOffset)
        base.withColumn("embedding",
          transform(rotated, (x: Column, j: Column) =>
            (x * sign + ((pmod(baseId * 31 + j + lit(i * 3L), lit(13L))
              - lit(6L)).cast("float") * lit(0.001f))).cast("float")))
      }
    }, 8)
    }

    // key-bearing dims: offset IN LOCKSTEP with the fact keys, so the
    // join graph resolves for every copy (orders↔lineitem on orderkey,
    // orders↔customer on custkey, part/supplier↔lineitem).
    val dimKeys = Map(
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"))
    dimKeys.filter(d => sel(d._1)).foreach { case (name, keys) =>
      val d = Tables.load(spark, src, name)
      write(name, withCopies(spark, copies) { i =>
        keys.foldLeft(d)((df, k) =>
          df.withColumn(k, col(k) + lit(i * KeyOffset)))
      }, 8)
    }

    // bounded enumerations: pass through unscaled (nationkey refs are
    // not offset anywhere, so these join every copy's rows).
    Seq("region", "nation").filter(sel)
      .foreach(n => write(n, Tables.load(spark, src, n), 4))

    Tables.all.filter(sel).foreach { n =>
      val c = spark.read.parquet(s"$dst/$n.parquet").count()
      println(s"[scaledata] $n: $c rows")
    }
  }
}
