package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainPrep

/** Sampling / mixing / packing: decisions must be pure functions of the
  * row id (replayable), slices must nest and partition the hash space,
  * and packing must respect shard boundaries with no document splits. */
class TrainPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 200L).map(i =>
    (i, if (i % 3 == 0) "en" else "de",
      Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
    .toDF("doc_id", "lang", "text")

  test("temperatureMix: exact isqrt weights, proportional targets, " +
      "rates cap at 10^6 when the budget covers a domain") {
    // Domains a=9, b=4, c=2 docs → isqrt weights 3, 2, 1 (W = 6).
    // Budget 30 divides exactly: targets 15, 10, 5 — every target ≥
    // n_docs, so every rate caps at 10^6 and ALL rows come back.
    val d = ((0L until 9L).map((_, "a")) ++ (9L until 13L).map((_, "b"))
      ++ (13L until 15L).map((_, "c"))).toDF("doc_id", "source")
    val got = TrainPrep.temperatureMix(d, "doc_id", "source", 30L)
      .select("source", "n_docs", "weight", "target", "rate_ppm")
      .distinct().orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      ("a", 9L, 3L, 15L, 1000000L),
      ("b", 4L, 2L, 10L, 1000000L),
      ("c", 2L, 1L, 5L, 1000000L)))
    assert(TrainPrep.temperatureMix(d, "doc_id", "source", 30L)
      .count() == 15)
  }

  test("temperatureMix: largest-remainder apportionment sums targets " +
      "to the budget, biggest remainder first") {
    // Same domains, budget 10: floor shares 5, 3, 1 (remainders 0, 2,
    // 4), one leftover → c (remainder 4) takes it. Σtarget = 10.
    val d = ((0L until 9L).map((_, "a")) ++ (9L until 13L).map((_, "b"))
      ++ (13L until 15L).map((_, "c"))).toDF("doc_id", "source")
    val alloc = TrainPrep.temperatureMix(d, "doc_id", "source", 10L)
      .select("source", "target", "rate_ppm").distinct()
      .as[(String, Long, Long)].collect()
      .map { case (s, t, r) => s -> ((t, r)) }.toMap
    // c's target 2 covers its 2 docs → rate 10^6 → both rows present,
    // carrying target 2. a and b rows (whichever the hash keeps) must
    // carry 5/555555 and 3/750000.
    val expect = Map("a" -> (5L, 555555L), "b" -> (3L, 750000L),
      "c" -> (2L, 1000000L))
    alloc.foreach { case (s, (t, r)) => assert(expect(s) == ((t, r)),
      s"domain $s got ($t, $r)") }
    val gotC = TrainPrep.temperatureMix(d, "doc_id", "source", 10L)
      .where($"source" === "c").select("doc_id")
      .as[Long].collect().sorted
    assert(gotC.toSeq == Seq(13L, 14L))
  }

  test("sampleByHash: deterministic, nested percentages, sane rate") {
    val s20 = TrainPrep.sampleByHash(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    val s20again = TrainPrep.sampleByHash(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    assert(s20 == s20again)
    // nesting: the 10% sample is a subset of the 20% sample
    val s10 = TrainPrep.sampleByHash(docs, "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s20))
    // ~20% of 200 rows, generous bounds for hash variance
    assert(s20.size > 20 && s20.size < 80)
  }

  test("mixWeighted: slices are disjoint hash ranges tagged by source") {
    val a = docs.select($"doc_id")
    val b = docs.select(($"doc_id" + 1000L).as("doc_id"))
    val mixed = TrainPrep.mixWeighted(Seq((a, 80), (b, 20)), "doc_id")
      .select("doc_id", "bucket", "source_id")
      .as[(Long, Long, Int)].collect()
    assert(mixed.forall { case (_, bk, src) =>
      if (src == 0) bk >= 0 && bk < 80 else bk >= 80 && bk < 100 })
    // weights bite: source 0 keeps ~4× more of its corpus than source 1
    val bySrc = mixed.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySrc(0) > 2 * bySrc(1))
    // bad weights refused
    intercept[IllegalArgumentException] {
      TrainPrep.mixWeighted(Seq((a, 50), (b, 20)), "doc_id")
    }
  }

  test("packSequences: per-shard running bins, no document splitting") {
    val packed = TrainPrep.packSequences(docs, "doc_id", "text", "lang", 10)
      .select("doc_id", "lang", "n_tokens", "tokens_before", "bin")
      .as[(Long, String, Long, Long, Long)].collect()
      .sortBy(_._1)
    // bin is exactly floor(tokens_before / budget)
    assert(packed.forall(r => r._5 == r._4 / 10))
    // running sum restarts per shard and is consistent within it
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      assert(ordered.head._4 == 0L)
      ordered.sliding(2).foreach {
        case Array(p, n) => assert(n._4 == p._4 + p._3)
        case _ => ()
      }
    }
    // shards pack independently: both langs start at bin 0
    assert(packed.filter(_._2 == "en").map(_._5).min == 0L)
    assert(packed.filter(_._2 == "de").map(_._5).min == 0L)
  }

  test("sampleWeighted: per-row weights, nested under weight growth, " +
       "weight-100 keeps everything, weight-0 keeps nothing") {
    val d = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) 30 else 70)).toDF("doc_id", "w")
    val kept = TrainPrep.sampleWeighted(d, "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    // deterministic: second run identical
    val kept2 = TrainPrep.sampleWeighted(d, "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == kept2)
    // growing a weight only ADDS rows (hash-prefix nesting)
    val grown = TrainPrep.sampleWeighted(
      d.withColumn("w", lit(90)), "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(grown))
    // boundary weights
    assert(TrainPrep.sampleWeighted(d.withColumn("w", lit(100)),
      "doc_id", "w").count() == 200L)
    assert(TrainPrep.sampleWeighted(d.withColumn("w", lit(0)),
      "doc_id", "w").count() == 0L)
  }

  test("tokenBudget: best-score-first greedy fill, one-doc overrun, " +
       "tie to smallest id, budgets independent per source") {
    val d = Seq(
      // srcA: scores pick order 2 (4 toks), 1 (3 toks), 3 (2 toks).
      // budget 5: doc 2 (before=0) and doc 1 (before=4) selected —
      // doc 1 overruns to 7, doc 3 (before=7) is out.
      (1L, "srcA", 10L, "w w w"),
      (2L, "srcA", 20L, "w w w w"),
      (3L, "srcA", 5L, "w w"),
      // srcB: equal scores ⇒ id order; budget admits only doc 4.
      (4L, "srcB", 9L, "w w w w w"),
      (5L, "srcB", 9L, "w")
    ).toDF("doc_id", "source", "score", "text")
    val out = TrainPrep.tokenBudget(d, "doc_id", "text", "source",
        "score", 5L)
      .select("doc_id", "n_tokens", "tokens_before", "selected")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 4L, true), (2L, 4L, 0L, true), (3L, 2L, 7L, false),
      (4L, 5L, 0L, true), (5L, 1L, 5L, false)))
  }

  test("corpusPipeline: each stage drops for its own reason") {
    val en = "the cat is in the house and the dog is in the yard today"
    val docs = Seq(
      (1L, en),                                   // survives everything
      (2L, en + " extra tail"),                   // near-dup of 1 → dedup drop
      (3L, "der hund ist nicht hier und das war gut so heute morgen"), // de → lang drop
      (4L, "!!! ??? *** !!!"),                    // punct ratio → quality drop
      (5L, "the sun is up and the moon is down all day long again"),   // survives
      (6L, "tiny a"))                             // < 5 tokens → quality drop
      .toDF("doc_id", "text")
    val out = TrainPrep.corpusPipeline(docs, "doc_id", "text", "en",
        numHashes = 8, bands = 4, threshold = 0.5, shards = 2,
        budgetTokens = 10)
      .select("doc_id", "shard", "n_tokens", "tokens_before", "bin")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 5L))
    // packing runs on survivors only, per shard (1 % 2 = 1, 5 % 2 = 1):
    // doc 5 packs AFTER doc 1's 14 tokens → second bin at budget 10
    assert(out.map(_._2).toSeq == Seq(1L, 1L))
    assert(out.find(_._1 == 5L).get._4 == 14L)
    assert(out.find(_._1 == 5L).get._5 == 1L)
  }

  test("stratifiedSplit: per-stratum fractions, frozen test set under " +
       "valPct growth, narrow plan") {
    import spark.implicits._
    val docs = (1L to 2000L).map(i =>
      (i, if (i % 10 == 0) "rare" else "common")).toDF("doc_id", "lang")
    val s1 = graft.operators.TrainPrep
      .stratifiedSplit(docs, "doc_id", "lang", valPct = 10, testPct = 10)
    val byStratum = s1.groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, n) => (l, s) -> n }.toMap
    // each stratum splits independently: the RARE stratum (200 rows)
    // must itself land ~10% in test, not just the pooled corpus
    val rareTest = byStratum.getOrElse(("rare", "test"), 0L)
    assert(rareTest >= 10 && rareTest <= 40,
      s"rare-stratum test count $rareTest implausible for 10% of 200")
    // growing valPct moves rows train→val ONLY; test membership frozen
    val s2 = graft.operators.TrainPrep
      .stratifiedSplit(docs, "doc_id", "lang", valPct = 30, testPct = 10)
    val test1 = s1.where($"split" === "test").select("doc_id")
      .as[Long].collect().toSet
    val test2 = s2.where($"split" === "test").select("doc_id")
      .as[Long].collect().toSet
    assert(test1 == test2, "test set must not move when valPct grows")
    s1.collect()
    assert(!s1.queryExecution.executedPlan.toString.contains("Exchange"),
      "split must be a narrow projection")
  }

  test("chunkWindows: stride positions, clamped tails, short docs; " +
       "plan is shuffle-free") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 words, window 3 stride 2 → j=0..3
      (2L, "x y"),           // shorter than window → one full-doc chunk... at stride starts
      (3L, "solo")           // single word → one chunk
    ).toDF("doc_id", "text")
    val df = graft.operators.TrainPrep.chunkWindows(docs, "doc_id", "text", 3, 2)
    val got = df.as[(Long, Long, String, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, "a b c", 3L), (1L, 1L, "c d e", 3L),
      (1L, 2L, "e f g", 3L), (1L, 3L, "g", 1L),
      (2L, 0L, "x y", 2L),
      (3L, 0L, "solo", 1L)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must be a narrow explode — no shuffle:\n$plan")
  }

  test("corpusPipelineFull: decontamination and scrub stages compose") {
    val en = "the cat is in the house and the dog is in the yard today"
    val leak = "the sun is up and the moon is down all day long again"
    val docs = Seq(
      (1L, en),                                 // survives everything
      (2L, en + " extra tail"),                 // near-dup of 1 → dedup drop
      (3L, leak),                               // shares eval 3-grams → decontam drop
      (5L, "you and me and you and me and a commodity price here today"),
      (7L, "write to a.b@example.com and the story is nice and long today"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "he said the sun is up and left")).toDF("doc_id", "text")
    val out = TrainPrep.corpusPipelineFull(docs, "doc_id", "text", "en",
        numHashes = 8, bands = 4, threshold = 0.5, evalDocs = eval,
        ngram = 3, shards = 2, budgetTokens = 10)
      .select("doc_id", "n_email", "n_tokens", "bin")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 5L, 7L))
    // doc 7's email was counted and scrubbed; [EMAIL] is still 1 token
    assert(out.find(_._1 == 7L).get._2 == 1L)
    assert(out.find(_._1 == 7L).get._3 == 11L)
    // shard 1 = docs 1,5,7: doc 7 packs after 14+13=27 tokens → bin 2
    assert(out.find(_._1 == 7L).get._4 == 2L)
  }

  test("lengthBuckets: next power-of-two assignment with a floor " +
      "bucket; exact padding-waste ppm; power-of-two lengths fit " +
      "their own bucket") {
    import spark.implicits._
    val mk = (n: Int) => Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, mk(3)),    // ≤16 → floor bucket 16, pad 13
      (2L, mk(16)),   // exactly the floor → bucket 16, pad 0
      (3L, mk(17)),   // → 32, pad 15
      (4L, mk(32)),   // power of two fits its own bucket, pad 0
      (5L, mk(33))    // → 64, pad 31
    ).toDF("doc_id", "text")
    val got = graft.operators.TrainPrep
      .lengthBuckets(docs, "doc_id", "text")
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (16L, 2L, 19L, 13L, 13L * 1000000L / 32L),
      (32L, 2L, 49L, 15L, 15L * 1000000L / 64L),
      (64L, 1L, 33L, 31L, 31L * 1000000L / 64L)))
  }

  test("corpusCard: detail rows, per-source subtotals, grand total — " +
      "'(all)' sentinels, exact ppm rates, gate matches qualityScore") {
    import spark.implicits._
    val docs = Seq(
      ("sa", "en", "one two three four five"),   // 5 tokens, keeps
      ("sa", "de", "nur drei worte"),            // 3 tokens < 5 → fails
      ("sb", "en", "a b c d e f")                // 6 tokens, keeps
    ).toDF("source", "lang", "text")
    val got = graft.operators.TrainPrep.corpusCard(docs)
      .orderBy("gid", "source", "lang")
      .select("source", "lang", "gid", "n_docs", "n_keep", "keep_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("sa", "de", 0L, 1L, 0L, 0L),
      ("sa", "en", 0L, 1L, 1L, 1000000L),
      ("sb", "en", 0L, 1L, 1L, 1000000L),
      ("sa", "(all)", 1L, 2L, 1L, 500000L),
      ("sb", "(all)", 1L, 1L, 1L, 1000000L),
      ("(all)", "(all)", 3L, 3L, 2L, 666666L)))
  }

  test("importanceResample: rates clamp to [0, 1e6] and a max-rate " +
      "row always keeps") {
    import spark.implicits._
    val scored = Seq((1L, 0L), (2L, -200000L), (3L, -900000L))
      .toDF("doc_id", "score_ppm")
    val got = graft.operators.TrainPrep
      .importanceResample(scored, "doc_id", "score_ppm", 4L)
      .orderBy("doc_id")
      .select("doc_id", "rate_ppm", "keep")
      .as[(Long, Long, Long)].collect()
    // score 0 → rate 1e6 (every hash draw < 1e6 → always keep);
    // -200000·4 → rate 200000; -900000·4 clamps to 0 → never keep.
    assert(got(0) == ((1L, 1000000L, 1L)), s"got ${got.toSeq}")
    assert(got(1)._2 == 200000L)
    assert(got(2) == ((3L, 0L, 0L)), s"got ${got.toSeq}")
  }

  test("epochPlan: exact isqrt token weights, remainder-free split, " +
      "ppm repeat factors") {
    import spark.implicits._
    // A: 16 tokens (weight isqrt=4), B: 4 tokens (weight 2); budget 12
    // over wtot 6 → A target 8 (0.5 epochs), B target 4 (1.0 epochs).
    val docs = Seq(
      ("A", 1L, "a b c d e f g h"), ("A", 2L, "a b c d e f g h"),
      ("B", 3L, "x y z w")).toDF("source", "doc_id", "text")
    val got = graft.operators.TrainPrep
      .epochPlan(docs, "text", "source", 12L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      ("A", 2L, 16L, 4L, 8L, 500000L),
      ("B", 1L, 4L, 2L, 4L, 1000000L)), s"got ${got.toSeq}")
  }

  test("curriculum: per-shard dense seq, scores monotone along seq, " +
      "phases contiguous and balanced within +-1") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, 1000L - i * 7 % 13)) // shuffled scores
      .toDF("doc_id", "sc")
    val got = graft.operators.TrainPrep
      .curriculum(docs, "doc_id", col("sc"), numShards = 4, numPhases = 3)
      .orderBy("shard", "seq")
      .select("doc_id", "score", "shard", "phase", "seq")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 40)
    got.groupBy(_._3).foreach { case (shard, rows) =>
      // seq dense 1..n within the shard
      assert(rows.map(_._5) == (1L to rows.size))
      // scores non-decreasing, phases non-decreasing along seq
      assert(rows.map(_._2) == rows.map(_._2).sorted, s"shard $shard")
      assert(rows.map(_._4) == rows.map(_._4).sorted, s"shard $shard")
      // ntile balance: phase sizes differ by at most one
      val sizes = rows.groupBy(_._4).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"shard $shard sizes $sizes")
    }
  }
}
