package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactDedup keeps lowest id and counts the group") {
    val df = Seq(
      (1L, "alpha"), (2L, "alpha"), (5L, "alpha"),
      (3L, "beta"), (4L, "gamma")).toDF("id", "text")
    val out = Dedup.exactDedup(df, "id", Seq("text"))
      .select("id", "text", "dup_count").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "alpha", 3L), (3L, "beta", 1L), (4L, "gamma", 1L)))
  }

  test("shingles: distinct word 3-grams; short text yields empty array") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y z x y z x y z"))
      .toDF("id", "text")
    val out = df.select($"id", Dedup.shingles($"text").as("sh"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(out(0)._2.sorted == Seq("a b c", "b c d"))
    assert(out(1)._2.isEmpty)
    // 7 positions but only 3 distinct shingles in the repeating text
    assert(out(2)._2.length == 3)
  }

  test("identical docs share the full minhash signature; LSH pairs them") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now today friends"))
      .toDF("id", "text")
    val sig = Dedup.minhashSignature(df, "id", "text", 8)
    val rows = sig.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L) != rows(3L))
    val pairs = Dedup.lshCandidatePairs(sig, "id", 8, 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("simhash is deterministic and identical for identical text") {
    val df = Seq((1L, "spark scala engine"), (2L, "spark scala engine"),
      (3L, "other stuff")).toDF("id", "text")
    val out = Dedup.simhash32(df, "id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    val again = Dedup.simhash32(df, "id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out == again)
  }

  test("jaccardPairs computes exact set overlap") {
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),   // |∩|=3 |∪|=5 → 0.6
      (3L, "x y"))
      .toDF("id", "text")
    val out = Dedup.jaccardPairs(df, "id", "text", 100L, 0.5)
      .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L, 5L, 0.6)))
  }

  test("jaccardOfPairs verifies exactly the candidate pairs") {
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),   // |∩|=3 |∪|=5 → 0.6
      (3L, "a b c d"),   // identical to 1 → 1.0
      (4L, "x y z"))
      .toDF("id", "text")
    // candidates: the real pair, an identical pair, and a FALSE POSITIVE
    // (1,4) that exact verification must reject below threshold
    val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val out = Dedup.jaccardOfPairs(df, cands, "id", "text", 0.5)
      .orderBy("doc_a", "doc_b")
      .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L, 5L, 0.6), (1L, 3L, 4L, 4L, 1.0)))
    // non-candidate pair (2,3) is never scored even though it overlaps
    assert(!out.exists(p => p._1 == 2L && p._2 == 3L))
  }

  test("connectedComponents: transitive chains, singletons, cluster sizes") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
      (9L, "lonely")).toDF("id", "text")
    // chain 1-2, 2-3 (3 reaches 1 only transitively) + pair 4-5;
    // 9 touches no pair and must label itself as a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(docs, pairs, "id")
      .select("id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L),
      (9L, 9L, 1L)))
  }

  test("connectedComponents: 200-node chain converges in O(log n) rounds") {
    // A paraphrase chain A≈B≈C≈… — diameter 199, far past the round
    // budget of plain min-label propagation (which needs diameter-many
    // rounds and would abort at maxIter=20). Large-star/small-star must
    // collapse it within the default bound. Ids descend so the minimum
    // sits at the FAR end of the chain from the id order.
    val n = 200
    val docs = (1 to n).map(i => (i.toLong, s"d$i")).toDF("id", "text")
    val pairs = (1 until n).map(i => (i.toLong, i.toLong + 1))
      .toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(docs, pairs, "id")
      .select("id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(out.length == n)
    assert(out.forall { case (_, cid, sz) => cid == 1L && sz == n.toLong })
  }

  test("containmentOfPairs: oriented subsumption both ways, threshold " +
       "cuts the reverse direction") {
    val docs = Seq(
      (1L, "a b c"),           // ⊂ 2 exactly (containment 1.0)
      (2L, "a b c d e f g h"), // reverse: 3/8 — far under threshold
      (3L, "a b c")            // == 1: both directions contain
    ).toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.containmentOfPairs(docs, pairs, "id", "text", 0.9)
      .select("contained_id", "container_id", "n_inter", "n_contained",
        "containment")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 2L, 3L, 3L, 1.0),   // 1 ⊂ 2; 2 ⊄ 1 (3/8 < 0.9)
      (1L, 3L, 3L, 3L, 1.0), (3L, 1L, 3L, 3L, 1.0)))
  }

  test("clusterCanonical: per-cluster score argmax, ties to smallest id, " +
       "singleton is its own canonical") {
    val docs = Seq(
      // chain cluster {1,2,3}: 2 has the top score ⇒ canonical
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 20L),
      // pair {4,5}: equal scores ⇒ tie-break keeps 4
      (4L, "d", 7L), (5L, "e", 7L),
      (9L, "lonely", 1L)).toDF("id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterCanonical(docs, pairs, "id", "score")
      .select("id", "cluster_id", "cluster_size", "canonical_id",
        "is_canonical")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1L, 3L, 2L, false), (2L, 1L, 3L, 2L, true),
      (3L, 1L, 3L, 2L, false),
      (4L, 4L, 2L, 4L, true), (5L, 4L, 2L, 4L, false),
      (9L, 9L, 1L, 9L, true)))
  }

  test("fuzzyPairs: block-mates within the edit budget; non-ASCII stripped") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "Thé quick brown fox jumps over the lazy dot"),  // é stripped → 'th' prefix differs? no: 'thé'→'th'
      (3L, "The quick brown cat naps all day long"),        // same block, far
      (4L, "Completely different opening line here")).toDF("id", "text")
    val out = Dedup.fuzzyPairs(docs, "id", "text",
        blockLen = 8, cmpLen = 80, maxDist = 5, maxBlock = 200)
      .select("doc_a", "doc_b", "edit_dist")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc2 normalizes to "th quick brown..." (é removed) — its BLOCK
    // ("th quick") differs from doc1/doc3's ("the quic"), so it pairs
    // with nothing; doc1/doc3 share a block but are 18 edits apart.
    assert(out == Seq.empty)
    val relaxed = Dedup.fuzzyPairs(docs, "id", "text",
        blockLen = 8, cmpLen = 80, maxDist = 20, maxBlock = 200)
      .select("doc_a", "doc_b", "edit_dist")
      .as[(Long, Long, Long)].collect().toSeq
    assert(relaxed == Seq((1L, 3L, 18L)))
  }

  test("fuzzyPairs maxBlock: an oversized block is excluded before the " +
      "quadratic join; bounded blocks still pair") {
    // 5 copies sharing one block (mass duplication) + 2 docs in a
    // bounded block: with maxBlock = 4 the 5-copy block contributes
    // ZERO pairs (its 10 comparisons never run), the pair in the
    // bounded block survives.
    val mass = (1 to 5).map(i => (i.toLong, s"same opening line copy $i"))
    val ok = Seq((10L, "other text entirely here"),
                 (11L, "other text entirelX here"))
    val docs = (mass ++ ok).toDF("id", "text")
    val out = Dedup.fuzzyPairs(docs, "id", "text",
        blockLen = 8, cmpLen = 80, maxDist = 5, maxBlock = 4)
      .select("doc_a", "doc_b", "edit_dist")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 11L, 1L)), s"got $out")
  }

  test("dropNearDuplicates removes the greater id of every pair") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z"))
      .toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("doc_a", "doc_b")
    val kept = Dedup.dropNearDuplicates(df, pairs, "id")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // 2 and 4 dropped; low ids survive
  }

  test("fused shingles == HOF shingles on edge inputs") {
    val df = Seq("one two three four", "a b", "", "  x   y  z ",
      "dup dup dup dup", "t1\tt2\tt3 t4", "solo")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3); d <- Seq(true, false)) {
      val fused = df.select(col("id"), Dedup.shingles(col("text"), n, d))
        .orderBy("id").collect().map(_.toSeq).toSeq
      val hof = df.select(col("id"), Dedup.shinglesHof(col("text"), n, d))
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(fused == hof, s"n=$n distinct=$d")
    }
  }

  test("contaminationAudit counts distinct eval-overlapping n-grams") {
    val eval = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val train = Seq(
      // shares 'alpha beta gamma' AND 'beta gamma delta' (2 hits),
      // the repeat of the window counts once (distinct per doc)
      (1L, "alpha beta gamma delta alpha beta gamma delta"),
      (2L, "alpha beta gamma zzz"), // 1 hit
      (3L, "zzz yyy xxx www"),      // clean
      (4L, "a b")                   // too short for any 3-gram
    ).toDF("id", "text")
    val out = Dedup.contaminationAudit(train, eval, "id", "text", 3)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (2L, true))
    assert(out(2L) == (1L, true))
    assert(out(3L) == (0L, false))
    assert(out(4L) == (0L, false)) // zero-shingle docs still audited
  }

  test("decontaminateBloom == exact decontaminate (drop set identical)") {
    val eval = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta alpha"), // contaminated
      (2L, "alpha beta gamma zzz"),         // contaminated
      (3L, "zzz yyy xxx www"),              // clean
      (4L, "a b")                           // too short: clean
    ).toDF("id", "text")
    val exact = Dedup.decontaminate(train, eval, "id", "text", 3)
      .select("id").as[Long].collect().sorted
    val bloom = Dedup.decontaminateBloom(train, eval, "id", "text", 3)
      .select("id").as[Long].collect().sorted
    assert(exact.toSeq == Seq(3L, 4L))
    assert(bloom.toSeq == exact.toSeq)
  }

  test("decontaminateBloom: a saturated (high-fpp) sketch still yields " +
       "the exact result — verify join kills every false positive") {
    val eval = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val train = (1L to 40L).map(i =>
      (i, s"tok$i tok${i + 1} tok${i + 2} tok${i + 3}"))
      .toDF("id", "text")
      .unionAll(Seq((99L, "alpha beta gamma x")).toDF("id", "text"))
    // expectedItems=1 at fpp=0.5 → a tiny, heavily-overloaded bit array:
    // most clean grams probe TRUE, so correctness rests on the verify join.
    val out = Dedup.decontaminateBloom(train, eval, "id", "text", 3,
        expectedEvalGrams = 1L, fpp = 0.5)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == (1L to 40L))
  }

  test("BloomMightContainExpr: zero false negatives over inserted grams") {
    import graft.functions.BloomMightContain._
    val grams = (1 to 500).map(i => s"gram number $i").toDF("g")
    val bytes = buildOverStrings(grams, "g", 500L, 0.03)
    val misses = grams.filter(!bloomMightContain(bytes, col("g"))).count()
    assert(misses == 0L) // bloom filters never false-negative
  }

  test("substringSpans: shared run merges into one maximal span, " +
      "cross-doc and self-repeat both count, unique text is span-free") {
    import spark.implicits._
    // docs 1 and 2 share the run "a b c d e" (w=3 ⇒ positions 1..3
    // duplicated in both); doc 3 repeats its own window "x y z" twice
    // (self-repeat at positions 1 and 4); doc 4 is unique.
    val df = Seq(
      (1L, "a b c d e q r"),
      (2L, "p a b c d e"),
      (3L, "x y z x y z"),
      (4L, "unique words only here")).toDF("doc_id", "text")
    val got = Dedup.substringSpans(df, "doc_id", "text", 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 5L, 3L),   // windows 1..3 merge; span covers tokens 1..5
      (2L, 2L, 6L, 3L),   // same run shifted by the 'p' prefix
      (3L, 1L, 3L, 1L),   // "x y z" at pos 1 and 4: the self-repeat
      (3L, 4L, 6L, 1L)))  // yields two islands (pos 2,3 not duplicated)
  }

  test("substringStats: coverage is the union of overlapping windows; " +
      "zero-span docs appear with zeros") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e q r"),     // dup windows at 1..3 ⇒ 5 of 7 tokens
      (2L, "p a b c d e"),
      (3L, "unique words only here")).toDF("doc_id", "text")
    val got = Dedup.substringStats(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 7L, 5L, 5L * 1000000L / 7L),
      (2L, 6L, 5L, 5L * 1000000L / 6L),
      (3L, 4L, 0L, 0L)))
  }

  test("substringDrop: non-first occurrences trimmed, corpus-wide first " +
      "survives, self-repeat keeps its first copy, unique docs untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e q r"),      // holds the FIRST "a b c d e" run
      (2L, "p a b c d e"),        // its copy → tokens 2..6 removed
      (3L, "unique words only here"),
      (4L, "x y z x y z")         // self-repeat → second copy removed
    ).toDF("doc_id", "text")
    val got = Dedup.substringDrop(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 7L, 0L, "a b c d e q r"),
      (2L, 6L, 5L, "p"),
      (3L, 4L, 0L, "unique words only here"),
      (4L, 6L, 3L, "x y z")))
  }

  test("substringDrop: a fully-duplicated document empties to '' " +
      "(never null)") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.substringDrop(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 0L, "a b c"), (2L, 3L, "")))
  }

  test("substringDrop end-to-end on the fixture: re-scanning the " +
      "cleaned corpus finds almost no duplicated windows (only " +
      "seam-formed ones survive)") {
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val before = Dedup.substringSpans(docs, "doc_id", "text", 4)
      .agg(sum("n_windows")).head().getLong(0)
    val cleaned = Dedup.substringDrop(docs, "doc_id", "text", 4)
      .where(col("text_clean") =!= "")
      .select(col("doc_id"), col("text_clean").as("text"))
    val after = Dedup.substringSpans(cleaned, "doc_id", "text", 4)
      .agg(coalesce(sum("n_windows"), lit(0L))).head().getLong(0)
    // Removal can create NEW windows where a span's neighbors become
    // adjacent (documented); they are a sliver of the original dups.
    assert(before > 100, s"fixture should have real duplication: $before")
    assert(after < before / 10, s"dup windows $before -> $after")
  }

  test("substringSpans: no duplicated-window text ever reaches an " +
      "exchange (digests only)") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val plan = Dedup.substringSpans(df, "doc_id", "text", 3)
      .queryExecution.optimizedPlan.toString
    // The only string column surviving past the scan projection is the
    // md5 digest `g`; the raw token windows are consumed scan-side.
    assert(!plan.contains("array_join") ||
      plan.indexOf("Exchange") == -1 ||
      plan.indexOf("md5") < plan.indexOf("Exchange"),
      s"plan was:\n$plan")
  }
}
