package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenStats counts tokens, words, bpe pieces") {
    val df = Seq((1L, "the cat sat on the mat 42!")).toDF("id", "text")
    val r = TextAnalysis.tokenStats(df, "id", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("n_distinct") == 6L)   // "the" twice
    assert(r.getAs[Long]("n_words") == 7L)      // 42! → one [a-z0-9]+ run
    // bpe: 6 letter runs + '4' + '2' + '!' = 9
    assert(r.getAs[Long]("n_bpe") == 9L)
    assert(r.getAs[Long]("n_token_chars") == 20L)
  }

  test("qualityScore ratios and keep flag") {
    val good = (1L, "the quick brown fox jumps over a lazy dog")
    val punct = (2L, "!!! ??? ***")
    val out = TextAnalysis.qualityScore(Seq(good, punct).toDF("id", "text"),
      "id", "text").collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("quality_keep"))
    assert(!out(2L).getAs[Boolean]("quality_keep"))
    assert(out(2L).getAs[Double]("punct_ratio") > 0.5)
    assert(out(1L).getAs[Long]("n_stopwords") == 2L) // "the", "a"
  }

  test("languageId picks the dominant stopword list") {
    val df = Seq(
      (1L, "the cat is in the house and it is fine"),
      (2L, "der hund ist nicht hier und das ist gut"),
      (3L, "qqq www eee")).toDF("id", "text")
    val out = TextAnalysis.languageId(df, "id", "text")
      .select("id", "lang_guess").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("fused quality counts == unfused three-pass formulation on edges") {
    val edges = Seq(
      "the cat sat on the mat!",   // normal, stopwords, punct
      "",                          // empty → one "" token
      "   ",                       // all spaces → trim → "" token
      "a\tb\t",                    // trailing tab: split -1 keeps "" token
      "\ta b",                     // leading tab survives space-only trim
      "café Ÿ水 ok.",              // non-ASCII codepoints count as punct
      "the the the",               // repeated stopwords
      "xy",                  // \x0B is regex \s: separator, not punct
      "  the  mat  ").zipWithIndex.map(_.swap)
    val df = edges.toDF("id", "text")
    val cols = Seq("id", "n_chars", "n_tokens", "n_punct", "n_stopwords",
      "punct_ratio", "stopword_ratio", "quality_keep")
    val fused = TextAnalysis.qualityScore(df, "id", "text")
      .select(cols.head, cols.tail: _*).orderBy("id")
      .collect().map(_.toSeq).toSeq
    val unfused = TextAnalysis.qualityScoreUnfused(df, "id", "text")
      .select(cols.head, cols.tail: _*).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(fused == unfused)
  }

  test("c4LineClean applies each keep rule independently") {
    val text = Seq(
      "This line is kept just fine.",        // kept
      "short one.",                          // < 3 words → dropped
      "No terminal punctuation here at all", // no ./!/?/quote end → dropped
      "Enable Javascript to continue now.",  // boilerplate word → dropped
      "Accept our cookie policy please.",    // boilerplate word → dropped
      "function f() { return 1; }",          // '{' → dropped
      "Is this a kept question?"             // kept
    ).mkString("\n")
    val out = TextAnalysis.c4LineClean(
        Seq((1L, text)).toDF("id", "text"), "id", "text")
      .select("clean_text", "n_kept", "n_dropped")
      .as[(String, Long, Long)].head()
    assert(out == (("This line is kept just fine.\nIs this a kept question?",
      2L, 5L)))
  }

  test("tfidfTopTerms: corpus-rare terms outrank corpus-common ones") {
    val docs = Seq(
      (1L, "apple banana apple"),   // apple tf=2 df=1; banana tf=1 df=3
      (2L, "banana cherry"),
      (3L, "banana date date")).toDF("id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "id", "text", topN = 2)
      .select("doc_id", "term", "tf", "df", "score_q", "rank")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._6)).toSeq
    assert(out == Seq(
      (1L, "apple", 2L, 1L, 2000000L, 1L),
      (1L, "banana", 1L, 3L, 333333L, 2L),
      (2L, "cherry", 1L, 1L, 1000000L, 1L),
      (2L, "banana", 1L, 3L, 333333L, 2L),
      (3L, "date", 2L, 1L, 2000000L, 1L),
      (3L, "banana", 1L, 3L, 333333L, 2L)))
  }

  test("fingerprint is whitespace-insensitive on content_md5") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world"),
      (3L, "different text here")).toDF("id", "text")
    val out = TextAnalysis.fingerprint(df, "id", "text")
      .select("id", "content_md5").as[(Long, String)].collect().toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("fingerprint min_gram_hash is monotone under append-only edits") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, base), (2L, base + " tail"),
      (3L, base)).toDF("id", "text")
    val out = TextAnalysis.fingerprint(df, "id", "text")
      .select("id", "min_gram_hash").as[(Long, Long)].collect().toMap
    // appending only ADDS windows: the min can only stay or decrease
    assert(out(2L) <= out(1L))
    // identical content → identical sketch
    assert(out(3L) == out(1L))
  }

  test("rolling min-ngram hash: matches direct polynomial evaluation") {
    import graft.functions.RollingHash
    def direct(s: String, n: Int): Long = {
      val cps = s.codePoints().toArray
      (0 to cps.length - n).map { i =>
        (0 until n).foldLeft(0L)((h, k) =>
          (h * RollingHash.Base + cps(i + k)) & RollingHash.Mask)
      }.min
    }
    for (s <- Seq("abcdefgh", "the quick brown fox", "aaaaaaaaaa",
                  "café au lait et encore")) {
      assert(RollingHash.minNgram(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 8) ==
        direct(s, 8), s"mismatch for '$s'")
    }
    // short input: single truncated window (callers pad to avoid this)
    assert(RollingHash.minNgram(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), 8) ==
      direct("abc", 3))
  }

  test("piiScrub redacts emails, IPs, phones and counts matches") {
    val df = Seq(
      (1L, "mail bob.smith+x@mail.co and 192.168.0.1 call +1-555-0199"),
      (2L, "two mails a@b.io c@d.org one ip 10.0.0.255"),
      (3L, "nothing to redact here")).toDF("id", "text")
    val out = TextAnalysis.piiScrub(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_email") == 1L)
    assert(out(1L).getAs[Long]("n_ip") == 1L)
    assert(out(1L).getAs[Long]("n_phone") == 1L)
    assert(out(1L).getAs[String]("scrubbed") ==
      "mail [EMAIL] and [IP] call [PHONE]")
    assert(out(2L).getAs[Long]("n_email") == 2L)
    assert(out(2L).getAs[Long]("n_ip") == 1L)
    assert(out(2L).getAs[Long]("n_phone") == 0L)
    assert(out(3L).getAs[String]("scrubbed") == "nothing to redact here")
  }

  test("repetitionStats: dup fractions and top bigram with tiebreak") {
    // "a b a b a" → words: a×3, b×2 (all duplicated → dup 5/5);
    // bigrams: "a b"×2, "b a"×2 → tie on count, max gram "b a" wins
    val df = Seq((1L, "a b a b a"), (2L, "u v w x y"), (3L, "solo"))
      .toDF("id", "text")
    val out = TextAnalysis.repetitionStats(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_words") == 5L)
    assert(out(1L).getAs[Long]("n_distinct") == 2L)
    assert(out(1L).getAs[Long]("n_dup_tokens") == 5L)
    assert(out(1L).getAs[Long]("dup_frac_ppm") == 1000000L)
    assert(out(1L).getAs[String]("top_bigram") == "b a")
    assert(out(1L).getAs[Long]("top_bigram_n") == 2L)
    assert(out(1L).getAs[Long]("top_bigram_ppm") == 800000L) // 2*2/5
    assert(out(2L).getAs[Long]("n_dup_tokens") == 0L)
    assert(out(2L).getAs[Long]("dup_frac_ppm") == 0L)
    // single-word doc: no bigram — sentinels, not nulls
    assert(out(3L).getAs[String]("top_bigram") == "")
    assert(out(3L).getAs[Long]("top_bigram_n") == 0L)
  }

  test("fused repetitionStats == unfused relational formulation on edges") {
    val df = Seq(
      (1L, "a b a b a"),             // tie bigrams
      (2L, "solo"),                  // no bigram
      (3L, ""),                      // empty → one "" token
      (4L, "  x\ty  "),              // tab inside, spaces out
      (5L, "z z z z z z"),           // one word, one bigram, max dup
      (6L, "p q r p q r p q")).toDF("id", "text")
    val fused = TextAnalysis.repetitionStats(df, "id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val unfused = TextAnalysis.repetitionStatsUnfused(df, "id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(fused == unfused)
  }

  test("fused minhash signature matches a reference implementation") {
    import graft.functions.MinhashSig
    import graft.operators.Dedup
    val params = Dedup.minhashParams(8)
    def ref(text: String): Option[Seq[Long]] = {
      val words = text.trim.split("\\s+")
      if (words.length < 3) return None
      val hashes = (0 to words.length - 3).map { i =>
        words.slice(i, i + 3).mkString(" ").codePoints().toArray
          .foldLeft(0L)((h, c) => (h * 257 + c) & 0xFFFFFFFFL)
      }
      Some(params.map { case (a, b) =>
        hashes.map(h => (a * h + b) % Dedup.MinhashPrime).min
      })
    }
    for (t <- Seq("one two three four five", "a b c",
                  "  spaced   out   tokens here  ", "too few")) {
      val got = Option(MinhashSig.sig(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3,
        params.map(_._1).toArray, params.map(_._2).toArray))
        .map(_.toLongArray().toSeq)
      assert(got == ref(t), s"mismatch for '$t'")
    }
  }

  test("heavyHitters == exact top-k when counts clear the sketch bound; " +
       "partials merge across partitions") {
    import org.apache.spark.sql.functions._
    // skewed synthetic corpus over many partitions: token t_i appears
    // ~1000/i times (Zipf-ish), so top counts far exceed the bound
    val docs = spark.range(1000).repartition(16)
      .select(concat_ws(" ",
        lit("the"), lit("the"),
        when(col("id") % 2 === 0, "of").otherwise("and"),
        when(col("id") % 10 === 0, "rare").otherwise("mid"),
        concat(lit("tail"), col("id"))).as("text"))
    val got = TextAnalysis.heavyHitters(docs, "text", 5, maxMapSize = 64)
      .as[(String, Long)].collect().toSeq
    val want = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(5)
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.head == (("the", 2000L))) // sanity: the skew is real
  }

  test("FreqItemsSketchAgg candidates: no false negatives above the " +
       "error bound even with a tiny saturated map") {
    import org.apache.spark.sql.functions._
    import graft.functions.FreqItemsSketchAgg.freqItemCandidates
    val toks = spark.range(10000).repartition(8)
      .select(when(col("id") % 2 === 0, "hot")
        .otherwise(concat(lit("t"), col("id"))).as("token"))
    val cr = toks.agg(freqItemCandidates(col("token"), 8).as("c"))
      .select(col("c.max_error"), col("c.candidates")).head()
    assert(cr.getLong(0) > 0L) // the tiny map must have pruned
    val cands = cr.getSeq[String](1)
    // count('hot') = 5000 > the Misra-Gries error bound of a saturated
    // 8-slot map over n=10000 (≈ n/maxMapSize), so NO_FALSE_NEGATIVES
    // must surface it no matter how the 5000 singletons churn the map
    assert(cands.contains("hot"), s"candidates were: $cands")
  }

  test("heavyHitters REFUSES a flat corpus whose k-th count cannot clear " +
       "the sketch error bound (undersized maxMapSize)") {
    import org.apache.spark.sql.functions._
    // all-distinct tokens: every count is 1, far below the saturated
    // 8-slot sketch's error bound — a silent top-k here would be noise
    val docs = spark.range(2000).repartition(8)
      .select(concat(lit("t"), col("id")).as("text"))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(docs, "text", 5, maxMapSize = 8)
    }
    assert(e.getMessage.contains("maximum error"))
  }

  test("bm25TopK: rare-term hits outrank common-term hits; repeated " +
      "terms saturate instead of growing linearly; ties break by doc_id") {
    import spark.implicits._
    // 'rare' is in 1 of 4 docs; 'common' in all 4. Query both.
    val docs = Seq(
      (1L, "rare common alpha beta"),
      (2L, "common alpha beta gamma"),
      (3L, "common common common alpha"),
      (4L, "common beta gamma delta")).toDF("doc_id", "text")
    val got = TextAnalysis
      .bm25TopK(docs, "doc_id", "text", Seq(1L -> "rare common"), 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1 carries the rare term — must be rank 1 by a wide margin.
    assert(got.head._1 == 1L, s"got ${got.toSeq}")
    val scores = got.map(_._2)
    assert(scores.head > scores(1) * 2,
      s"rare-term doc should dominate: ${got.toSeq}")
    // doc 3 has tf=3 of 'common': saturation keeps it < 3× docs 2/4,
    // but it still outranks the tf=1 docs of equal length.
    val byDoc = got.map(t => t._1 -> t._2).toMap
    assert(byDoc(3L) > byDoc(2L) && byDoc(3L) < 3L * byDoc(2L))
    // docs 2 and 4 have identical (tf, dl): exact tie, doc_id order.
    assert(byDoc(2L) == byDoc(4L))
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L, 4L))
  }

  test("bm25TopK: documents with no query term never rank; per-query " +
      "ranking runs as bounded TopKPerKey heaps, not Sort+Window") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "nothing matches here"))
      .toDF("doc_id", "text")
    val q = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq(1L -> "alpha", 2L -> "beta"), 3)
    assert(q.select("doc_id").distinct().collect().map(_.getLong(0))
      .toSet == Set(1L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("WindowExec"), s"plan was:\n$plan")
  }

  test("lmSurprisal: formulaic text scores fewer bits than a one-off " +
      "sequence; short docs appear with zeros; bits match hand math") {
    import spark.implicits._
    // Corpus: "a b" repeated is the high-probability pattern; doc 3 is
    // a bigram the LM saw once. Vocabulary V = {a, b, x, y} = 4.
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b a b"),
      (3L, "x y"),
      (4L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.lmSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Hand math (c1 counts bigram PREFIXES, so doc-final tokens don't
    // count): c(a,b)=5, c(b,a)=3, c(x,y)=1; c1(a)=5, c1(b)=3, c1(x)=1;
    // V=5 ({a,b,x,y,solo}).
    // bits(a,b) = len(bin((5+5) div 6)) = len(bin(1)) = 1
    // bits(b,a) = len(bin((3+5) div 4)) = len(bin(2)) = 2
    // bits(x,y) = len(bin((1+5) div 2)) = len(bin(3)) = 2
    val byDoc = got.map(t => (t._1, (t._2, t._3, t._4))).toMap
    assert(byDoc(1L) == ((5L, 3L * 1 + 2L * 2, (7L * 1000000L) / 5L)))
    assert(byDoc(3L) == ((1L, 2L, 2000000L)))
    assert(byDoc(4L) == ((0L, 0L, 0L)))  // no bigrams — zeros, not absent
    // Formulaic doc 1 (dominated by the common bigram) scores below the
    // unique-bigram doc 3 per-bigram.
    assert(byDoc(1L)._3 < byDoc(3L)._3)
  }

  test("bpePairCounts: corpus-frequency-weighted adjacent pairs, " +
      "counted once per word occurrence; 1-char words contribute none") {
    import spark.implicits._
    // 'abab' ×2 occurrences, 'ab' ×1, 'x' ×1 (no pairs).
    // pairs: abab → ab, ba, ab (i.e. ab×2, ba×1 per occurrence).
    // totals: ab = 2·2 + 1 = 5, ba = 2·1 = 2.
    val docs = Seq((1L, "abab ab x"), (2L, "abab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(docs, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("ab", 5L, 1L), ("ba", 2L, 2L)))
  }

  test("bpePairCounts plan: pair explosion runs on the vocabulary " +
      "aggregate, and the global top-N is a bounded TakeOrdered") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb aa")).toDF("doc_id", "text")
    val q = TextAnalysis.bpePairCounts(docs, "text", 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
    // The corpus explode (tokens) must appear BELOW the word-count
    // aggregate; the pair explode above it — i.e. two generators with
    // an aggregate between them, never pairs-over-corpus.
    val agg = plan.indexOf("HashAggregate")
    assert(agg >= 0 && plan.lastIndexOf("Generate") > agg &&
      plan.indexOf("Generate") < plan.lastIndexOf("Generate"),
      s"plan was:\n$plan")
  }

  test("bpeTrain: multi-round Sennrich loop with leftmost " +
      "non-overlapping merge application") {
    import spark.implicits._
    // Vocabulary: aaaa ×2, ab ×1.
    // Round 1: (a,a) = 3 pairs/occurrence × 2 = 6  → merge (a,a).
    //   Leftmost non-overlap: aaaa → [aa, aa]  (NOT [aa, a, a] thrice).
    // Round 2: (aa,aa) = 2 beats (a,b) = 1       → merge (aa,aa).
    // Round 3: only ab has a pair left           → merge (a,b) n=1.
    val docs = Seq((1L, "aaaa aaaa ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "aa", "aa", "aaaa", 2L),
      (3L, "a", "b", "ab", 1L)))
  }

  test("bpeTrain: odd-run merges keep the odd starts ([aa, a] from " +
      "aaa) and count ties break to the smallest (lhs, rhs)") {
    import spark.implicits._
    // 'aaa': round 1 adopts (a,a) (n=2: both adjacent pairs of the one
    // occurrence) and rewrites to [aa, a]; round 2 then merges (aa,a).
    val odd = Seq((1L, "aaa")).toDF("doc_id", "text")
    val gotOdd = TextAnalysis.bpeTrain(odd, "text", 2).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
    assert(gotOdd.toSeq == Seq((1L, "aa", 2L), (2L, "aaa", 1L)))
    // (b,c) and (c,b) both have weight 2 — the tie goes to (b,c).
    val tie = Seq((1L, "bc cb"), (2L, "cb bc")).toDF("doc_id", "text")
    val gotTie = TextAnalysis.bpeTrain(tie, "text", 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(gotTie.toSeq == Seq(("b", "c", 2L)))
  }

  test("bpeEncode: per-doc token counts under the learned merges, " +
      "never re-segmenting the corpus") {
    import spark.implicits._
    // Vocab: aaaa ×2, ab ×2, x ×1. Round 1 merges (a,a) (n=6) →
    // aaaa = [aa, aa]. Round 2: (aa,aa) and (a,b) tie at n=2 — the tie
    // goes to (a,b) → ab = [ab]. Final tokens: aaaa→2, ab→1, x→1.
    val docs = Seq((1L, "aaaa aaaa ab"), (2L, "ab x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      // doc 1: 3 words, 10 chars, 2+2+1 = 5 tokens → 500000 ppm
      (1L, 3L, 10L, 5L, 500000L),
      // doc 2: 2 words, 3 chars, 1+1 = 2 tokens → 666666 ppm (floor)
      (2L, 2L, 3L, 2L, 666666L)))
  }

  test("lineDedup: corpus-frequent lines drop from every doc; order " +
      "and unique lines survive; an all-boilerplate doc stays as ''") {
    import spark.implicits._
    // 'x' appears in all 3 docs, 'y' in two, 'z'/'w' once each. At
    // threshold 2 both x and y are boilerplate (case/space-insensitive:
    // doc 2 carries ' X ' and still matches).
    val docs = Seq(
      (1L, "x\ny\nz"),
      (2L, " X \nY\nw"),
      (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, "z", 1L, 2L),
      (2L, "w", 1L, 2L),
      (3L, "", 0L, 1L)))
    // Threshold 3: only the 3-way line is boilerplate; y survives.
    val got3 = TextAnalysis.lineDedup(docs, "doc_id", "text", 3L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(got3.toSeq == Seq(
      (1L, "y\nz", 2L, 1L),
      (2L, "Y\nw", 2L, 1L),
      (3L, "", 0L, 1L)))
  }

  test("bpeTrain: asking for more rounds than the vocabulary can merge " +
      "fails loudly, naming the exhausted round") {
    import spark.implicits._
    // 'ab' fully merges in one round; round 2 has no pair left.
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(docs, "text", 2)
    }
    assert(err.getMessage.contains("fully merged after 1 rounds"))
  }

  test("qualityModelScore: exact integer logit and threshold on " +
      "hand-computed features") {
    import spark.implicits._
    // doc 1: 4 tokens, 2 stopwords ("the","of"), 15 chars, 0 punct:
    //   stop_ppm 500000, punct_ppm 0, len_bits 3 (bin(4)=100)
    //   score = 3*500000 + 20000*3 - 300000 = 1260000 > 0 → keep
    // doc 2: 2 tokens "!!!" "???" → 6 punct of 7 chars:
    //   stop_ppm 0, punct_ppm 857142, len_bits 2 (bin(2)=10)
    //   score = -5*857142 + 20000*2 - 300000 = -4545710 → drop
    val docs = Seq((1L, "the cat of hats"), (2L, "!!! ???"))
      .toDF("doc_id", "text")
    val got = TextAnalysis
      .qualityModelScore(docs, "doc_id", "text", 3L, 5L, 20000L, 300000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 500000L, 0L, 3L, 1260000L, 1L),
      (2L, 0L, 857142L, 2L, -4545710L, 0L)), s"got ${got.toSeq}")
  }

  test("dsirScore: documents made of target-corpus vocabulary " +
      "outscore documents made of base-only vocabulary") {
    import spark.implicits._
    // targets speak {alpha, beta}; non-targets speak {gamma, delta};
    // doc 5 mixes both and must land strictly between.
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha alpha beta beta", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "delta delta gamma gamma", false),
      (5L, "alpha beta gamma delta", false)
    ).toDF("doc_id", "text", "tgt")
    val got = TextAnalysis.dsirScore(docs, "doc_id", "text",
        org.apache.spark.sql.functions.col("tgt"))
      .orderBy("doc_id")
      .select("doc_id", "score_ppm")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L) && got(3L) == got(4L))
    assert(got(1L) > got(5L) && got(5L) > got(3L),
      s"expected target > mixed > base-only, got $got")
  }

  test("pmiCollocations: exact ppm ratios, floor division, total " +
      "tie-break, and the minCount gate") {
    import spark.implicits._
    // Bigrams: (x,y)×2, (x,z)×1, (w,z)×1; T=4; cl: x=3 w=1; cr: y=2 z=2.
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "w z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text", 1L, 10)
      .orderBy("rank")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      ("w", "z", 1L, 2000000L, 1L),   // 1·4·10⁶ / (1·2)
      ("x", "y", 2L, 1333333L, 2L),   // 2·4·10⁶ / (3·2), floored
      ("x", "z", 1L, 666666L, 3L)),   // 1·4·10⁶ / (3·2), floored
      s"got ${got.toSeq}")
    val gated = TextAnalysis.pmiCollocations(docs, "text", 2L, 10)
      .select("w1", "w2").as[(String, String)].collect()
    assert(gated.toSeq == Seq(("x", "y")))
  }

  test("unigramVocab: every corpus character is covered, even " +
      "outside the multi-piece top-N; costs order by frequency") {
    val docs = Seq((1L, "abab abab abab zq")).toDF("doc_id", "text")
    val v = TextAnalysis.unigramVocab(docs, "text", 4, 2)
      .select("piece", "occ", "cost_q")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // single chars a,b,z,q all present despite topMulti = 2
    assert(Set("a", "b", "z", "q").subsetOf(v.keySet))
    // the dominant multi piece made the cut; a rare one costs more
    assert(v.contains("ab"))
    assert(v("ab")._3 <= v("z")._3,
      s"frequent piece must not cost more bits than a rare one: $v")
  }

  test("unigramEncode: the aggregate-fold DP equals brute-force " +
      "min-(bits, pieces) segmentation on every word") {
    val docs = Seq(
      (1L, "abab abab xy"),
      (2L, "abab cdcd cdcd"),
      (3L, "zq abab cdcd")).toDF("doc_id", "text")
    val maxPiece = 4
    val top = 8
    val vocab = TextAnalysis.unigramVocab(docs, "text", maxPiece, top)
      .select("piece", "cost_q").as[(String, Long)].collect().toMap
    def bruteWord(w: String): (Long, Long) = {
      val memo = scala.collection.mutable.Map[Int, (Long, Long)]()
      def go(i: Int): (Long, Long) =
        if (i == 0) (0L, 0L)
        else memo.getOrElseUpdate(i,
          (1 to math.min(maxPiece, i)).flatMap { k =>
            vocab.get(w.substring(i - k, i)).map { c =>
              val (pb, pn) = go(i - k)
              (pb + c, pn + 1L)
            }
          }.min)
      go(w.length)
    }
    val want = docs.as[(Long, String)].collect().map { case (id, text) =>
      val ws = text.trim.toLowerCase.split("\\s+")
      val st = ws.map(bruteWord)
      id -> ((ws.length.toLong, st.map(_._2).sum, st.map(_._1).sum))
    }.toMap
    val got = TextAnalysis
      .unigramEncode(docs, "doc_id", "text", maxPiece, top)
      .select("doc_id", "n_words", "n_pieces", "bits_total")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want, s"got $got want $want")
  }

  test("unigramEmVocab: EM piece counts are CONSISTENT with the " +
      "encode totals (Σ seg_occ = Σ per-doc n_pieces), every counted " +
      "piece is in the original vocabulary, and never-used pieces " +
      "are pruned") {
    val docs = Seq(
      (1L, "abab abab xy"),
      (2L, "abab cdcd cdcd"),
      (3L, "zq abab cdcd")).toDF("doc_id", "text")
    val em = TextAnalysis.unigramEmVocab(docs, "text", 4, 8)
      .select("piece", "seg_occ").as[(String, Long)].collect().toMap
    val v1 = TextAnalysis.unigramVocab(docs, "text", 4, 8)
      .select("piece").as[String].collect().toSet
    assert(em.keySet.subsetOf(v1), "EM can only recount v1 pieces")
    assert(em.keySet.size < v1.size,
      "some v1 pieces must be pruned (never on an optimal path)")
    val totalPieces = TextAnalysis
      .unigramEncode(docs, "doc_id", "text", 4, 8)
      .agg(org.apache.spark.sql.functions.sum("n_pieces"))
      .as[Long].head()
    assert(em.values.sum == totalPieces,
      s"EM counts ${em.values.sum} vs encode total $totalPieces")
  }
}
