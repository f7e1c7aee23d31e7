package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis kernel for training-data pipelines (SURVEY.md §7.2 M5):
  * token statistics, quality scoring, n-gram-list language ID, and
  * document fingerprinting.
  *
  * Everything is a narrow per-row transform built from codegen'd
  * built-ins (regexp, higher-order functions, md5) — no UDFs, no
  * shuffles; at 100 TB each of these runs as a pure map stage over the
  * parquet scan with full column pruning.
  */
object TextAnalysis {

  val wordPattern = "[a-z0-9]+"
  /** BPE-ish pre-tokenizer: letter runs, single digits, single symbols. */
  val bpePattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  /** Small public stopword lists for the n-gram language-ID heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
    "zh" -> Seq("的", "了", "是", "在", "我"))

  private def toks(textCol: Column): Column =
    split(trim(textCol), "\\s+")

  private def countIn(w: Column, words: Seq[String]): Column =
    size(filter(w, t => t.isin(words: _*))).cast(LongType)

  /** Token statistics: whitespace tokens, regex word tokens, BPE-ish
    * tokens, distinct words, mean token length. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = toks(col(textCol))
    val words = regexp_extract_all(col(textCol), lit(wordPattern), lit(0))
    val nTok = size(w).cast(LongType)
    val charSum = aggregate(transform(w, t => length(t).cast(LongType)),
      lit(0L), (acc, v) => acc + v)
    df.select(col(idCol),
      nTok.as("n_tokens"),
      size(array_distinct(w)).cast(LongType).as("n_distinct"),
      size(words).cast(LongType).as("n_words"),
      size(regexp_extract_all(col(textCol), lit(bpePattern), lit(0)))
        .cast(LongType).as("n_bpe"),
      charSum.as("n_token_chars"),
      when(nTok > 0, charSum.cast(DoubleType) / nTok).otherwise(lit(0.0))
        .as("avg_token_len"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, and a
    * composite keep/drop flag — the standard cheap pre-filter before
    * expensive dedup/similarity passes. All four counts come from ONE
    * fused text pass ([[graft.functions.QualityCounts]], a native
    * codegen Expression): the previous formulation paid a token split,
    * a stopword HOF filter, and a full `regexp_replace` string rebuild
    * — three walks over every document. Semantics (and the oracle) are
    * unchanged; [[TextAnalysisSpec]] pins fused == unfused on the edge
    * inputs (trailing tabs, all-space, unicode, empty). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = graft.functions.QualityCounts
      .qualityCounts(col(textCol), stopwords.toMap.apply("en"))
    qualityFromCounts(df, idCol, c)
  }

  /** The ORIGINAL three-pass formulation, kept as the spec reference
    * for the fused expression (not used by the registry). */
  def qualityScoreUnfused(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val w = toks(col(textCol))
    val c = array(
      length(col(textCol)).cast(LongType),
      size(w).cast(LongType),
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "[^A-Za-z0-9\\s]", "")))
        .cast(LongType),
      countIn(w, stopwords.toMap.apply("en")))
    qualityFromCounts(df, idCol, c)
  }

  private def qualityFromCounts(df: DataFrame, idCol: String,
                                c: Column): DataFrame = {
    val nChars = c.getItem(0)
    val nTok = c.getItem(1)
    val nPunct = c.getItem(2)
    val nStop = c.getItem(3)
    val punctRatio = when(nChars > 0, nPunct.cast(DoubleType) / nChars)
      .otherwise(lit(0.0))
    val stopRatio = when(nTok > 0, nStop.cast(DoubleType) / nTok)
      .otherwise(lit(0.0))
    df.select(col(idCol),
      nChars.as("n_chars"), nTok.as("n_tokens"), nPunct.as("n_punct"),
      nStop.as("n_stopwords"),
      punctRatio.as("punct_ratio"), stopRatio.as("stopword_ratio"),
      (nTok >= 5 && nTok <= 100000 && punctRatio < 0.2)
        .as("quality_keep"))
  }

  /** Language ID: score each language's stopword list against the token
    * bag; argmax with a fixed tiebreak order (list order above).
    * All 5 counts come from ONE fused token pass
    * ([[graft.functions.StopwordCounts]], a native codegen Expression) —
    * the previous formulation ran 5 separate `filter(w, isin(...))`
    * HOF passes, each re-walking and re-allocating the token array, and
    * was the slowest query in the bench. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = graft.functions.StopwordCounts
      .stopwordCounts(col(textCol), stopwords.map(_._2))
    val scored = df.select(
      (col(idCol) +: stopwords.zipWithIndex.map { case ((l, _), i) =>
        c.getItem(i).as(s"s_$l") }): _*)
    val best = greatest(stopwords.map { case (l, _) => col(s"s_$l") }: _*)
    val guess = stopwords.foldRight(lit("und"): Column) { case ((l, _), e) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(e)
    }
    // foldRight builds WHEN en ... WHEN zh ... ELSE und — first match in
    // list order wins, matching the oracle's CASE chain.
    scored.withColumn("lang_guess", guess)
  }

  /** The quality keep/drop decision as a standalone COLUMN — the same
    * fused counts and thresholds as [[qualityScore]], usable as a bare
    * `where` predicate (no join against a metrics frame). Codegen CSE
    * dedupes the repeated fused-counts subexpression. */
  def qualityKeepCol(textCol: Column): Column = {
    val c = graft.functions.QualityCounts
      .qualityCounts(textCol, stopwords.toMap.apply("en"))
    val nChars = c.getItem(0)
    val nTok = c.getItem(1)
    val punctRatio = when(nChars > 0,
      c.getItem(2).cast(DoubleType) / nChars).otherwise(lit(0.0))
    nTok >= 5 && nTok <= 100000 && punctRatio < 0.2
  }

  /** The language guess as a standalone COLUMN — same fused counts,
    * argmax, and first-match-in-list-order tiebreak as [[languageId]]. */
  def langGuessCol(textCol: Column): Column = {
    val c = graft.functions.StopwordCounts
      .stopwordCounts(textCol, stopwords.map(_._2))
    val best = greatest(stopwords.indices.map(i => c.getItem(i)): _*)
    stopwords.zipWithIndex.foldRight(lit("und"): Column) {
      case (((l, _), i), e) =>
        when(c.getItem(i) === best && best > 0, lit(l)).otherwise(e)
    }
  }

  /** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2 heuristics,
    * re-expressed as Catalyst HOFs): keep a line only if it ends in
    * terminal punctuation, has at least `minWords` whitespace words,
    * and is not a boilerplate line (contains "javascript", "cookie",
    * or "{" — the lorem-ipsum/code tells). Emits the cleaned text plus
    * kept/dropped line counts so the filter rate is auditable.
    *
    * Scale: split → filter → rejoin is one narrow codegen'd map over
    * the text column — no explode, no shuffle, no UDF. */
  def c4LineClean(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keep = filter(lines, l => {
      val t = trim(l)
      val lower = org.apache.spark.sql.functions.lower(t)
      t.rlike("[.!?\"']$") &&
        size(split(t, "\\s+")) >= minWords &&
        !lower.contains("javascript") && !lower.contains("cookie") &&
        !lower.contains("{")
    })
    df.select(col(idCol),
      array_join(keep, "\n").as("clean_text"),
      size(keep).cast(LongType).as("n_kept"),
      (size(lines) - size(keep)).cast(LongType).as("n_dropped"))
  }

  /** CORPUS-level duplicated-line removal — the boilerplate pass C4
    * (Raffel et al. 2020 §2.2, "we discarded all but one of any
    * three-sentence span occurring more than once" family) and every
    * Common-Crawl curation pipeline run: a line whose normalized form
    * (trim + lowercase) occurs at least `dupThreshold` times ACROSS THE
    * WHOLE CORPUS is navigation/footer/cookie-banner boilerplate, and
    * every copy of it is dropped. Differs from [[c4LineClean]] (per-line
    * local heuristics) in that the signal is global frequency — only a
    * corpus-wide pass can see it.
    *
    * Emits one row per input doc: (id, clean_text = kept lines joined
    * by \n in original order, n_kept, n_dropped) — docs whose every
    * line is boilerplate stay in the output with clean_text = ''.
    *
    * Scale shape (the [[Dedup.substringSpans]] discipline — line TEXT
    * never reaches an exchange): one narrow posexplode emits (doc, pos,
    * md5(normalized line)); the frequency count shuffles 16-byte
    * digests only; the boilerplate semi-join back is digest-keyed and
    * emits bare (doc, pos) int pairs, which aggregate to one small
    * drop-position array per affected doc. The only corpus-sized
    * exchange is the final doc-key join attaching those arrays, after
    * which the line filter is a codegen'd HOF over the doc's own text —
    * re-split in place, positions checked against the array. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                dupThreshold: Long = 2L): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "line")))
      .select(col(idCol), col("pos"),
        md5(lower(trim(col("line")))).as("h"))
    val boiler = lines.groupBy("h").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= dupThreshold).select("h")
    val droppedPos = lines.join(boiler, Seq("h"), "left_semi")
      .groupBy(col(idCol)).agg(collect_set(col("pos")).as("drop_pos"))
    val all = split(col(textCol), "\n")
    val dp = coalesce(col("drop_pos"), typedLit(Seq.empty[Int]))
    val kept = filter(all, (l, i) => !array_contains(dp, i))
    df.join(droppedPos, Seq(idCol), "left_outer")
      .select(col(idCol),
        array_join(kept, "\n").as("clean_text"),
        size(kept).cast(LongType).as("n_kept"),
        size(dp).cast(LongType).as("n_dropped"))
  }

  /** PII patterns shared by [[piiScrub]] and its oracle. RE2 (DuckDB)
    * and java.util.regex agree on this subset: character classes,
    * bounded/unbounded repetition, grouping — no backreferences, no
    * lookaround, no `\b` (word-boundary semantics differ at string
    * edges between the engines). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "[IP]"),
    ("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "[PHONE]"))

  /** PII scrubbing — the redaction pass every shareable training corpus
    * runs (emails, IPv4 addresses, phone numbers → typed placeholder
    * tokens), with per-document match counts so the redaction rate is
    * auditable. One narrow codegen map: `regexp_extract_all` counts +
    * chained `regexp_replace`, no UDF, no shuffle; at 100 TB this is a
    * pure map stage over the scan.
    *
    * Replacement order is the [[piiPatterns]] list order; the patterns
    * are mutually exclusive on any input (an email match consumes its
    * text before the IP pattern could see digits-and-dots inside it,
    * and placeholders contain no pattern-matchable characters). */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
        .cast(LongType).as(s"n_$name")
    }
    val scrubbed = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, token)) => regexp_replace(c, pat, token)
    }
    df.select(col(idCol) +: counts :+ scrubbed.as("scrubbed"): _*)
  }

  /** Repetition statistics (Gopher-style, Rae et al. 2021 Table A1):
    * the within-document repetition signals used to drop low-quality
    * machine-generated text — fraction of tokens belonging to words
    * that repeat, and the share of the document covered by its most
    * frequent word bigram. Ratios are integer parts-per-million
    * (`x * 1e6 div n`) so results are exact on every engine.
    *
    * Shape at scale: tokenize (narrow) → explode → count per (doc,
    * word) and (doc, bigram) with map-side combine → per-doc re-agg →
    * one join on doc_id. Both shuffles key on doc-scoped grams, so
    * partition counts stay proportional to corpus size; the per-doc
    * partitions are bounded by document length (no hot keys). The
    * bigram tiebreak is `max(struct(count, gram))` — lexicographic max,
    * identical to DuckDB's struct `max()`. */
  def repetitionStats(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    // All counts from ONE fused pass ([[graft.functions.RepStats]], a
    // native codegen Expression): the whole query is a narrow map over
    // the scan — no explode, no shuffle. Both relational formulations
    // lost at sf0.1 (two-branch explode+join 3.2 s; a tagged single
    // explode 3.5 s — per-element struct allocation outweighs the
    // saved shuffle); the fused kernel runs in ~0.3 s. The two-branch
    // form survives below as the spec-pinned reference.
    val r = graft.functions.RepStats.repStats(col(textCol))
    df.select(col(idCol).as("doc_id"), r.as("r"))
      .select(col("doc_id"),
        col("r.n_words").as("n_words"),
        col("r.n_distinct").as("n_distinct"),
        col("r.n_dup_tokens").as("n_dup_tokens"),
        expr("r.n_dup_tokens * 1000000 div r.n_words").as("dup_frac_ppm"),
        col("r.top_bigram").as("top_bigram"),
        col("r.top_bigram_n").as("top_bigram_n"),
        // a bigram covers 2 tokens; report its token share as
        // 2·n / n_words ppm
        expr("r.top_bigram_n * 2000000 div r.n_words")
          .as("top_bigram_ppm"))
  }

  /** The ORIGINAL relational formulation — the spec reference the
    * fused [[graft.functions.RepStats]] expression is pinned against
    * (not used by the registry). */
  def repetitionStatsUnfused(df: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val words = df.select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("w"))
    val wordAgg = words.groupBy("doc_id", "w")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
          .as("n_dup_tokens"))
    val grams = df.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), 2, distinct = false)).as("g"))
    val gramAgg = grams.groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(struct(col("c"), col("g"))).as("top"))
      .select(col("doc_id"), col("top.c").as("top_bigram_n"),
        col("top.g").as("top_bigram"))
    wordAgg.join(gramAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        col("n_dup_tokens"),
        expr("n_dup_tokens * 1000000 div n_words").as("dup_frac_ppm"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        coalesce(expr("top_bigram_n * 2000000 div n_words"), lit(0L))
          .as("top_bigram_ppm"))
  }

  /** TF-IDF-style term ranking: top-`topN` terms per document by a
    * FIXED-POINT score `tf * 1e6 div df` (term frequency over corpus
    * document frequency, integer floor-division). Monotone in
    * (tf, 1/df) like tf·idf but free of transcendental math — `ln` is
    * not correctly rounded and differs in the last ulp between JVM and
    * C libm, which would break cross-engine hash parity; integer
    * division is exact everywhere.
    *
    * Shape at scale: tokenize (narrow) → explode → ONE shuffle on
    * (doc, term) for tf with map-side combine → ONE shuffle on term for
    * df → shuffle join tf⋈df on term (the term dictionary is corpus-
    * sized — never broadcast) → per-doc top-N window whose partition is
    * one document's vocabulary (bounded by doc length, so no hot-key
    * risk). Terms are ASCII letter runs (`[A-Za-z]+`) lowercased AFTER
    * extraction — ASCII lowercasing is locale-free on both engines. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(idCol).as("doc_id"),
        explode(transform(
          regexp_extract_all(col(textCol), lit("[A-Za-z]+"), lit(0)),
          t => lower(t))).as("term"))
    val tf = terms.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_q").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("score_q", expr("tf * 1000000 div df"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= topN)
      .select("doc_id", "term", "tf", "df", "score_q", "rank")
  }

  /** Fingerprinting: md5 of whitespace-normalized text (exact content
    * identity) plus the minimum polynomial ROLLING hash over all 8-char
    * windows — a winnowing-style sketch that survives local edits.
    * The rolling hash ([[graft.functions.RollingHash]], a native
    * codegen Expression) does O(1) work per position; the previous
    * md5-per-window formulation was the single hottest plan in the
    * bench (one digest per character). Inputs shorter than 8 chars are
    * padded with U+0001 so every string takes the main path — the same
    * padding is applied in the oracle. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    val padded = when(length(norm) < 8, rpad(norm, 8, "\u0001"))
      .otherwise(norm)
    df.select(col(idCol),
      md5(norm).as("content_md5"),
      graft.functions.RollingHash.minNgramHash(padded, 8)
        .as("min_gram_hash"))
  }

  /** Exact top-`k` most frequent tokens via a SKETCH-PREFILTERED plan —
    * the heavy-hitters dual of the bloom-prefiltered decontamination:
    *
    *   1. CANDIDATES: one pass builds a Misra-Gries frequent-items
    *      sketch ([[graft.functions.FreqItemsSketchAgg]]); partials are
    *      ≤ maxMapSize entries per task no matter how large the
    *      vocabulary, and the merged candidate list (a driver-side
    *      literal, like the IVF codebook) is guaranteed to contain
    *      every token whose count clears the sketch error bound.
    *   2. VERIFY: count ONLY candidate tokens exactly — the groupBy
    *      shuffles the candidate subset of the token stream, not the
    *      full vocabulary — and rank (count desc, token asc).
    *
    * The result equals the plain exact top-k whenever the k-th count
    * exceeds the sketch's maximum error (≈ 3.5·n/maxMapSize) — the
    * heavy-hitters regime this operator is named for; size maxMapSize
    * to the tail you care about. That precondition is CHECKED, not
    * assumed: the merged sketch's `getMaximumError` rides along with
    * the candidates, and unless the error is zero (sketch never
    * pruned — exact by construction) the verified k-th count must
    * clear it or this throws with the measured numbers, instead of
    * returning a plausible-but-wrong top-k from an undersized sketch.
    * Why not plain groupBy+limit at 100 TB:
    * a web-scale vocabulary is billions of distinct tokens, so the
    * exact plan's exchange carries the whole long tail; here the tail
    * dies in the sketch's map-side partials. */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int,
                   maxMapSize: Int = 1024): DataFrame = {
    import graft.functions.FreqItemsSketchAgg.freqItemCandidates
    val toks = docs.select(
      explode(split(trim(col(textCol)), "\\s+")).as("token"))
    val cr = toks
      .agg(freqItemCandidates(col("token"), maxMapSize).as("c"))
      .select(col("c.max_error"), col("c.candidates"))
      .head()
    val maxErr = cr.getLong(0)
    val cands = cr.getSeq[String](1)
    val ranked = toks.where(col("token").isin(cands: _*))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
    if (maxErr == 0L) ranked // sketch held every token exactly
    else {
      // k rows at most — driver-side check is O(k), the verify pass ran
      // anyway, and the caller gets the already-materialized result.
      val rows = ranked.collect()
      require(rows.length == k && rows.last.getLong(1) > maxErr,
        s"heavyHitters(k=$k, maxMapSize=$maxMapSize): the k-th exact " +
          s"candidate count (${if (rows.length == k) rows.last.getLong(1)
          else "missing — fewer candidates than k"}) does not clear the " +
          s"sketch's maximum error ($maxErr); a non-candidate token could " +
          s"belong in the top-k. Raise maxMapSize.")
      docs.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), ranked.schema)
    }
  }

  /** BM25 top-k retrieval: rank documents against a (small, literal)
    * query set by Okapi BM25 — the lexical-retrieval baseline every
    * RAG / hard-negative-mining pipeline starts from.
    *
    * EXACT-INTEGER scoring profile (the repo's hash-parity convention):
    * k1 = 6/5 and b = 3/4 are exact rationals, so the per-term factor
    *   tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
    * multiplies out (by 10·T, with avgdl = T/N) to
    *   22·tf·T / (10·T·tf + 3·T + 9·dl·N)
    * — all BIGINT. The Robertson log-idf is replaced by its exact
    * rational argument (2(N−df)+1)/(2df+1), quantized to ppm: same
    * df-monotonicity, zero cross-engine drift; swap in `ln` where hash
    * parity isn't required. Integer headroom: the tff numerator
    * 22·tf·T·10⁶ stays < 2⁶³ only while tf·T ≲ 4.19×10¹¹ (a 10¹²-token
    * corpus already exceeds it at tf ≥ 1), and the idf·tff product
    * overflows past ~2×10⁶ documents when a df=1 term appears — both
    * are guarded by `raise_error` below, so an out-of-range corpus
    * fails loudly instead of silently mis-ranking (ANSI-off Long
    * arithmetic wraps). Past the guards, drop the ppm scale or move
    * the profile to doubles.
    *
    * Scale shape: the query vocabulary is BROADCAST and filters the
    * exploded corpus BEFORE any exchange, so the only corpus-sized
    * shuffle keys on (doc_id, term) for documents that contain at least
    * one query term; df and the (N, T) stats are one-row /
    * vocabulary-sized broadcasts; the final ranking is a per-query
    * top-k window that [[graft.plans.TopKPerKey]] rewrites to bounded
    * heaps. Documents matching no query term drop out scan-side (their
    * BM25 is 0). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    val vocab = qterms.select("term").distinct()
    val w = split(trim(lower(col(textCol))), "\\s+")
    val docs = df.select(col(idCol).as("doc_id"),
      size(w).cast(LongType).as("dl"), w.as("w"))
    // One-row corpus stats ride along as a broadcast nested-loop join.
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("total_len"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .join(broadcast(vocab), Seq("term"))
      .groupBy("doc_id", "term")
      .agg(max("dl").as("dl"), count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_q",
        expr("((2 * (n_docs - df) + 1) * 1000000) div (2 * df + 1)"))
      // Overflow guards (see scaladoc): the guards live INSIDE the
      // scoring expressions so column pruning can never drop them.
      .withColumn("tff_q",
        when(col("tf") * col("total_len") > lit(419000000000L),
          raise_error(lit("bm25TopK: tff_q numerator would overflow " +
            "Long (tf * total_len > ~4.19e11 tokens); use a double " +
            "profile at this corpus size")))
          .otherwise(expr("(22 * tf * total_len * 1000000) div " +
            "(10 * total_len * tf + 3 * total_len + 9 * dl * n_docs)")))
      .withColumn("contrib_q",
        when(col("idf_q") > lit(4192441834934L),
          raise_error(lit("bm25TopK: idf_q * tff_q would overflow Long " +
            "(> ~2e6 docs with a df=1 term); use a double profile")))
          .otherwise(expr("(idf_q * tff_q) div 1000000")))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(sum("contrib_q").as("score_q"))
    val win = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("doc_id"))
    perDoc
      .withColumn("rank", row_number().over(win).cast(LongType))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "score_q", "rank")
  }

  /** Bigram-LM surprisal scoring — the CCNet / Wikipedia-LM quality
    * filter re-expressed over the corpus's OWN bigram statistics: train
    * add-one-smoothed bigram counts in one pass, score every document by
    * its mean per-bigram surprisal, and let the caller threshold (high
    * surprisal = the corpus LM finds the document improbable = gibberish
    * or boilerplate-free novelty; low = formulaic).
    *
    * EXACT-INTEGER surprisal: p(w₂|w₁) = (c₁₂+1)/(c₁+V) is an exact
    * rational, and the per-bigram surprisal is its integer log₂ via
    * bit-length — `length(bin((c₁+V) div (c₁₂+1)))` = ⌊log₂ q⌋+1, the
    * same value on Spark and DuckDB with no `ln` last-ulp drift (the
    * repo's hash-parity convention; production scoring swaps in double
    * `ln` for smooth perplexity). Scores are within 1 bit of the true
    * bigram cross-entropy — exactly enough for a rank-based keep/drop
    * gate.
    *
    * Scale shape: counts are vocabulary-bounded aggregates (map-side
    * combined; the exchange carries (gram, count), never documents);
    * scoring joins the exploded corpus against the two count relations
    * on the gram key (broadcast under AQE when the vocabulary is small,
    * shuffle-hash otherwise) and re-aggregates per doc_id. V and the
    * corpus constants ride as a one-row broadcast. */
  def lmSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(trim(lower(col(textCol))), "\\s+")
    val docs = df.select(col(idCol).as("doc_id"), w.as("w"))
    val bigrams = docs.select(col("doc_id"),
        explode(when(size(col("w")) >= 2,
            transform(sequence(lit(1), size(col("w")) - 1),
              i => struct(element_at(col("w"), i).as("w1"),
                element_at(col("w"), i + 1).as("w2"))))
          .otherwise(array().cast(ArrayType(StructType(Seq(
            StructField("w1", StringType), StructField("w2", StringType)))))))
          .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = docs.select(explode(col("w")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val scored = bigrams
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        length(bin(expr("(c1 + v) div (c2 + 1)"))).cast(LongType)
          .as("bits"))
    val perDoc = scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("bits_total"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bits_total"), lit(0L)).as("bits_total"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          expr("(bits_total * 1000000) div n_bigrams"))
          .otherwise(lit(0L)).as("bits_per_bigram_q"))
  }

  /** LINEAR quality-MODEL scoring — the model-based filter stage
    * (fastText/logreg quality classifiers in DCLM/FineWeb-style
    * curation) with a FIXED integer weight vector standing in for
    * trained weights: the contract is features-in, integer-logit-out,
    * and swapping the constants for trained values changes no
    * plumbing. Features come from the ONE fused text pass
    * ([[graft.functions.QualityCounts]]) as exact ppm / bit-length
    * integers:
    *
    *   score_q = wStop·stop_ppm − wPunct·punct_ppm
    *             + wLen·bitlen(n_tokens) − bias
    *   keep_model = score_q > 0
    *
    * Zero float drift, total ordering, trivially portable to the
    * oracle. One narrow map; the filter composes with scan pushdown
    * at any scale. */
  def qualityModelScore(df: DataFrame, idCol: String, textCol: String,
                        wStop: Long, wPunct: Long, wLen: Long,
                        bias: Long): DataFrame = {
    val c = graft.functions.QualityCounts
      .qualityCounts(col(textCol), stopwords.toMap.apply("en"))
    val nChars = c.getItem(0)
    val nTok = c.getItem(1)
    val nPunct = c.getItem(2)
    val nStop = c.getItem(3)
    df.select(col(idCol),
        when(nTok > 0, nStop * 1000000L cast LongType).otherwise(0L)
          .as("snum"),
        nTok.cast(LongType).as("n_tokens"),
        when(nChars > 0, nPunct * 1000000L cast LongType).otherwise(0L)
          .as("pnum"),
        nChars.cast(LongType).as("n_chars"))
      .select(col(idCol),
        when(col("n_tokens") > 0, expr("snum div n_tokens"))
          .otherwise(0L).as("stop_ppm"),
        when(col("n_chars") > 0, expr("pnum div n_chars"))
          .otherwise(0L).as("punct_ppm"),
        when(col("n_tokens") > 0,
          length(bin(col("n_tokens"))).cast(LongType)).otherwise(0L)
          .as("len_bits"))
      .withColumn("score_q",
        lit(wStop) * col("stop_ppm") - lit(wPunct) * col("punct_ppm") +
          lit(wLen) * col("len_bits") - lit(bias))
      .withColumn("keep_model",
        when(col("score_q") > 0, 1L).otherwise(0L))
  }

  /** PMI collocation mining (Church & Hanks 1990): the top-N bigrams
    * whose observed frequency most exceeds chance —
    *
    *   PMI(x,y) = log [ P(x,y) / (P(x)·P(y)) ]
    *
    * with all probabilities over the BIGRAM stream (P(x) = x's
    * occurrences as a left token / T, P(y) as right / T, T = total
    * bigrams) — the self-consistent estimator that needs no separate
    * unigram pass. Log is monotone, so ranking happens on the exact
    * rational ratio itself, emitted as parts-per-million:
    *
    *   pmi_ratio_ppm = c2 · T · 10⁶ div (cl · cr)
    *
    * in DECIMAL(38,0) (HUGEINT in the oracle) — zero float drift, no
    * Long overflow until c2·T·10⁶ > 10³⁸. `minCount` is the standard
    * low-frequency gate: a hapax pair scores PMI near log T by
    * construction and would bury every real collocation.
    *
    * Scale shape: the corpus-sized stage is ONE bigram count
    * (map-side combined, observed-vocab²-bounded exchange); marginals
    * are vocab-bounded re-aggregations of that same table (never a
    * second corpus pass), T is a one-row broadcast, and the global
    * top-N is a TakeOrdered bounded heap, not a full sort. */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Long,
                      topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emptyBg = array().cast(ArrayType(StructType(Seq(
      StructField("w1", StringType), StructField("w2", StringType)))))
    // The split is PROJECTED before the lambda (the lmSurprisal /
    // substring-dedup convention): inlining it into the transform body
    // re-tokenizes the document on every element_at — O(tokens²) per
    // doc (measured 7.3 s → 0.6 s at sf0.1 for this stage).
    val toks = df.select(
      split(trim(lower(col(textCol))), "\\s+").as("w"))
    val bigrams = toks.select(
        explode(when(size(col("w")) >= 2,
            transform(sequence(lit(1), size(col("w")) - 1),
              i => struct(element_at(col("w"), i).as("w1"),
                element_at(col("w"), i + 1).as("w2"))))
          .otherwise(emptyBg)).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .persist()
    val cl = c2.groupBy("w1").agg(sum("c2").as("cl"))
    val cr = c2.groupBy("w2").agg(sum("c2").as("cr"))
    val tot = c2.agg(sum("c2").as("t"))
    val scored = c2.where(col("c2") >= minCount)
      .join(cl, Seq("w1")).join(cr, Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c2"),
        expr("CAST(c2 AS DECIMAL(38,0)) * t * 1000000 div (CAST(cl AS " +
          "DECIMAL(38,0)) * cr)").cast(LongType).as("pmi_ratio_ppm"))
    val top = scored
      .orderBy(col("pmi_ratio_ppm").desc, col("w1"), col("w2"))
      .limit(topN)
    val out = top.withColumn("rank",
        row_number().over(
          Window.orderBy(col("pmi_ratio_ppm").desc, col("w1"), col("w2")))
          .cast(LongType))
      .select("w1", "w2", "c2", "pmi_ratio_ppm", "rank")
      .localCheckpoint(true)
    c2.unpersist()
    out
  }

  /** DSIR-style IMPORTANCE scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank every
    * document by how much more a TARGET-corpus language model likes it
    * than the base-corpus model — the importance weight that selects
    * web data "similar to" a trusted target set. The paper uses hashed
    * n-gram feature LMs; here the two LMs are add-one unigram models
    * in the [[lmSurprisal]] integer-bit convention (bit-length of the
    * reciprocal probability — no ln, no float drift):
    *
    *   bits_x(w)    = bitlen( (T_x + V) div (c_x(w) + 1) )
    *   imp(w)       = bits_base(w) − bits_target(w)
    *   score_ppm(d) = Σ_{w∈d} imp(w) · 10⁶ div n_tokens(d)
    *
    * positive = the target model finds the document easier than the
    * base model → select. V is the SHARED corpus vocabulary, so both
    * models smooth over the same event space.
    *
    * Scale shape: ONE corpus tokenization counts both models (the
    * target count is a conditional sum in the same aggregate — the
    * target corpus is a subset of the base, per the paper's setup);
    * the three totals broadcast; per-token importance lives on the
    * vocab-bounded count table; the re-join to document tokens
    * shuffles on the token key with map-side-combined per-doc sums. */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
                targetPred: Column): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        targetPred.as("is_target"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
    val counts = toks.groupBy("t")
      .agg(count(lit(1)).as("cb"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum("cb").as("tb"), sum("ct").as("tt"),
      count(lit(1)).as("v"))
    val imp = counts.crossJoin(broadcast(totals))
      .select(col("t"),
        (length(bin(expr("(tb + v) div (cb + 1)"))).cast(LongType) -
          length(bin(expr("(tt + v) div (ct + 1)"))).cast(LongType))
          .as("imp_bits"))
    val perDoc = toks.join(imp, Seq("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("imp_bits").as("imp_bits_total"))
    df.select(col(idCol).as("doc_id"), targetPred.as("is_target"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("is_target"), 1L).otherwise(0L).as("is_target"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("imp_bits_total"), lit(0L)).as("imp_bits_total"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          expr("imp_bits_total * 1000000 div n_tokens"))
          .otherwise(lit(0L)).as("score_ppm"))
  }

  /** BPE merge-candidate counting (Sennrich et al. 2016 §3.2, the
    * counting stage of byte-pair-encoding tokenizer training): the
    * corpus-frequency-weighted count of every adjacent character pair,
    * ranked — rank 1 is the first merge a BPE trainer would learn.
    *
    * Scale shape — the trick real tokenizer trainers rely on: pairs are
    * counted over the DISTINCT-WORD table weighted by word frequency,
    * never over the corpus. The corpus-sized stage is one map-side
    * combined word count (vocabulary-bounded exchange); the pair
    * explosion then runs on |vocab| rows — millions, not billions — and
    * the pair aggregate is alphabet²-bounded. The final global top-N is
    * a TakeOrdered (bounded heap), not a full sort; rank numbering then
    * touches N rows.
    *
    * Subsequent merge ROUNDS re-segment the vocabulary against the
    * learned merge list — a driver-side loop over the vocab table (the
    * same model-state-on-driver convention as the k-means codebook);
    * the distributed-counting kernel here is the per-round cost. */
  def bpePairCounts(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(
      explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
    val wf = tok.groupBy("t").agg(count(lit(1)).as("freq"))
    val pairs = wf.where(length(col("t")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), length(col("t")) - 1),
          i => col("t").substr(i, lit(2)))).as("pair"))
    val counts = pairs.groupBy("pair").agg(sum("freq").as("n"))
    val top = counts.orderBy(col("n").desc, col("pair")).limit(topN)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("pair")))
          .cast(LongType))
      .select("pair", "n", "rank")
  }

  /** MULTI-ROUND BPE merge TRAINER — the full iterative Sennrich et al.
    * 2016 §3.2 loop that [[bpePairCounts]] is one round of: start from
    * the character segmentation of the frequency-weighted vocabulary,
    * then `rounds` times (1) count adjacent symbol pairs weighted by
    * word frequency, (2) adopt the most frequent pair (ties → smallest
    * (lhs, rhs) strings) as the next merge rule, (3) re-segment the
    * vocabulary by applying that rule LEFTMOST-FIRST, NON-OVERLAPPING
    * within each word ("aaaa" + (a,a) → "aa","aa"). Emits the learned
    * merge table `(merge_round, lhs, rhs, merged, n)` — the trained
    * tokenizer model, in training order. No end-of-word marker (the
    * within-word simplification; a production trainer appends '</w>'
    * before segmenting, which changes no plumbing here).
    *
    * Scale shape — why tokenizer training is feasible on a 100 TB
    * corpus at all: the corpus is touched ONCE (the word-count
    * aggregate, map-side combined, vocabulary-bounded exchange); every
    * round after that runs on the |vocab| row table — pair counting is
    * a vocab-bounded explode + alphabet²-bounded aggregate, merge
    * application is one NARROW fold per word (no shuffle). Driver-side
    * state is one (lhs, rhs, n) row per round — model state, the
    * k-means-codebook convention. The vocab table is
    * `localCheckpoint`-ed every round, so plan size stays flat in
    * `rounds` (the [[graft.operators.Graph.pageRankQ]] convention).
    *
    * Determinism: counts are exact integers, tie-breaks total, and the
    * fold's leftmost-non-overlapping semantics are engine-portable —
    * the oracle replays every round as unrolled CTEs with a
    * window-function formulation of the same merge rule. */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    val merges = bpeTrainState(df, textCol, rounds)._2
    import spark.implicits._
    merges.toDF("merge_round", "lhs", "rhs", "n")
      .select(col("merge_round"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("n"))
  }

  /** BPE ENCODE under a vocabulary trained on the SAME corpus — the
    * apply side of [[bpeTrain]], closing the tokenizer loop: per-doc
    * token counts after `rounds` learned merges, the number the token
    * budget / packing stages actually consume (a whitespace word count
    * over-estimates tokens; a trained-BPE count is what the model sees).
    * Emits `(doc_id, n_words, n_chars, n_bpe_tokens, compress_ppm)` —
    * compress_ppm = n_bpe_tokens·10⁶ div n_chars, the compression the
    * learned merges bought (1e6 = no merge applied anywhere).
    *
    * Scale shape: training touches the corpus once ([[bpeTrain]]'s
    * word-count aggregate); ENCODING never re-segments the corpus — the
    * final per-WORD segmentation lengths live on the |vocab| table, so
    * encode is one corpus explode joined to vocab (AQE broadcasts the
    * vocab side when it fits) and one per-doc sum. The O(len²) fold
    * cost stays on the vocab table, paid once per distinct word, not
    * once per occurrence — the aggregate-before-expensive-work shape. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                rounds: Int): DataFrame = {
    val vocab = bpeTrainState(df, textCol, rounds)._1
    val wordLens = vocab.select(col("t"),
      size(col("syms")).cast(LongType).as("ntok"))
    df.select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
      .join(wordLens, Seq("t"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("t"))).cast(LongType).as("n_chars"),
        sum(col("ntok")).cast(LongType).as("n_bpe_tokens"))
      .withColumn("compress_ppm",
        expr("n_bpe_tokens * 1000000 div n_chars"))
  }

  /** Shared trainer loop of [[bpeTrain]] / [[bpeEncode]]: returns the
    * final vocabulary segmentation `(t, freq, syms)` (checkpointed —
    * safe to reuse across actions) and the merge table in training
    * order. */
  private def bpeTrainState(df: DataFrame, textCol: String, rounds: Int)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    require(rounds >= 1, s"bpeTrain: rounds=$rounds")
    val tok = df.select(
      explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
    // filter(...) guards against empty-string symbols from the
    // char-split regex; DuckDB's string_split(t, '') never emits them.
    var vocab = tok.groupBy("t").agg(count(lit(1)).as("freq"))
      .select(col("t"), col("freq"),
        filter(split(col("t"), ""), s => length(s) > 0).as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (round <- 1 to rounds) {
      val top = vocab.where(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("lhs"),
              element_at(col("syms"), i + 1).as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"bpeTrain: vocabulary fully merged after ${round - 1} rounds; " +
          s"lower `rounds` (asked for $rounds)")
      val lhs = top(0).getString(0)
      val rhs = top(0).getString(1)
      val n = top(0).getLong(2)
      merges += ((round.toLong, lhs, rhs, n))
      // Leftmost-first non-overlapping merge as a single left fold:
      // merge the incoming symbol into the accumulator's last element
      // iff (last, incoming) == (lhs, rhs). A just-merged element
      // equals lhs+rhs (strictly longer than lhs), so it can never
      // re-merge with the next symbol in the same round — exactly the
      // non-overlap rule. O(len²) array copies per word, bounded by
      // word length, never corpus size.
      vocab = Ckpt.replace(
        vocab.withColumn("syms",
          aggregate(col("syms"), typedLit(Array.empty[String]),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(lhs) &&
                x === lit(rhs),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(lit(lhs + rhs))))
              .otherwise(concat(acc, array(x))))),
        vocab)
    }
    (vocab, merges.toSeq)
  }

  // ------------------------------------------------------------------
  // Unigram-LM (SentencePiece-style) tokenizer — the second tokenizer
  // family next to BPE. Model: vocabulary = EVERY single character in
  // the corpus (coverage guarantee — the segmentation DP always has a
  // path) plus the `topMulti` highest-frequency substrings of length
  // 2..`maxPiece` over the distinct-word table (ties lexicographic).
  // Piece cost is the integer surprisal bitlen(totalOcc div occ) —
  // the [[lmSurprisal]] bits convention — so frequent long pieces
  // out-compete their characters and segmentation minimizes total
  // bits, the unigram-LM objective in drift-free integer form.
  // ------------------------------------------------------------------

  /** Encoded DP cell: cost·Scale + pieceCount packs the lexicographic
    * (cost, n_pieces) objective into one BIGINT so the per-position
    * minimum is a scalar `min` on both engines. */
  val UnigramScale = 1000000L

  /** Piece-occurrence table `(piece, occ)`: every substring of length
    * 1..`maxPiece` of every distinct word, occurrences weighted by
    * word frequency (overlaps count — each start position is an
    * occurrence). Corpus text is read once; everything downstream is
    * piece-table-sized. */
  private def unigramPieceOcc(df: DataFrame, textCol: String,
                              maxPiece: Int): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .select(col("freq"), explode(flatten(
        transform(sequence(lit(1), least(length(col("t")), lit(maxPiece))),
          k => transform(sequence(lit(1), length(col("t")) - k + 1),
            st => col("t").substr(st, k))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("occ"))

  /** The trained vocabulary `(piece, occ, cost_q)` — single chars plus
    * the top-`topMulti` multi-char pieces. The top-N cut is the only
    * driver-bounded step (vocab-sized, the k-means-centroid
    * precedent); the corpus never moves. */
  private def unigramVocabFrame(df: DataFrame, textCol: String,
                                maxPiece: Int, topMulti: Int): DataFrame = {
    val occ = unigramPieceOcc(df, textCol, maxPiece)
    val vocab = occ.where(length(col("piece")) === 1)
      .unionByName(occ.where(length(col("piece")) >= 2)
        .orderBy(col("occ").desc, col("piece")).limit(topMulti))
    val total = vocab.agg(sum("occ").as("tot"))
    vocab.crossJoin(broadcast(total))
      .select(col("piece"), col("occ"),
        length(bin(expr("tot div occ"))).cast(LongType).as("cost_q"))
  }

  /** The vocabulary as a query: `(piece, occ, cost_q, rank)`, ranked
    * by (occ DESC, piece). The un-partitioned rank window runs over
    * the VOCABULARY (single-chars + topMulti rows, bounded model
    * state), never the corpus — the single-partition WindowExec is
    * deliberate and safe at any corpus scale. */
  def unigramVocab(df: DataFrame, textCol: String, maxPiece: Int,
                   topMulti: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    unigramVocabFrame(df, textCol, maxPiece, topMulti)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("occ").desc, col("piece")))
        .cast(LongType))
  }

  /** Shared per-word DP: `(t, ms, dp)` where `ms` is the word's vocab
    * match list — struct(e, k, enc, piece), `enc` = cost·Scale + 1 —
    * and `dp` the FULL 1-indexed DP array (`dp[i+1]` = packed minimum
    * for the length-i prefix; dp(0) = 0; dp(i) = min over matches
    * ending at i of dp(i−k) + enc). One `aggregate` fold per word;
    * single-char coverage makes every position reachable. */
  private def unigramWordDp(df: DataFrame, textCol: String,
                            maxPiece: Int, topMulti: Int): DataFrame = {
    val vocab = unigramVocabFrame(df, textCol, maxPiece, topMulti)
    val wl = df.select(
        explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
      .distinct()
    val cand = wl.select(col("t"), explode(flatten(
        transform(sequence(lit(1), least(length(col("t")), lit(maxPiece))),
          k => transform(sequence(lit(1), length(col("t")) - k + 1),
            st => struct((st + k - 1).cast(IntegerType).as("e"),
              k.cast(IntegerType).as("k"),
              col("t").substr(st, k).as("piece")))))).as("m"))
      .select(col("t"), col("m.e").as("e"), col("m.k").as("k"),
        col("m.piece").as("piece"))
    val matches = cand.join(broadcast(vocab), Seq("piece"))
      .select(col("t"), struct(col("e"), col("k"),
        (col("cost_q") * UnigramScale + 1L).as("enc"),
        col("piece")).as("m"))
      .groupBy("t").agg(collect_list("m").as("ms"))
    matches.select(col("t"), col("ms"),
      aggregate(
        sequence(lit(1), length(col("t"))),
        array(lit(0L)),
        (acc, i) => array_append(acc,
          array_min(filter(
            transform(col("ms"), m =>
              when(m.getField("e") === i,
                element_at(acc,
                  (i - m.getField("k") + 1).cast(IntegerType)) +
                  m.getField("enc"))),
            x => x.isNotNull)))).as("dp"))
  }

  /** Per-document encoding under the unigram vocabulary: minimum-bits
    * Viterbi segmentation of each DISTINCT word (a per-word DP over
    * its ≤ maxPiece-char suffix matches — one `aggregate` fold, no
    * per-row loop outside codegen), then documents join the word
    * table. The DP objective (cost, n_pieces) is packed into one
    * BIGINT ([[UnigramScale]]) so min() is scalar; single-char
    * coverage makes every position reachable. Word-table-sized
    * shuffles only — the corpus is tokenized once and never
    * re-segmented, the [[bpeEncode]] discipline. */
  def unigramEncode(df: DataFrame, idCol: String, textCol: String,
                    maxPiece: Int, topMulti: Int): DataFrame =
    unigramDocEncode(df, idCol, textCol,
      unigramWordStats(df, textCol, maxPiece, topMulti))

  /** The per-word model the encode serves from: `(t, np, wbits)` —
    * each distinct word's optimal piece count and total bits. This is
    * the trained artifact a streaming dual joins as a STATIC side. */
  def unigramWordStats(df: DataFrame, textCol: String, maxPiece: Int,
                       topMulti: Int): DataFrame =
    unigramWordDp(df, textCol, maxPiece, topMulti)
      .select(col("t"), element_at(col("dp"), -1).as("v"))
      .select(col("t"),
        expr(s"v % $UnigramScale").as("np"),
        expr(s"v div $UnigramScale").as("wbits"))

  /** The document-side aggregation over a word-stats model — shared by
    * the batch encode and its streaming dual (identical plan below the
    * source, one definition site). */
  def unigramDocEncode(docs: DataFrame, idCol: String, textCol: String,
                       wordStats: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
      .join(wordStats, Seq("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("t"))).cast(LongType).as("n_chars"),
        sum("np").cast(LongType).as("n_pieces"),
        sum("wbits").cast(LongType).as("bits_total"))
      .withColumn("pieces_per_word_ppm",
        expr("n_pieces * 1000000 div n_words"))

  /** One hard-EM re-estimation round over the unigram model — the
    * SentencePiece training loop's E/M steps in Viterbi (hard) form:
    * E = backtrack each word's minimum-bits segmentation (the unique
    * path under the deterministic smallest-(k, piece) tie rule at
    * every position), M = recount pieces from those segmentations
    * (weighted by word frequency) and re-cost them by integer
    * surprisal. Pieces the optimal segmentations never use drop out —
    * the SentencePiece prune step. Returns
    * `(piece, seg_occ, cost2_q, rank)`.
    *
    * The backtrack is a second `aggregate` fold per word (state =
    * (position, pieces-so-far); each step consumes ≥ 1 character, so
    * word-length iterations always terminate); everything downstream
    * is piece-table-sized. */
  def unigramEmVocab(df: DataFrame, textCol: String, maxPiece: Int,
                     topMulti: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wdp = unigramWordDp(df, textCol, maxPiece, topMulti)
    val segs = wdp.select(col("t"),
      aggregate(
        sequence(lit(1), length(col("t"))),
        struct(length(col("t")).cast(IntegerType).as("pos"),
          array().cast(ArrayType(StringType)).as("ps")),
        (st, _) => {
          val pos = st.getField("pos")
          // the on-path match at `pos`: dp(pos−k) + enc == dp(pos);
          // ties resolve to the smallest (k, piece) — array_min's
          // struct ordering, mirrored by the oracle's row_number.
          val choice = array_min(filter(
            transform(col("ms"), m =>
              when(m.getField("e") === pos &&
                element_at(col("dp"),
                  (pos - m.getField("k") + 1).cast(IntegerType)) +
                  m.getField("enc") ===
                  element_at(col("dp"), (pos + 1).cast(IntegerType)),
                struct(m.getField("k").as("k"),
                  m.getField("piece").as("piece")))),
            x => x.isNotNull))
          when(pos > 0,
            struct((pos - choice.getField("k")).cast(IntegerType)
              .as("pos"),
              array_append(st.getField("ps"), choice.getField("piece"))
                .as("ps")))
            .otherwise(st)
        },
        st => st.getField("ps")).as("pieces"))
    val wf = df.select(
        explode(split(trim(lower(col(textCol))), "\\s+")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
    val occ2 = segs.join(wf, Seq("t"))
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("seg_occ"))
    val tot2 = occ2.agg(sum("seg_occ").as("tot"))
    // rank window over the (vocab-bounded) re-counted piece table —
    // same single-partition-is-deliberate note as [[unigramVocab]]
    occ2.crossJoin(broadcast(tot2))
      .select(col("piece"), col("seg_occ"),
        length(bin(expr("tot div seg_occ"))).cast(LongType)
          .as("cost2_q"))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("seg_occ").desc, col("piece")))
        .cast(LongType))
  }
}
