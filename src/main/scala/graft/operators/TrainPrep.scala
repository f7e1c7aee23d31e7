package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-corpus preparation operators — the sampling / mixing /
  * packing trio that sits next to dedup in a large-scale LLM data
  * pipeline (the stage that turns a cleaned corpus into a training
  * stream).
  *
  * Everything is DETERMINISTIC BY HASH, never `rand()`: a sample/mix
  * decision is a pure function of the row's id, so runs replay
  * identically across engines, retries, and partitionings (the same
  * property the dedup kernel pins), and the DuckDB oracles reproduce
  * every decision bit-for-bit.
  *
  * Scale posture:
  *  - [[hashBucket]] / [[sampleByHash]] are narrow maps — no shuffle,
  *    no sort, pushdown-friendly (the filter sits right above the
  *    scan);
  *  - [[mixWeighted]] is a union of narrow-filtered sources — each
  *    source is scanned once with its own bucket predicate;
  *  - [[packSequences]] windows per SHARD: the running token sum that
  *    assigns bin ids partitions on the shard key, so no global-order
  *    bottleneck — exactly how packing runs in production (bins never
  *    span shards; each shard's stream packs independently).
  */
object TrainPrep {

  /** Deterministic per-row bucket in [0, 100): first 8 md5 hex digits
    * of the id rendered as a string, mod 100. Same construction inlines
    * into DuckDB SQL (`('0x' || substr(md5(...), 1, 8))::BIGINT`). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType), lit(buckets.toLong))

  /** Keep ~`pct`% of rows, chosen by [[hashBucket]] on `idCol` — a
    * reproducible corpus sample (re-runs and backfills select the SAME
    * rows; adjacent percentages nest: pct=20 ⊃ pct=10). */
  def sampleByHash(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.withColumn("bucket", hashBucket(col(idCol)))
      .where(col("bucket") < pct)

  /** Per-ROW weighted sampling — tiered retention where every row
    * carries its OWN keep percentage (a quality score tier, a language
    * up/down-weight, a source trust level): keep iff the row's
    * deterministic [[hashBucket]] falls under its weight. All of
    * [[sampleByHash]]'s reproducibility properties hold per tier —
    * re-runs keep the same rows, and raising a tier's weight only ADDS
    * rows (nested hash prefixes) — while the decision stays a narrow
    * scan-side filter: no shuffle, no RNG, composes with predicate
    * pushdown at any scale. */
  def sampleWeighted(df: DataFrame, idCol: String,
                     weightPctCol: String): DataFrame =
    df.withColumn("bucket", hashBucket(col(idCol)))
      .where(col("bucket") < col(weightPctCol))

  /** Deterministic STRATIFIED train/val/test split: the [[hashBucket]]
    * hash is salted with the stratum (`md5(stratum:id)`), so every
    * stratum gets its own independent hash space — each stratum's
    * val/test fractions hold individually (the point of
    * stratification: a rare language still lands `testPct`% in test),
    * and re-splitting never depends on which other strata exist.
    * Split boundaries are cumulative, so growing `valPct` moves rows
    * train→val only — test membership is frozen (the audit-friendly
    * property: a test row can never silently become training data).
    *
    * Scale shape: a single narrow projection — one md5 per row, two
    * comparisons; no shuffle, no per-stratum pass, composes with scan
    * pushdown like every other hash decision in this file. */
  def stratifiedSplit(df: DataFrame, idCol: String, stratumCol: String,
                      valPct: Int, testPct: Int): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"valPct=$valPct testPct=$testPct")
    val salted = concat(col(stratumCol).cast(StringType), lit(":"),
      col(idCol).cast(StringType))
    val bucket = pmod(conv(substring(md5(salted), 1, 8), 16, 10)
      .cast(LongType), lit(100L))
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < testPct, "test")
          .when(col("bucket") < testPct + valPct, "val")
          .otherwise("train"))
  }

  /** Weighted corpus mix: each source keeps the slice of its OWN hash
    * space proportional to its weight (weights sum to 100), then the
    * slices union into one stream tagged with `source_id`. The split
    * points are cumulative weights, so a source's kept set is stable
    * under reweighting of the others. All sources must share the
    * projected column set. */
  def mixWeighted(sources: Seq[(DataFrame, Int)], idCol: String): DataFrame = {
    require(sources.map(_._2).sum == 100, "weights must sum to 100")
    val lows = sources.map(_._2).scanLeft(0)(_ + _)
    sources.zipWithIndex.map { case ((df, w), i) =>
      df.withColumn("bucket", hashBucket(col(idCol)))
        .where(col("bucket") >= lows(i) && col("bucket") < lows(i) + w)
        .withColumn("source_id", lit(i).cast(IntegerType))
    }.reduce(_.unionAll(_))
  }

  /** TEMPERATURE-scaled domain mixture — the α-weighted source mixing
    * every multilingual / multi-domain training run uses (mT5, LLaMA:
    * sample domain d ∝ n_d^α with α < 1, lifting small domains without
    * letting the biggest one dominate). α is FIXED at 1/2, the one
    * sub-linear exponent with an exact integer form: weight_d =
    * isqrt(n_d), computed as float sqrt + a ±1 integer fixup, so the
    * weight is the true ⌊√n⌋ on every engine regardless of float
    * rounding.
    *
    * `budget` total docs are apportioned by largest-remainder (exact:
    * floor shares + the Σremainder leftovers to the largest remainders,
    * domain-name tiebreak), so Σtarget = budget whenever budget ≤ Σn_d
    * per-domain caps allow. Each domain then keeps the rows whose
    * salted hash ppm (`md5(domain:id) mod 10⁶` — the [[stratifiedSplit]]
    * salt convention) falls under `rate_ppm = target·10⁶ div n_d`: a
    * REPRODUCIBLE ≈target-sized sample per domain (hash-rate selection,
    * not exact-count — the same contract as [[sampleByHash]], keeping
    * the decision a narrow scan-side filter).
    *
    * Scale shape: one group-count aggregate (domains are
    * catalog-bounded — the windows over the allocation table are
    * tiny), then the per-row decision is hash-vs-broadcast-rate: no
    * corpus shuffle, no per-domain ranking window over the corpus, and
    * domain skew is irrelevant because no window partitions by domain.
    * Emits the selected rows as (id, domain, n_docs, weight, target,
    * rate_ppm). */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
                     budget: Long): DataFrame = {
    require(budget >= 1, s"temperatureMix: budget=$budget")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"))
    val s1 = floor(sqrt(col("n_docs").cast(DoubleType))).cast(LongType)
    val weighted = counts.withColumn("weight",
      when((s1 + 1) * (s1 + 1) <= col("n_docs"), s1 + 1)
        .when(s1 * s1 > col("n_docs"), s1 - 1)
        .otherwise(s1))
    val wtot = weighted.agg(sum("weight").as("wtot"))
    val alloc0 = weighted.crossJoin(broadcast(wtot))
      .withColumn("tgt0", expr(s"$budget * weight div wtot"))
      .withColumn("rem", expr(s"$budget * weight - tgt0 * wtot"))
    val leftover = alloc0.agg((lit(budget) - sum("tgt0")).as("lft"))
    val wOrd = Window.orderBy(desc("rem"), col(domainCol))
    val alloc = alloc0.crossJoin(broadcast(leftover))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("target", col("tgt0") +
        when(col("rn").cast(LongType) <= col("lft"), 1L).otherwise(0L))
      .withColumn("rate_ppm", least(lit(1000000L),
        expr("target * 1000000 div n_docs")))
      .select(col(domainCol), col("n_docs"), col("weight"),
        col("target"), col("rate_ppm"))
    val hppm = pmod(conv(substring(md5(concat(
      col(domainCol).cast(StringType), lit(":"),
      col(idCol).cast(StringType))), 1, 8), 16, 10).cast(LongType),
      lit(1000000L))
    df.select(col(idCol), col(domainCol))
      .join(broadcast(alloc), Seq(domainCol))
      .where(hppm < col("rate_ppm"))
      .select(col(idCol), col(domainCol), col("n_docs"), col("weight"),
        col("target"), col("rate_ppm"))
  }

  /** Greedy sequence packing: within each shard (`shardCol`), documents
    * in id order accumulate whitespace-token counts, and a document's
    * bin is `floor(tokens_before_it / budget)` — the standard
    * no-document-splitting approximation (a bin may overrun the budget
    * by at most one document). One window per shard; bins are contiguous
    * id ranges within their shard by construction. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    shardCol: String, budgetTokens: Int): DataFrame = {
    val nTokens = size(split(trim(col(textCol)), "\\s+")).cast(LongType)
    val w = Window.partitionBy(shardCol).orderBy(idCol)
    df.select(col(idCol), col(shardCol), nTokens.as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin",
        floor(col("tokens_before") / budgetTokens).cast(LongType))
  }

  /** TOKEN-BUDGET curation — the data-mix step after scoring: each
    * source contributes its BEST documents (by `scoreCol`, descending;
    * tie → smallest id) until its token budget fills. A document is
    * selected when the tokens accumulated BEFORE it are still under
    * budget, so a source may overrun by at most its last document —
    * the same no-document-splitting convention as [[packSequences]].
    * Every row is emitted with its `selected` verdict (audit-friendly,
    * like [[stratifiedSplit]]'s full-row output); filter `selected`
    * for the curated corpus.
    *
    * Scale shape: one window exchange keyed on the source — partition
    * size = one source's catalog of (id, score, count) TRIPLES, not
    * its text (the projection drops `textCol` after the narrow token
    * count, so document bodies never shuffle). A corpus with few giant
    * sources should pre-split them into sub-sources upstream; at that
    * point this is the same bounded per-key window as every other
    * operator here. */
  def tokenBudget(df: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, scoreCol: String,
                  budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens")
    val nTokens = size(split(trim(col(textCol)), "\\s+")).cast(LongType)
    val w = Window.partitionBy(sourceCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    df.select(col(idCol), col(sourceCol), col(scoreCol),
        nTokens.as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("selected", col("tokens_before") < budgetTokens)
  }

  /** Sliding word-window CHUNKING — the embedding/RAG prep step that
    * turns documents into model-window-sized pieces: one chunk per
    * stride position `j` (start word `j·stride`, length ≤ `window`),
    * covering every document in order, including a single chunk for
    * docs shorter than the window. Tail chunks that start inside the
    * last full window are emitted too (every stride position appears —
    * the simple, engine-portable contract; callers wanting
    * no-subset-tails filter on `n_words`).
    *
    * Scale shape: pure narrow explode — split once, slice per stride
    * position inside one projection; NO shuffle anywhere (asserted in
    * the spec), so it composes with a downstream embedding stage's own
    * partitioning instead of imposing one. Chunk counts are
    * data-proportional (≈ words/stride per doc), the same expansion an
    * `explode` of any nested column costs. */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window=$window stride=$stride")
    val words = split(trim(col(textCol)), "\\s+")
    val lastJ = greatest((size(words) - 1).cast(LongType), lit(0L))
      .divide(lit(stride.toLong)).cast(LongType) // floor: both args ≥ 0
    docs.select(col(idCol), words.as("__w"), lastJ.as("__jmax"))
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0L), col("__jmax"))).as("j"))
      .select(col(idCol), col("j").as("chunk_id"),
        array_join(slice(col("__w"), (col("j") * stride + 1).cast("int"),
          lit(window)), " ").as("chunk_text"),
        least(lit(window.toLong),
          size(col("__w")).cast(LongType) - col("j") * stride)
          .as("n_words"))
  }

  /** The corpus-prep pipeline END-TO-END — what a user actually runs
    * over a raw crawl: cheap narrow filters first (quality heuristics,
    * language ID — pure codegen maps sitting directly on the scan, so
    * the expensive stages see only survivors), then MinHash/LSH
    * near-dedup (banded candidates → exact-Jaccard verification →
    * drop), then per-shard sequence packing. The filters sit directly
    * on the scan, the dedup shuffles only the filtered corpus, packing
    * windows per shard — the stage order IS the scale design (each
    * stage shrinks the data the next one pays for) — and each stage
    * boundary is materialized once instead of re-derived per consumer
    * branch ([[dedupStage]]).
    *
    * Deterministic end to end (hash-based dedup, id-ordered packing) —
    * the full composition is oracle-checked value-for-value as
    * `tp_corpus_pipeline`. */
  def corpusPipeline(docs: DataFrame, idCol: String, textCol: String,
                     keepLang: String, numHashes: Int, bands: Int,
                     threshold: Double, shards: Int,
                     budgetTokens: Int): DataFrame = {
    val deduped = dedupStage(docs, idCol, textCol, keepLang,
      numHashes, bands, threshold)
    packSequences(
      deduped.withColumn("shard", pmod(col(idCol), lit(shards.toLong))),
      idCol, textCol, "shard", budgetTokens)
  }

  /** The shared filter→near-dedup front of [[corpusPipeline]] /
    * [[corpusPipelineFull]], with MATERIALIZED stage boundaries.
    *
    * Declared as one lazy plan, the pipeline re-derived `kept` (scan +
    * quality + langid text passes) in EVERY downstream branch — the
    * LSH self-join reads its input twice, the Jaccard verifier reads
    * the corpus text twice more, the drop anti-join once, and
    * decontamination twice again, so the branches COMPOUND: the
    * declared sf0.1 plan of tp_corpus_pipeline_full held 112 parquet
    * scans of the same documents table (36 for the 4-stage variant),
    * each repeating the quality/langid work. Each stage boundary is
    * now an eager localCheckpoint ([[graft.operators.Ckpt]]
    * discipline: a superseded stage is released the moment its
    * successor is materialized): the corpus is scanned ONCE, the
    * signature table once, and every reuse reads a materialized
    * node-local relation — the standard stage-materialization shape
    * for multi-use intermediates (a reused DataFrame whose recompute
    * costs full text passes is exactly the persist case; the plan the
    * optimizer sees also collapses from 112 scans to a handful of
    * operators, cutting planning time itself). Values are unchanged:
    * checkpointing truncates lineage, never alters rows; every stage
    * is deterministic (hash-based dedup, id tie-breaks). */
  private def dedupStage(docs: DataFrame, idCol: String, textCol: String,
                         keepLang: String, numHashes: Int, bands: Int,
                         threshold: Double): DataFrame = {
    val kept = Ckpt.replace(docs
      .where(TextAnalysis.qualityKeepCol(col(textCol)))
      .where(TextAnalysis.langGuessCol(col(textCol)) === keepLang)
      .select(col(idCol), col(textCol)))
    val sig = Ckpt.replace(
      Dedup.minhashSignature(kept, idCol, textCol, numHashes))
    val verified = Ckpt.replace(Dedup.jaccardOfPairs(kept,
      Dedup.lshCandidatePairs(sig, idCol, numHashes, bands),
      idCol, textCol, threshold), sig)
    val deduped = Ckpt.replace(
      Dedup.dropNearDuplicates(kept, verified, idCol), kept, verified)
    deduped
  }

  /** The FULL production corpus-prep pipeline: [[corpusPipeline]]'s
    * four stages plus the two release gates every shareable corpus runs
    * between dedup and packing — benchmark decontamination
    * ([[Dedup.decontaminate]]: drop documents sharing eval n-grams) and
    * PII scrubbing ([[TextAnalysis.piiScrub]]: typed redaction with
    * audit counts). Packing token counts come from the SCRUBBED text —
    * what actually ships.
    *
    * Stage order is the scale argument: narrow scan-pushed filters
    * first, then the only corpus shuffles (LSH dedup) over survivors,
    * then two stages that never shuffle the corpus (broadcast anti-join
    * + a pure map), then per-shard windows. Each stage shrinks what the
    * next one pays for; the eval side stays broadcast-sized by
    * assumption (a benchmark suite, not a second corpus). */
  def corpusPipelineFull(docs: DataFrame, idCol: String, textCol: String,
                         keepLang: String, numHashes: Int, bands: Int,
                         threshold: Double, evalDocs: DataFrame,
                         ngram: Int, shards: Int,
                         budgetTokens: Int): DataFrame = {
    // same materialized stage boundaries as [[dedupStage]] (see its
    // scaladoc: the declared plan held 112 scans of `documents`);
    // decontamination reads `deduped` twice (shingle explode +
    // anti-join back) — both reads hit the checkpoint.
    val deduped = dedupStage(docs, idCol, textCol, keepLang,
      numHashes, bands, threshold)
    val clean = Dedup.decontaminate(deduped, evalDocs, idCol, textCol, ngram)
    val scrubbed = TextAnalysis.piiScrub(clean, idCol, textCol)
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
    val piiCols = TextAnalysis.piiPatterns.map { case (name, _, _) =>
      col(s"n_$name")
    }
    val w = Window.partitionBy("shard").orderBy(idCol)
    scrubbed
      .select(col(idCol) +: col("shard") +: piiCols :+
        size(split(trim(col("scrubbed")), "\\s+")).cast(LongType)
          .as("n_tokens"): _*)
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin",
        floor(col("tokens_before") / budgetTokens).cast(LongType))
  }

  /** Per-document (source, lang, sizes, quality-keep) stats — the shared
    * narrow stage of the batch [[corpusCard]] and its streaming dual
    * ([[graft.streaming.StreamOps.corpusCardStream]]). One fused
    * QualityCounts text pass; the keep flag is exactly
    * [[TextAnalysis.qualityScore]]'s gate. */
  def docQualityStats(df: DataFrame): DataFrame = {
    val c = graft.functions.QualityCounts
      .qualityCounts(col("text"), TextAnalysis.stopwords.toMap.apply("en"))
    df.select(col("source"), col("lang"), c.as("c"))
      .select(col("source"), col("lang"),
        col("c").getItem(0).as("n_chars_d"),
        col("c").getItem(1).as("n_tok_d"),
        col("c").getItem(2).as("n_punct_d"))
      .withColumn("keep",
        col("n_tok_d") >= 5 && col("n_tok_d") <= 100000 &&
          when(col("n_chars_d") > 0,
            col("n_punct_d").cast(DoubleType) / col("n_chars_d"))
            .otherwise(lit(0.0)) < 0.2)
  }

  /** Length-bucketed batching report: assign every document to the next
    * power-of-two token-length bucket (floored at `minBucket`) and
    * report the padding waste per bucket — the decision table behind
    * dynamic-batching / bucketed-batching inference and training
    * loaders, where each batch pads to its bucket length and the waste
    * ppm IS the fraction of compute spent on pad tokens.
    *
    * The bucket is exact integer math on both engines:
    * `1 << length(bin(n−1))` = the smallest power of two ≥ n (the
    * bit-length idiom shared with [[TextAnalysis.lmSurprisal]]). One
    * narrow map + one bucket-keyed aggregate; nothing corpus-sized
    * crosses the exchange but (bucket, counts) partials. */
  def lengthBuckets(df: DataFrame, idCol: String, textCol: String,
                    minBucket: Int = 16): DataFrame = {
    val n = size(split(trim(col(textCol)), "\\s+")).cast(LongType)
    df.select(col(idCol).as("doc_id"), n.as("n_tokens"))
      .withColumn("bucket",
        when(col("n_tokens") <= minBucket, lit(minBucket.toLong))
          .otherwise(expr("shiftleft(cast(1 as bigint), " +
            "length(bin(n_tokens - 1)))")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum(col("bucket") - col("n_tokens")).as("n_padding"))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        col("n_padding"),
        expr("n_padding * 1000000 div (bucket * n_docs)").as("waste_ppm"))
  }

  /** IMPORTANCE RESAMPLING — the selection half of DSIR
    * ([[TextAnalysis.dsirScore]] is the scoring half): accept each
    * document with probability proportional to its importance weight,
    * realized deterministically as a [[hashBucket]]-ppm draw against a
    * clipped-linear acceptance rate
    *
    *   rate_ppm = clamp(10⁶ + slope · score_ppm, 0, 10⁶)
    *   keep     = hash_ppm(doc_id) < rate_ppm
    *
    * (the linearization of the paper's exp(score/T) around 0 — exact
    * integer, engine-portable, and monotone in the score, which is the
    * property resampling needs). All of [[sampleByHash]]'s
    * reproducibility holds: re-runs keep the same rows, raising
    * `slope` only sharpens the same selection. The score join is
    * doc-keyed; the accept decision is a narrow filter. */
  def importanceResample(scored: DataFrame, idCol: String,
                         scoreCol: String, slope: Long): DataFrame = {
    val rate = least(lit(1000000L),
      greatest(lit(0L), lit(1000000L) + lit(slope) * col(scoreCol)))
    val hppm = pmod(conv(substring(md5(col(idCol).cast(StringType)), 1, 8),
      16, 10).cast(LongType), lit(1000000L))
    scored
      .withColumn("rate_ppm", rate)
      .withColumn("hash_ppm", hppm)
      .withColumn("keep",
        when(col("hash_ppm") < col("rate_ppm"), 1L).otherwise(0L))
  }

  /** EPOCH PLAN: the per-source repeat-factor table a mixture recipe
    * compiles to before training — given a total token `budget` and
    * temperature-scaled source weights (α = 1/2 via exact integer
    * isqrt over source token mass, the [[temperatureMix]] weighting
    * applied to tokens instead of documents), apportion the budget by
    * largest remainder and express each source's share as an exact
    * repeat factor:
    *
    *   epochs_ppm = target_tokens · 10⁶ div n_tokens
    *
    * — > 10⁶ means the source is seen more than once per pass
    * (upsampled/multi-epoch, the small-high-quality-corpus case),
    * < 10⁶ means a subsample. This is the planning half of mixture
    * execution; [[temperatureMix]]/[[sampleWeighted]] are the
    * row-level enforcement half.
    *
    * One corpus pass (map-side-combined token count per source), then
    * source-cardinality-bounded arithmetic — the window orders ~tens
    * of sources, never rows. */
  def epochPlan(df: DataFrame, textCol: String, domainCol: String,
                budget: Long): DataFrame = {
    require(budget >= 1, s"epochPlan: budget=$budget")
    val perSrc = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col(textCol)), "\\s+")).cast(LongType))
          .as("n_tokens"))
    val s1 = floor(sqrt(col("n_tokens").cast(DoubleType))).cast(LongType)
    val weighted = perSrc.withColumn("weight",
      when((s1 + 1) * (s1 + 1) <= col("n_tokens"), s1 + 1)
        .when(s1 * s1 > col("n_tokens"), s1 - 1)
        .otherwise(s1))
    val wtot = weighted.agg(sum("weight").as("wtot"))
    val alloc0 = weighted.crossJoin(broadcast(wtot))
      .withColumn("tgt0", expr(s"$budget * weight div wtot"))
      .withColumn("rem", expr(s"$budget * weight - tgt0 * wtot"))
    val leftover = alloc0.agg((lit(budget) - sum("tgt0")).as("lft"))
    val wOrd = Window.orderBy(desc("rem"), col(domainCol))
    alloc0.crossJoin(broadcast(leftover))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("target_tokens", col("tgt0") +
        when(col("rn").cast(LongType) <= col("lft"), 1L).otherwise(0L))
      .withColumn("epochs_ppm",
        expr("target_tokens * 1000000 div n_tokens"))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        col("weight"), col("target_tokens"), col("epochs_ppm"))
  }

  /** Per-shard CURRICULUM ordering: the easy-to-hard training schedule
    * (Bengio et al. 2009) materialized as explicit (shard, phase, seq)
    * coordinates — documents sort ascending by a difficulty score
    * (token count here is the classic length curriculum; any scorer
    * column plugs in, e.g. [[TextAnalysis.lmSurprisal]]'s
    * bits_per_bigram_q for a perplexity curriculum), split into
    * `numPhases` contiguous difficulty phases, with a deterministic
    * consumption order inside each phase.
    *
    * The sort is PER [[hashBucket]] SHARD, not global: each shard is a
    * uniform random sample of the corpus, so per-shard phase p holds
    * (in distribution) the same difficulty band as a global phase p
    * would, while the window runs on shard-bounded partitions — no
    * single-partition global row_number, which is the scale-killer a
    * naive curriculum sort ships. A trainer reads phase p as "phase p
    * of every shard", shard-interleaved — the same contract as
    * [[packSequences]] bins. Ties (equal score) break on doc_id, so
    * the schedule is total and the oracle replays it exactly. */
  def curriculum(df: DataFrame, idCol: String, scoreCol: Column,
                 numShards: Int, numPhases: Int): DataFrame = {
    val w = Window.partitionBy("shard")
      .orderBy(col("score"), col("doc_id"))
    df.select(col(idCol).as("doc_id"), scoreCol.cast(LongType).as("score"))
      .withColumn("shard", hashBucket(col("doc_id"), numShards))
      .withColumn("phase", ntile(numPhases).over(w).cast(LongType))
      .withColumn("seq", row_number().over(w).cast(LongType))
  }

  /** Corpus card: the per-(source, lang) dataset report every corpus
    * release ships — document/token/char volumes, mean document length,
    * and the quality-gate pass rate — with ROLLUP subtotals per source
    * and a grand total in the same single shuffle (the
    * `Events.rollupMulti` convention: rolled-up keys surface as
    * '(all)', gid disambiguates levels).
    *
    * The per-document stats come from ONE fused text pass
    * ([[graft.functions.QualityCounts]]) and the keep flag is exactly
    * [[TextAnalysis.qualityScore]]'s gate, so the card's pass rate is
    * the same number the quality filter would enforce. Ratios are exact
    * ppm integers. One Expand + one map-combined aggregate — the
    * corpus is read once at any scale. */
  def corpusCard(df: DataFrame): DataFrame = {
    val per = docQualityStats(df)
    per.rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok_d").as("n_tokens"),
        sum("n_chars_d").as("n_chars"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        grouping_id().as("gid"))
      .select(coalesce(col("source"), lit("(all)")).as("source"),
        coalesce(col("lang"), lit("(all)")).as("lang"),
        col("gid").cast(LongType).as("gid"),
        col("n_docs"), col("n_tokens"), col("n_chars"), col("n_keep"),
        expr("n_tokens * 1000000 div n_docs").as("avg_tokens_q"),
        expr("n_keep * 1000000 div n_docs").as("keep_ppm"))
  }
}
