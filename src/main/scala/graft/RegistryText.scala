package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Text-analysis family of the extension registry — token stats,
  * quality, langid, fingerprints, PII scrub, repetition stats. See
  * [[RegistryShared]]. */
private[graft] trait RegistryText extends RegistryShared {
  // ---------------------------------------------------------------------
  // Text analysis
  // ---------------------------------------------------------------------

  private val HeavyHittersK = 25

  protected val text: Map[String, Q] = Map(
    // Model-based quality filter: fixed-weight integer logit over the
    // fused-pass features — the fastText-classifier stage shape.
    "tx_quality_model" -> ((s, dir) =>
      TextAnalysis.qualityModelScore(t(s, dir, "documents"), "doc_id",
        "text", QmWStop, QmWPunct, QmWLen, QmBias)
        .orderBy("doc_id")),
    // DSIR importance weights: target = the lang='en' subset, base =
    // the whole corpus; one tokenization counts both LMs.
    "tx_dsir_score" -> ((s, dir) =>
      TextAnalysis.dsirScore(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
        .orderBy("doc_id")),
    "tx_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "tx_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "tx_langid" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "tx_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    // Sketch-prefiltered exact heavy hitters: Misra-Gries candidates
    // (bounded map-side state at any vocabulary size) → exact count +
    // rank of candidates only. Oracle = the plain exact top-k; equality
    // holds whenever the k-th count clears the sketch error bound
    // (trivially true at fixture vocabulary).
    "tx_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(t(s, dir, "documents"), "text",
        HeavyHittersK)),
    // Fixed-point tf-idf ranking (integer score — ln's last-ulp
    // divergence between JVM and libm would break hash parity).
    "tx_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text",
          topN = 3)
        .orderBy("doc_id", "rank")),
    // C4-style line cleaning. The fixture text is single-line, so the
    // query first breaks sentences into lines ('. ' → '.\n') the same
    // way on both sides — the cleaning then has real lines to judge.
    "tx_c4_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "\\. ", ".\n").as("text"))
      TextAnalysis.c4LineClean(docs, "doc_id", "text").orderBy("doc_id")
    }),
    // Corpus-level duplicated-line removal over the DOUBLED corpus
    // (each doc + a copy whose last line gains 3 trailing tokens):
    // every shared line appears ≥ 2× and is dropped as boilerplate;
    // only the diverging last lines survive. Same '. '→'.\n' sentence
    // breaking as tx_c4_clean so the pass has real lines to count.
    "tx_line_dedup" -> ((s, dir) => {
      val broken = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "\\. ", ".\n").as("text"))
      val doubled = broken.unionAll(broken.select(
        (col("doc_id") + IdShift).as("doc_id"),
        concat(col("text"), lit(" zzz zzz zzz")).as("text")))
      TextAnalysis.lineDedup(doubled, "doc_id", "text").orderBy("doc_id")
    }),
    // PII scrub. The fixture text has no PII, so the query plants
    // deterministic PII derived from real columns (same construction in
    // the oracle): an email on 4 of 5 docs, an IPv4 on all, a phone on
    // every third — zero-count paths stay covered.
    "tx_pii_scrub" -> ((s, dir) =>
      TextAnalysis.piiScrub(plantPii(t(s, dir, "documents")),
        "doc_id", "text").orderBy("doc_id")),
    // Gopher-style repetition stats (integer ppm ratios — exact on both
    // engines; bigram tiebreak is lexicographic max(struct)).
    "tx_rep_stats" -> ((s, dir) =>
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"))
  )

  protected val textOracles: Map[String, String] = Map(
    "tx_token_stats" ->
      s"""WITH w AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)
         |SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.wordPattern}')) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.bpePattern}')) AS BIGINT) AS n_bpe,
         |  CAST(list_sum(list_transform(w, t -> len(t))) AS BIGINT) AS n_token_chars,
         |  CASE WHEN len(w) > 0
         |    THEN CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) / len(w)
         |    ELSE 0.0 END AS avg_token_len
         |FROM w ORDER BY doc_id""".stripMargin,
    "tx_quality_model" -> qualityModelOracleSql,
    "tx_dsir_score" ->
      """WITH tk AS (SELECT doc_id, lang = 'en' AS is_target,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |c AS (SELECT t, CAST(count(*) AS BIGINT) AS cb,
        |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ct
        |  FROM tk GROUP BY t),
        |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS tb,
        |    CAST(sum(ct) AS BIGINT) AS tt,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM c),
        |imp AS (SELECT t,
        |    CAST(length(bin((tb + v) // (cb + 1))) AS BIGINT)
        |      - CAST(length(bin((tt + v) // (ct + 1))) AS BIGINT)
        |      AS imp_bits
        |  FROM c CROSS JOIN tot),
        |pd AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(imp.imp_bits) AS BIGINT) AS imp_bits_total
        |  FROM tk JOIN imp USING (t) GROUP BY tk.doc_id)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_target,
        |  coalesce(pd.n_tokens, 0) AS n_tokens,
        |  coalesce(pd.imp_bits_total, 0) AS imp_bits_total,
        |  CASE WHEN coalesce(pd.n_tokens, 0) > 0
        |    THEN pd.imp_bits_total * 1000000 // pd.n_tokens
        |    ELSE 0 END AS score_ppm
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "tx_quality" -> {
      val en = inList(TextAnalysis.stopwords.toMap.apply("en"))
      s"""WITH w AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(text) AS BIGINT) AS n_chars,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(len(list_filter(w, t -> t IN ($en))) AS BIGINT) AS n_stopwords
         |FROM w)
         |SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
         |  CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
         |  CASE WHEN n_tokens > 0 THEN CAST(n_stopwords AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_ratio,
         |  (n_tokens >= 5 AND n_tokens <= 100000
         |   AND (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) < 0.2) AS quality_keep
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "tx_langid" -> {
      val scores = TextAnalysis.stopwords.map { case (l, ws) =>
        s"CAST(len(list_filter(w, t -> t IN (${inList(ws)}))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val best = TextAnalysis.stopwords.map { case (l, _) => s"s_$l" }
        .mkString("greatest(", ", ", ")")
      val cases = TextAnalysis.stopwords.map { case (l, _) =>
        s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
      }.mkString("\n    ")
      s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |s AS (SELECT doc_id,
         |  $scores
         |FROM w)
         |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
         |  CASE $cases
         |    ELSE 'und' END AS lang_guess
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "tx_fingerprint" -> {
      // Polynomial window hash with the SAME base/modulus constants as
      // graft.functions.RollingHash — power literals inlined.
      val pw = graft.functions.RollingHash.powers(8)
      val terms = (0 until 8)
        .map(k => s"CAST(unicode(p[i + $k : i + $k]) AS BIGINT) * ${pw(7 - k)}")
        .mkString(" + ")
      s"""WITH n AS (SELECT doc_id,
         |  regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm FROM documents),
         |pd AS (SELECT doc_id, norm,
         |  CASE WHEN length(norm) < 8 THEN rpad(norm, 8, chr(1))
         |       ELSE norm END AS p FROM n)
         |SELECT doc_id, md5(norm) AS content_md5,
         |  CAST(list_min(list_transform(range(1, length(p) - 6),
         |    i -> ($terms) % 4294967296)) AS BIGINT) AS min_gram_hash
         |FROM pd ORDER BY doc_id""".stripMargin
    },
    // The heavy-hitters oracle is the PLAIN exact top-k — no sketch
    // anywhere in it (the sketch only nominates candidates).
    "tx_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
         |  FROM documents)
         |SELECT token, count(*) AS n FROM tk
         |GROUP BY token ORDER BY n DESC, token LIMIT $HeavyHittersK""".stripMargin,
    // Integer floor-division score both sides (Spark `div`, DuckDB `//`);
    // ASCII-only terms, lowercased after extraction (locale-free).
    "tx_tfidf" ->
      """WITH tok AS (SELECT doc_id, lower(t) AS term FROM
        |  (SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z]+')) AS t
        |   FROM documents)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |sc AS (SELECT t.doc_id, t.term, t.tf, d.df,
        |  t.tf * 1000000 // d.df AS score_q,
        |  CAST(row_number() OVER (PARTITION BY t.doc_id
        |    ORDER BY t.tf * 1000000 // d.df DESC, t.term) AS BIGINT) AS "rank"
        |  FROM tf t JOIN dfreq d USING (term))
        |SELECT doc_id, term, tf, df, score_q, "rank"
        |FROM sc WHERE "rank" <= 3 ORDER BY doc_id, "rank"""".stripMargin,
    "tx_pii_scrub" -> {
      // Counts and the replace chain are generated from the SAME
      // pattern list as the Spark plan (TextAnalysis.piiPatterns).
      val counts = TextAnalysis.piiPatterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n  ")
      val scrub = TextAnalysis.piiPatterns.foldLeft("text") {
        case (c, (_, pat, token)) =>
          s"regexp_replace($c, '$pat', '$token', 'g')"
      }
      s"""WITH p AS (SELECT doc_id, concat_ws(' ', text,
         |  CASE WHEN doc_id % 5 <> 0 THEN source || '.' || lang || '@example.com' END,
         |  '10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR),
         |  CASE WHEN doc_id % 3 = 0 THEN '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END
         |) AS text FROM documents)
         |SELECT doc_id,
         |  $counts,
         |  $scrub AS scrubbed
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "tx_rep_stats" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS t FROM w),
        |wc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
        |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |  count(*) AS n_distinct,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_tokens
        |  FROM wc GROUP BY doc_id),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        |  THEN list_transform(generate_series(1, len(w) - 1),
        |                      i -> w[i] || ' ' || w[i+1])
        |  ELSE CAST([] AS VARCHAR[]) END) AS g FROM w),
        |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
        |bt AS (SELECT doc_id, max(struct_pack(c := c, g := g)) AS top
        |  FROM bc GROUP BY doc_id)
        |SELECT a.doc_id, n_words, n_distinct, n_dup_tokens,
        |  n_dup_tokens * 1000000 // n_words AS dup_frac_ppm,
        |  COALESCE(top.g, '') AS top_bigram,
        |  CAST(COALESCE(top.c, 0) AS BIGINT) AS top_bigram_n,
        |  CAST(COALESCE(top.c * 2000000 // n_words, 0) AS BIGINT) AS top_bigram_ppm
        |FROM wa a LEFT JOIN bt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Line-dedup oracle: the frequency key is the normalized line
    // STRING (the Spark side counts md5 digests of the same key — equal
    // results absent a 128-bit collision, the dd_substring convention).
    "tx_line_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_replace(text, '\\. ', '.' || chr(10), 'g') AS text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $IdShift,
         |    regexp_replace(text, '\\. ', '.' || chr(10), 'g') || ' zzz zzz zzz' FROM documents),
         |s AS (SELECT doc_id, str_split(text, chr(10)) AS ln FROM d),
         |l AS (SELECT doc_id, unnest(generate_series(1, len(ln))) AS pos, ln FROM s),
         |lx AS (SELECT doc_id, pos, ln[pos] AS line FROM l),
         |boiler AS (SELECT lower(trim(line)) AS k FROM lx
         |  GROUP BY lower(trim(line)) HAVING count(*) >= 2),
         |keep AS (SELECT doc_id, pos, line FROM lx
         |  WHERE lower(trim(line)) NOT IN (SELECT k FROM boiler)),
         |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         |    count(*) AS n_kept FROM keep GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
         |  CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(len(str_split(d.text, chr(10))) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_dropped
         |FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "tx_c4_clean" ->
      """WITH d AS (SELECT doc_id,
        |  str_split(regexp_replace(text, '\. ', '.' || chr(10), 'g'),
        |            chr(10)) AS lines FROM documents),
        |k AS (SELECT doc_id, lines,
        |  list_filter(lines, l ->
        |    regexp_matches(trim(l), '[.!?"'']$')
        |    AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
        |    AND NOT contains(lower(trim(l)), 'javascript')
        |    AND NOT contains(lower(trim(l)), 'cookie')
        |    AND NOT contains(lower(trim(l)), '{')) AS keep FROM d)
        |SELECT doc_id,
        |  COALESCE(array_to_string(keep, chr(10)), '') AS clean_text,
        |  CAST(len(keep) AS BIGINT) AS n_kept,
        |  CAST(len(lines) - len(keep) AS BIGINT) AS n_dropped
        |FROM k ORDER BY doc_id""".stripMargin
  )

}
