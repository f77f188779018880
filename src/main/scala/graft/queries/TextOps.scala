package graft.queries

import graft.Q
import graft.engine.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table (SURVEY.md §2B
  * B32, B34–B36 + the mandated language-ID / quality / token-count /
  * fingerprint extensions).
  *
  * Everything is expression-level (split/explode/groupBy) — no UDFs —
  * so whole-stage codegen covers the hot path and, at 100 TB, the only
  * shuffles are the per-token and per-group aggregations.
  */
object TextOps {

  private def tokens = split(lower(col("text")), " ")

  private val sqlTokens = "string_split(lower(text), ' ')"

  /** Documents read, deliberately NOT widened (an earlier r18 draft
    * put [[Tables.widen]] here): the text family's kernels are cheap
    * enough per row that the added fan-out exchange cost MORE than the
    * serial fold it parallelized at fixture sizes — the A/B measured
    * q_dedup_exact 1.24→0.75 s, q_text_cms_topk 1.44→0.69 s,
    * q_text_tfidf 2.22→1.68 s from removing it (widen stays only at
    * the heavy-kernel sites: ScalarFns JSON/variant parse, CurationOps
    * rolling-hash spans/classifier; see OPTIMIZATION_r18.md). */
  private def docsW(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  /** B32: exact dedup by normalized text — keep-first (min doc_id)
    * per group, with copy counts. */
  val dedupExact: Q = Q(
    "q_dedup_exact",
    (s, d) =>
      docsW(s, d)
        .groupBy(lower(trim(col("text"))).as("norm_text"))
        .agg(
          min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id"),
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY lower(trim(text)) ORDER BY keep_id"""))

  /** B34: tokenize → explode → stopword filter → term frequency. */
  val textTokens: Q = Q(
    "q_text_tokens",
    (s, d) =>
      docsW(s, d)
        .select(explode(tokens).as("token"))
        .where(col("token") =!= "" && !col("token").isin("a", "the"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc),
    Some(s"""SELECT token, count(*) AS n FROM (
      SELECT unnest($sqlTokens) AS token FROM documents)
    WHERE token != '' AND token NOT IN ('a', 'the')
    GROUP BY token ORDER BY n DESC, token ASC"""))

  /** B35: corpus statistics per language label. */
  val textStats: Q = Q(
    "q_text_stats",
    (s, d) =>
      docsW(s, d)
        .select(col("lang"), col("n_chars"),
          size(filter(tokens, x => x =!= "")).cast("long").as("n_tokens"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          Det.davg(col("n_chars"), 0).as("avg_chars"),
          sum(col("n_tokens")).as("sum_tokens"),
          Det.davg(col("n_tokens"), 0).as("avg_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang"),
    Some(s"""SELECT lang, count(*) AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      ${Det.sqlAvg("n_chars", 0)} AS avg_chars,
      CAST(sum(len(list_filter($sqlTokens, t -> t != ''))) AS BIGINT)
        AS sum_tokens,
      ${Det.sqlAvg(s"len(list_filter($sqlTokens, t -> t != ''))", 0)}
        AS avg_tokens,
      min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents GROUP BY lang ORDER BY lang"""))

  /** B36: TF-IDF scoring — tf per (doc, token) joined against document
    * frequency; idf = ln((N+1)/(df+1)); rounded to 6 decimals because
    * libm ln differs by ulps across engines. */
  val textTfidf: Q = Q(
    "q_text_tfidf",
    (s, d) => {
      val docs = docsW(s, d)
      val tok = docs
        .select(col("doc_id"), explode(tokens).as("token"))
        .where(col("token") =!= "")
      val tf = tok.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      // tf is already exactly one row per (doc_id, token), so document
      // frequency is a row count per token over tf — no second corpus
      // scan/explode/distinct pass.
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(df, "token")
        .crossJoin(broadcast(n))
        .select(
          col("doc_id"), col("token"), col("tf"), col("df"),
          round(col("tf").cast("double")
            * log((col("n_docs").cast("double") + lit(1.0))
              / (col("df").cast("double") + lit(1.0))), 6).as("tfidf"))
        .orderBy("doc_id", "token")
    },
    Some(s"""WITH tok AS (
      SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
    tok2 AS (SELECT * FROM tok WHERE token != ''),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok2
      GROUP BY doc_id, token),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, token, tf, df,
      round(CAST(tf AS DOUBLE) * ln((CAST(n_docs AS DOUBLE) + 1.0e0)
        / (CAST(df AS DOUBLE) + 1.0e0)), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    ORDER BY doc_id, token"""))

  /** Mandated EXT: n-gram/stopword-heuristic language ID. The fixture
    * text is vocabulary-uniform across lang labels, so the heuristic is
    * the operator under test (same scoring expression in both engines),
    * not a classifier benchmark.
    *
    * Scale (r15 — the one entry the sf20-canonical growth sweep left
    * on the watch list, adjudicated at 2.31×/doubling on an idle
    * best-of-5): the original form ran FOUR separate
    * `filter(tokens, isin)` higher-order functions, each
    * re-materializing the per-row token array — allocation/GC load
    * grew with the corpus and bit past the page-cache boundary. Now
    * ONE `aggregate` fold over the token array with all four counters
    * BIT-PACKED into a single long (16-bit lanes; the stopword sets
    * are disjoint so each token increments at most one lane): one
    * pass, one primitive accumulator, zero intermediate arrays. The
    * hit columns are lane extractions and the rest of the query —
    * and the DuckDB oracle, still the plain four-filter form — is
    * unchanged, so the rewrite is cross-checked end-to-end. Lane
    * bound: 65,535 hits per set per document; a corpus with
    * longer single documents widens lanes or falls back to the
    * filter form (the fixture's docs are 3 orders of magnitude
    * under it). Measured (idle best-of-4): sf5 2.61 → 1.29 s, sf20
    * 13.95 → 6.37 s — ~2× absolute at both scales, and the
    * per-doubling growth drops 2.31× → 2.22×, back inside the
    * settled 1.8–2.26 host band. */
  val textLangid: Q = Q(
    "q_text_langid",
    (s, d) => {
      val t = tokens
      def lane(ws: Seq[String], shift: Int) =
        (x: org.apache.spark.sql.Column) =>
          when(x.isin(ws.map(lit(_)): _*), lit(1L << shift))
      val packed = aggregate(t, lit(0L), (acc, x) =>
        acc + lane(Seq("the", "a", "of", "and"), 0)(x)
          .otherwise(lane(Seq("der", "die", "das", "und"), 16)(x)
            .otherwise(lane(Seq("el", "la", "los", "y"), 32)(x)
              .otherwise(lane(Seq("le", "les", "et", "du"), 48)(x)
                .otherwise(lit(0L))))))
      def laneOf(c: org.apache.spark.sql.Column, shift: Int) =
        shiftright(c, shift).bitwiseAND(lit(0xFFFFL))
      docsW(s, d)
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          packed.as("h"))
        .select(
          col("doc_id"), col("labeled_lang"),
          laneOf(col("h"), 0).as("en_hits"),
          laneOf(col("h"), 16).as("de_hits"),
          laneOf(col("h"), 32).as("es_hits"),
          laneOf(col("h"), 48).as("fr_hits"))
        .withColumn("predicted_lang",
          when(col("en_hits") >= greatest(col("de_hits"), col("es_hits"),
            col("fr_hits")) && col("en_hits") > 0, "en")
            .when(col("de_hits") >= greatest(col("es_hits"), col("fr_hits"))
              && col("de_hits") > 0, "de")
            .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
            .when(col("fr_hits") > 0, "fr")
            .otherwise("unknown"))
        .withColumn("agrees", col("predicted_lang") === col("labeled_lang"))
        .orderBy("doc_id")
    },
    Some(s"""WITH h AS (
      SELECT doc_id, lang AS labeled_lang,
        CAST(len(list_filter($sqlTokens,
          x -> x IN ('the','a','of','and'))) AS BIGINT) AS en_hits,
        CAST(len(list_filter($sqlTokens,
          x -> x IN ('der','die','das','und'))) AS BIGINT) AS de_hits,
        CAST(len(list_filter($sqlTokens,
          x -> x IN ('el','la','los','y'))) AS BIGINT) AS es_hits,
        CAST(len(list_filter($sqlTokens,
          x -> x IN ('le','les','et','du'))) AS BIGINT) AS fr_hits
      FROM documents)
    SELECT doc_id, labeled_lang, en_hits, de_hits, es_hits, fr_hits,
      CASE
        WHEN en_hits >= greatest(de_hits, es_hits, fr_hits) AND en_hits > 0
          THEN 'en'
        WHEN de_hits >= greatest(es_hits, fr_hits) AND de_hits > 0 THEN 'de'
        WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
        WHEN fr_hits > 0 THEN 'fr'
        ELSE 'unknown' END AS predicted_lang,
      CASE
        WHEN en_hits >= greatest(de_hits, es_hits, fr_hits) AND en_hits > 0
          THEN 'en'
        WHEN de_hits >= greatest(es_hits, fr_hits) AND de_hits > 0 THEN 'de'
        WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
        WHEN fr_hits > 0 THEN 'fr'
        ELSE 'unknown' END = labeled_lang AS agrees
    FROM h ORDER BY doc_id"""))

  /** Mandated EXT: quality scoring — length/stopword/char-class ratios
    * and a keep/drop verdict, the pre-training corpus filter shape. */
  val textQuality: Q = Q(
    "q_text_quality",
    (s, d) => {
      val t = filter(tokens, x => x =!= "")
      val nTok = size(t).cast("long")
      val nStop = size(filter(t, x => x.isin("a", "the", "of", "and")))
        .cast("long")
      val alpha = length(regexp_replace(col("text"), "[^a-z]", ""))
        .cast("long")
      docsW(s, d)
        .select(
          col("doc_id"), col("n_chars"),
          nTok.as("n_tokens"),
          nStop.as("n_stopwords"),
          (nStop.cast("double") / nTok).as("stopword_ratio"),
          alpha.as("n_alpha"),
          (alpha.cast("double") / col("n_chars")).as("alpha_ratio"),
          (nTok === 0).as("degenerate"),
          (nTok >= 20 && nTok <= 400
            && nStop.cast("double") / nTok < 0.5).as("keep"))
        .orderBy("doc_id")
    },
    Some(s"""WITH q AS (
      SELECT doc_id, n_chars,
        CAST(len(list_filter($sqlTokens, x -> x != '')) AS BIGINT)
          AS n_tokens,
        CAST(len(list_filter($sqlTokens,
          x -> x IN ('a','the','of','and'))) AS BIGINT) AS n_stopwords,
        CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
          AS n_alpha
      FROM documents)
    SELECT doc_id, n_chars, n_tokens, n_stopwords,
      CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
      n_alpha,
      CAST(n_alpha AS DOUBLE) / n_chars AS alpha_ratio,
      n_tokens = 0 AS degenerate,
      n_tokens >= 20 AND n_tokens <= 400
        AND CAST(n_stopwords AS DOUBLE) / n_tokens < 0.5e0 AS keep
    FROM q ORDER BY doc_id"""))

  /** Mandated EXT: content fingerprinting — md5 of normalized text, a
    * polynomial rolling hash over code points (mod 1e9+7 so both
    * engines stay in checked BIGINT range), and a coarse length bucket:
    * the exact-dup shard keys at scale. */
  val textFingerprint: Q = Q(
    "q_text_fingerprint",
    (s, d) =>
      docsW(s, d)
        .select(
          col("doc_id"),
          md5(lower(trim(col("text")))).as("fingerprint"),
          // Native one-pass kernel: the composed HOF form was O(n²) per
          // document (substr(text,i,1) rescans from the front) and
          // interpreted — see RollingHash's scaladoc.
          graft.functions.RollingHash(s, col("text")).as("rolling_hash"),
          (col("n_chars") / lit(100)).cast("long").as("len_bucket"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(lower(trim(text))) AS fingerprint,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(generate_series(1, length(text)),
          i -> CAST(ascii(text[i]) AS BIGINT))),
        (h, c) -> (h * 31 + c) % 1000000007) AS rolling_hash,
      CAST(n_chars // 100 AS BIGINT) AS len_bucket
    FROM documents ORDER BY doc_id"""))

  /** Mandated EXT: token counting two ways — whitespace tokens and a
    * BPE-ish regex lexer (letter runs / digit runs / single
    * punctuation), the pre-tokenizer shape of GPT-style BPE vocabularies. */
  val textTokencount: Q = Q(
    "q_text_tokencount",
    (s, d) =>
      docsW(s, d)
        .select(
          col("doc_id"),
          size(filter(split(lower(col("text")), " "), t => t =!= ""))
            .cast("long").as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
            .cast("long").as("bpe_tokens"),
          ceil(col("n_chars").cast("double") / 4.0).cast("long")
            .as("approx_llm_tokens"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
      CAST(len(list_filter(string_split(lower(text), ' '), t -> t != ''))
        AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
        AS BIGINT) AS bpe_tokens,
      CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0e0) AS BIGINT)
        AS approx_llm_tokens
    FROM documents ORDER BY doc_id"""))

  /** EXT: REAL subword tokenization — per-document token counts under
    * a learned BPE merge table (r8 verdict missing #3: the regex lexer
    * above is only BPE's PRE-tokenizer). The vocabulary is a committed
    * artifact (graft_bpe_merges.txt, learned from the corpus by
    * graft.TrainBpe — deterministic, reproducible byte-for-byte) and
    * encoding is the one-pass codegen'd functions.BpeTokenCount
    * kernel: narrow scan-speed projection, no shuffle, no UDF — the
    * shape that token-budget packing and mix-weight queries need at
    * 100 TB.
    *
    * No SQL oracle: greedy iterative merge application is not
    * SQL-expressible. TextSpec pins the semantics instead — the
    * invariant chain pieces ≤ bpe_real_tokens ≤ non-space chars, the
    * expression-vs-driver-encoder bit-equality, hand-built merge-table
    * cases, and trainer determinism. */
  val textBpeTokens: Q = Q(
    "q_text_bpe_tokens",
    (s, d) =>
      docsW(s, d)
        .select(
          col("doc_id"),
          size(expr(
            "regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
            .cast("long").as("pieces"),
          graft.functions.BpeTokenCount(s, col("text"))
            .as("bpe_real_tokens"))
        .orderBy("doc_id"),
    None)

  /** EXT: corpus n-gram frequency — top token bigrams with a
    * deterministic (count DESC, gram ASC) tie-break. The vocabulary /
    * collocation-analysis primitive: at 100 TB this is one explode +
    * one keyed aggregation (map-side partial combine carries the load;
    * the final top-k is a single-partition sort of the already-reduced
    * gram counts, not the corpus). */
  val textNgramFreq: Q = Q(
    "q_text_ngram_freq",
    (s, d) =>
      docsW(s, d)
        .select(filter(tokens, t => t =!= "").as("toks"))
        // sequence(1, 0) is DESCENDING in Spark, not empty — a 1-token
        // doc would fabricate null bigrams without this guard.
        .where(size(col("toks")) >= 2)
        // index-explode + outer element_at, not transform(seq, λ):
        // keeps the per-bigram work out of a lambda so Generate
        // inlining can't re-run the tokenization per element
        .select(col("toks"),
          explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
        .select(concat(element_at(col("toks"), col("i")), lit(" "),
          element_at(col("toks"), col("i") + 1)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(100),
    Some(s"""SELECT bigram, count(*) AS n FROM (
      SELECT unnest(list_transform(
        generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM (SELECT list_filter($sqlTokens, x -> x != '') AS t FROM documents))
    GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 100"""))

  // Portable CMS geometry: depth 4 hash rows (the affine-permutation
  // family of GramSketch.portableA/B over the RollingHash token hash),
  // width 2048 buckets — eps = e/w ≈ 1.3e-3, delta = e^-4 ≈ 1.8%.
  private val CmsDepth = 4
  private val CmsWidth = 2048L

  /** EXT: Count-Min-Sketch heavy hitters — the frequency-sketch
    * companion to the HLL cardinality family (q_agg_hll_sketch): exact
    * top-10 token counts beside their CMS estimates and the
    * never-underestimates invariant (Cormode & Muthukrishnan 2005).
    * The 100 TB story is the sketch's shape, proven in AggregatesSpec:
    * the sketch is a RELATIONAL fixed-size structure — at most
    * depth × width (r, bucket, cnt) rows from one map-side-combined
    * aggregate — that merges by elementwise addition, so per-shard
    * sketches re-aggregate to the global one bit-identically under any
    * partitioning (the property tie-order-dependent SpaceSaving
    * summaries lack) with no corpus re-scan. Estimates probe the
    * broadcast counter table on candidate rows only: min over the
    * depth rows of the bucket counts.
    *
    * r10 verdict's last flippable spec-only query, flipped r11: the
    * previous build used Spark's opaque `count_min_sketch` binary
    * (seeded Murmur3 — engine-specific, so no oracle could exist);
    * this one hashes with the portable polynomial + affine-permutation
    * family, every counter and estimate exact BIGINT arithmetic DuckDB
    * reproduces — the sketch CONTENT is now verified cross-engine, not
    * just its error bounds. */
  val textCmsTopk: Q = Q(
    "q_text_cms_topk",
    (s, d) => {
      val p = graft.functions.GramSketch.PortableP
      def bucketOf(g: Column, r: Int): Column =
        ((g * lit(graft.functions.GramSketch.portableA(r))
          + lit(graft.functions.GramSketch.portableB(r))) % p) % CmsWidth
      val tok = docsW(s, d)
        .select(explode(tokens).as("token"))
        .where(col("token") =!= "")
      // counters: ≤ depth×width rows no matter the corpus size
      val counters = tok
        .select(graft.functions.RollingHash(s, col("token")).as("g"))
        .select(posexplode(array((0 until CmsDepth).map(r =>
          bucketOf(col("g"), r)): _*)).as(Seq("r", "bucket")))
        .groupBy(col("r"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val exact = tok.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      val top = exact.orderBy(col("n_exact").desc, col("token").asc)
        .limit(10)
        .withColumn("g", graft.functions.RollingHash(s, col("token")))
      val probes = top.select(col("token"), col("n_exact"),
        posexplode(array((0 until CmsDepth).map(r =>
          bucketOf(col("g"), r)): _*)).as(Seq("r", "bucket")))
      // broadcast the FIXED-SIZE side (counters), never the corpus
      probes.join(broadcast(counters), Seq("r", "bucket"))
        .groupBy(col("token"), col("n_exact"))
        .agg(min(col("cnt")).as("n_cms"))
        .withColumn("overestimate", col("n_cms") >= col("n_exact"))
        .orderBy(col("n_exact").desc, col("token").asc)
    },
    Some {
      val p = graft.functions.GramSketch.PortableP
      val bucketSql =
        s"((g * ((2654435769 * (2 * r + 1)) % $p) + ((2246822507 * (r + 1)) % $p)) % $p) % $CmsWidth"
      s"""WITH tok AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), t -> t != ''))
        AS token
      FROM documents),
    gh AS (
      SELECT token, list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, length(token) + 1),
            i -> CAST(ord(substr(token, i, 1)) AS BIGINT))),
        (h, c) -> (h * 31 + c) % $p) AS g
      FROM (SELECT DISTINCT token FROM tok)),
    rs AS (SELECT unnest(range($CmsDepth)) AS r),
    counters AS (
      SELECT r, $bucketSql AS bucket, count(*) AS cnt
      FROM tok JOIN gh USING (token) CROSS JOIN rs
      GROUP BY r, bucket),
    exact AS (SELECT token, count(*) AS n_exact FROM tok GROUP BY token),
    top AS (
      SELECT token, n_exact FROM exact
      ORDER BY n_exact DESC, token ASC LIMIT 10),
    probes AS (
      SELECT t.token, t.n_exact, r, $bucketSql AS bucket
      FROM top t JOIN gh USING (token) CROSS JOIN rs)
    SELECT p.token, p.n_exact, min(c.cnt) AS n_cms,
      min(c.cnt) >= p.n_exact AS overestimate
    FROM probes p JOIN counters c ON p.r = c.r AND p.bucket = c.bucket
    GROUP BY p.token, p.n_exact
    ORDER BY n_exact DESC, token ASC"""
    })

  /** EXT: repetition-based quality signals (the Gopher repetition
    * rules, Rae et al. 2021 §A1.1): per-document duplicate-word
    * fraction and most-common-word share, macro-aggregated per source.
    * Repetitious text (boilerplate, SEO spam, generation loops) is the
    * highest-yield removal class after exact dedup, and it's invisible
    * to length/stopword heuristics (q_text_quality) — a looping doc
    * has perfectly normal word lengths.
    *
    * Scale shape: one explode + two keyed aggregations, all
    * expression-level. Source-level ratios are computed from INTEGER
    * sums with one final double division each (Det.scala float-parity
    * rule: never average per-row doubles across partitions). */
  val textRepetition: Q = Q(
    "q_text_repetition",
    (s, d) => {
      val tok = docsW(s, d)
        .select(col("doc_id"), col("source"),
          explode(tokens).as("token"))
        .where(col("token") =!= "")
      val perTok = tok
        .groupBy(col("source"), col("doc_id"), col("token"))
        .agg(count(lit(1)).as("n"))
      val perDoc = perTok
        .groupBy(col("source"), col("doc_id"))
        .agg(sum(col("n")).as("n_tok"),
          count(lit(1)).as("n_distinct"),
          max(col("n")).as("top_n"))
      perDoc
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          (lit(1.0) - sum(col("n_distinct")).cast("double")
            / sum(col("n_tok")).cast("double")).as("dup_word_frac"),
          (sum(col("top_n")).cast("double")
            / sum(col("n_tok")).cast("double")).as("top_token_share"))
        .orderBy("source")
    },
    Some(s"""WITH tok AS (
      SELECT doc_id, source, unnest($sqlTokens) AS token FROM documents),
    per_tok AS (
      SELECT source, doc_id, token, count(*) AS n
      FROM tok WHERE token != '' GROUP BY source, doc_id, token),
    per_doc AS (
      SELECT source, doc_id, sum(n) AS n_tok, count(*) AS n_distinct,
        max(n) AS top_n
      FROM per_tok GROUP BY source, doc_id)
    SELECT source, count(*) AS n_docs,
      CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      1.0 - CAST(sum(n_distinct) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
        AS dup_word_frac,
      CAST(sum(top_n) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
        AS top_token_share
    FROM per_doc GROUP BY source ORDER BY source"""))

  /** EXT: cross-source vocabulary overlap — pairwise token-set Jaccard
    * between sources, the corpus-composition diagnostic run before
    * choosing mixing weights (two crawls of the same sites will dedup
    * poorly and double-weight their content). NOT an all-pairs
    * document join: vocab is first collapsed to (source, token)
    * distinct rows, and the self-join keys on token — each token fans
    * out to at most C(|sources|, 2) pairs, so the shuffle is bounded
    * by vocab × sources², independent of document count. */
  val textSourceOverlap: Q = Q(
    "q_text_source_overlap",
    (s, d) => {
      val vocab = docsW(s, d)
        .select(col("source"), explode(tokens).as("token"))
        .where(col("token") =!= "")
        .distinct()
      val sizes = vocab.groupBy(col("source"))
        .agg(count(lit(1)).as("v"))
      val pairs = vocab.as("a")
        .join(vocab.as("b"), "token")
        .where(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_common"))
      pairs
        .join(broadcast(sizes.select(col("source").as("src_a"), col("v").as("va"))), "src_a")
        .join(broadcast(sizes.select(col("source").as("src_b"), col("v").as("vb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_common"),
          col("va"), col("vb"),
          (col("n_common").cast("double")
            / (col("va") + col("vb") - col("n_common")).cast("double"))
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""WITH vocab AS (
      SELECT DISTINCT source, token FROM (
        SELECT source, unnest($sqlTokens) AS token FROM documents)
      WHERE token != ''),
    sizes AS (SELECT source, count(*) AS v FROM vocab GROUP BY source),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM vocab a JOIN vocab b
        ON a.token = b.token AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT src_a, src_b, n_common, sa.v AS va, sb.v AS vb,
      CAST(n_common AS DOUBLE) / CAST(sa.v + sb.v - n_common AS DOUBLE)
        AS jaccard
    FROM pairs
      JOIN sizes sa ON pairs.src_a = sa.source
      JOIN sizes sb ON pairs.src_b = sb.source
    ORDER BY src_a, src_b"""))

  /** EXT: PII redaction — the corpus-hygiene masking pass a training
    * pipeline runs before anything ships: emails, IPv4 addresses,
    * phone-shaped numbers, then residual long digit runs (account
    * ids), each replaced by a typed mask token. A FIXED cascade order
    * (email → ip → phone → id) makes the composition deterministic —
    * the broader patterns run first so the digit-run catch-all only
    * sees what the typed classes left behind.
    *
    * The fixture's customer rows carry no natural PII, so each row is
    * extended with key-derived synthetic PII (the q_text_normalize
    * fixture-prefix discipline): every third row an email, every
    * fourth an IPv4, every fifth a phone — rows therefore vary across
    * all 8 presence combinations and the per-class flags are a real
    * signal, not constants. All four patterns are dialect-portable
    * (identical semantics in Java regex and RE2 — \b is an ASCII word
    * boundary in both, no backreferences). Narrow, codegen'd, no
    * shuffle: at 100 TB this runs at scan speed.
    *
    * RedactSpec additionally pins each pattern class on literal rows
    * (true-positive AND near-miss negatives). */
  /** The redaction cascade itself, reusable on any string column —
    * email → IPv4 → phone → residual 3+-digit runs, each to a typed
    * mask. Fixed order; every pattern dialect-portable (Java ≡ RE2). */
  private[graft] def redactCascade(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val r1 = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val r2 = regexp_replace(r1,
      "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")
    val r3 = regexp_replace(r2,
      "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>")
    regexp_replace(r3, "[0-9]{3,}", "<ID>")
  }

  val textRedact: Q = Q(
    "q_text_redact",
    (s, d) => {
      val key = col("c_custkey")
      def str(c: org.apache.spark.sql.Column) = c.cast("string")
      val email = when(key % 3 === 0,
        concat(lit(" email user"), str(key), lit("@mail.example.com")))
        .otherwise("")
      val ip = when(key % 4 === 0,
        concat(lit(" ip 10."), str(key % 256), lit("."),
          str((key * 7) % 256), lit("."), str((key * 13) % 256)))
        .otherwise("")
      val tel = when(key % 5 === 0,
        concat(lit(" tel "), str(key % 90 + 10), lit("-"),
          lpad(str(key % 1000), 3, "0"), lit("-"),
          lpad(str((key * 3) % 1000), 3, "0"), lit("-"),
          lpad(str((key * 7) % 10000), 4, "0")))
        .otherwise("")
      val pii = concat(col("c_name"), email, ip, tel)
      val r4 = redactCascade(pii)
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          r4.as("redacted"),
          r4.contains("<EMAIL>").as("had_email"),
          r4.contains("<IP>").as("had_ip"),
          r4.contains("<PHONE>").as("had_phone"),
          (pii =!= r4).as("was_redacted"))
        .orderBy("c_custkey")
    },
    Some("""WITH pii AS (
      SELECT c_custkey, c_name
        || CASE WHEN c_custkey % 3 = 0 THEN ' email user'
             || CAST(c_custkey AS VARCHAR) || '@mail.example.com'
           ELSE '' END
        || CASE WHEN c_custkey % 4 = 0 THEN ' ip 10.'
             || CAST(c_custkey % 256 AS VARCHAR) || '.'
             || CAST((c_custkey * 7) % 256 AS VARCHAR) || '.'
             || CAST((c_custkey * 13) % 256 AS VARCHAR)
           ELSE '' END
        || CASE WHEN c_custkey % 5 = 0 THEN ' tel '
             || CAST(c_custkey % 90 + 10 AS VARCHAR) || '-'
             || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
             || lpad(CAST((c_custkey * 3) % 1000 AS VARCHAR), 3, '0') || '-'
             || lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0')
           ELSE '' END AS t
      FROM customer),
    r AS (
      SELECT c_custkey, t,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
          '\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g'),
          '[0-9]{3,}', '<ID>', 'g') AS redacted
      FROM pii)
    SELECT c_custkey, redacted,
      contains(redacted, '<EMAIL>') AS had_email,
      contains(redacted, '<IP>') AS had_ip,
      contains(redacted, '<PHONE>') AS had_phone,
      t != redacted AS was_redacted
    FROM r ORDER BY c_custkey"""))

  /** EXT: Unicode normalization — NFC composition + diacritic
    * stripping via the native kernels (functions.TextNormalize),
    * named to match DuckDB's `nfc_normalize`/`strip_accents` so the
    * oracle is a true cross-engine check. The fixture text is ASCII,
    * so each row is prefixed with a deterministic accented literal
    * (picked by doc_id) covering the cases that matter: composed vs
    * DECOMPOSED é (same text, different bytes — the dedup-killer NFC
    * exists to fix), ß (no decomposition — must pass through), Ü/ï/ñ
    * (combining-mark strips). `nfc_len < raw_len` on the decomposed
    * rows is the normalization actually working. */
  val textNormalize: Q = Q(
    "q_text_normalize",
    (s, d) => {
      val pfx = when(col("doc_id") % 4 === 0, lit("Café "))
        .when(col("doc_id") % 4 === 1, lit("Café "))
        .when(col("doc_id") % 4 === 2, lit("Straße Über "))
        .otherwise(lit("naïve niño "))
      val sraw = concat(pfx, substring(col("text"), 1, 16))
      docsW(s, d)
        .select(
          col("doc_id"),
          graft.functions.NfcNormalize(s, sraw).as("nfc"),
          graft.functions.StripAccents(s, sraw).as("stripped"),
          length(sraw).cast("long").as("raw_len"),
          length(graft.functions.NfcNormalize(s, sraw)).cast("long")
            .as("nfc_len"))
        .orderBy("doc_id")
    },
    Some(s"""WITH sr AS (
      SELECT doc_id,
        CASE doc_id % 4
          WHEN 0 THEN 'Café '
          WHEN 1 THEN 'Café '
          WHEN 2 THEN 'Straße Über '
          ELSE 'naïve niño '
        END || substr(text, 1, 16) AS s
      FROM documents)
    SELECT doc_id,
      nfc_normalize(s) AS nfc,
      strip_accents(s) AS stripped,
      CAST(len(s) AS BIGINT) AS raw_len,
      CAST(len(nfc_normalize(s)) AS BIGINT) AS nfc_len
    FROM sr ORDER BY doc_id"""))

  /** EXT: unigram-LM quality score (perplexity proxy) — the
    * CCNet/Gopher-style signal: score each document by the mean
    * negative log-probability of its tokens under the corpus's OWN
    * unigram distribution. Boilerplate (all high-probability tokens)
    * scores low, rare-token noise scores high; both tails are filter
    * candidates. One explode pass feeds both the vocabulary counts and
    * the per-doc re-join; the vocabulary is broadcast — it grows
    * sublinearly in the corpus (Heaps' law), so at 100 TB it is an
    * O(vocab) model shipped to executors while the corpus side streams
    * (same posture as decontamination's broadcast eval-grams). Mean is
    * decimal-domain (Det.davg) so the per-doc sum of ln() doubles is
    * order-independent; ln itself is per-row on identical doubles in
    * both engines (the proven q_text_tfidf pattern). */
  val textUnigramLogprob: Q = Q(
    "q_text_unigram_logprob",
    (s, d) => {
      val tok = docsW(s, d)
        .select(col("doc_id"), explode(tokens).as("token"))
        .where(col("token") =!= "")
      val cnt = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val tot = tok.agg(count(lit(1)).as("tot"))
      tok.join(broadcast(cnt), "token")
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          // NO outer round: davg is already deterministic (per-token
          // -ln quantized to scale-6 decimal by dsum, exact sum, one
          // IEEE division). Rounding the MEAN is the r6-sf1-caught
          // anti-pattern: a scale-6 decimal sum over an integer count
          // systematically lands on exact scale-7 ".5" boundaries,
          // where Spark's round (shortest-repr BigDecimal) and
          // DuckDB's (binary value) disagree — 234 docs flipped at
          // sf1. round() is safe on PER-ROW transcendentals (their
          // values don't concentrate on decimal boundaries), not on
          // ratios of decimals.
          Det.davg(
            -log(col("cnt").cast("double") / col("tot").cast("double")), 6)
            .as("avg_neg_logprob"))
        .orderBy("doc_id")
    },
    Some(s"""WITH tok AS (
      SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
    tok2 AS (SELECT * FROM tok WHERE token != ''),
    cnt AS (SELECT token, count(*) AS cnt FROM tok2 GROUP BY token),
    tot AS (SELECT count(*) AS tot FROM tok2)
    SELECT doc_id, count(*) AS n_tokens,
      ${Det.sqlAvg("-ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))", 6)}
        AS avg_neg_logprob
    FROM tok2 JOIN cnt USING (token) CROSS JOIN tot
    GROUP BY doc_id ORDER BY doc_id"""))

  /** EXT: BM25 relevance scoring (Robertson & Zaragoza 2009; the
    * Lucene-standard idf form ln(1 + (N−df+0.5)/(df+0.5)), k1=1.2,
    * b=0.75) of every document against a fixed query-term set — the
    * retrieval primitive behind corpus search and RAG candidate
    * generation. Scale shape: one tokenize/explode pass filtered to the
    * query terms (so the per-token shuffle carries only matching
    * tokens, not the corpus), a per-term df aggregate (≤ |terms| rows,
    * broadcast), corpus stats (1 row, broadcast), then a per-doc
    * conditional-aggregation pivot so the final score adds the
    * per-term contributions in FIXED column order — double addition is
    * not associative, and letting sum() fold them in shuffle order
    * would diverge from the oracle in the last ulp. ln rounded at the
    * end to 6 decimals (libm ulp discipline, as q_text_tfidf). */
  val textBm25: Q = Q(
    "q_text_bm25",
    (s, d) => {
      val terms = Seq("spark", "vector", "query")
      val docs = docsW(s, d)
      val dl = docs.select(col("doc_id"),
        size(filter(tokens, t => t =!= "")).cast("double").as("dl"))
      val stats = dl.agg(
        count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl").cast("long")).cast("double")
          / count(lit(1))).as("avgdl"))
      // Filter INSIDE the array before exploding: the Generate emits
      // only query-term hits (~terms/doc), not every token (~50/doc) —
      // the per-token shuffle never sees non-matching tokens.
      val tf = docs
        .select(col("doc_id"),
          explode(filter(tokens,
            t => terms.map(q => t === q).reduce(_ || _))).as("t"))
        .groupBy(col("doc_id"), col("t"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).cast("double").as("df"))
      val sc = tf
        .join(broadcast(df), "t")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("t"),
          (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
              / (col("df") + lit(0.5)))
            * col("tf") * lit(2.2)
            / (col("tf")
              + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
            .as("sc"))
      val perTerm = terms.map(t =>
        coalesce(max(when(col("t") === t, col("sc"))), lit(0.0)))
      sc.groupBy(col("doc_id"))
        .agg(round(perTerm.reduce(_ + _), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(100)
    },
    Some(s"""WITH dl AS (
      SELECT doc_id,
        CAST(len(list_filter($sqlTokens, t -> t != '')) AS DOUBLE) AS dl
      FROM documents),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest($sqlTokens) AS t FROM documents)
      WHERE t IN ('spark', 'vector', 'query')
      GROUP BY doc_id, t),
    df AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t),
    sc AS (
      SELECT doc_id, t,
        ln(1.0e0 + (n_docs - df + 0.5e0) / (df + 0.5e0))
          * tf * 2.2e0
          / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)) AS sc
      FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN stats)
    SELECT doc_id,
      round(coalesce(max(CASE WHEN t = 'spark' THEN sc END), 0.0e0)
        + coalesce(max(CASE WHEN t = 'vector' THEN sc END), 0.0e0)
        + coalesce(max(CASE WHEN t = 'query' THEN sc END), 0.0e0), 6)
        AS bm25
    FROM sc GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 100"""))

  /** EXT: incremental dedup — the production shape exact dedup
    * actually runs in: a NEW batch (today's crawl, here the doc_id%10
    * slice) checked against the EXISTING corpus (everything else), not
    * all-vs-all. Novel docs pass; batch docs whose normalized text is
    * already in the corpus carry the corpus's canonical id. Same
    * normalization as q_dedup_exact. Scale: ONE hash shuffle of each
    * side on the normalized key (the corpus side pre-reduced to one
    * row per distinct text by the min-aggregate), no pair space —
    * exact-dedup cost however large the corpus. */
  val dedupIncremental: Q = Q(
    "q_dedup_incremental",
    (s, d) => {
      val docs = docsW(s, d)
        .select(col("doc_id"), lower(trim(col("text"))).as("norm_text"))
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
        .groupBy(col("norm_text"))
        .agg(min(col("doc_id")).as("dup_of"))
      docs.where(col("doc_id") % 10 === 0)
        .join(corpus, Seq("norm_text"), "left")
        .select(col("doc_id"), col("dup_of"),
          col("dup_of").isNull.as("is_novel"))
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
      SELECT lower(trim(text)) AS norm_text, min(doc_id) AS dup_of
      FROM documents WHERE doc_id % 10 != 0 GROUP BY 1)
    SELECT d.doc_id, c.dup_of, c.dup_of IS NULL AS is_novel
    FROM documents d LEFT JOIN corpus c ON lower(trim(d.text)) = c.norm_text
    WHERE d.doc_id % 10 = 0
    ORDER BY d.doc_id"""))

  /** EXT: character-entropy quality signal — Shannon entropy of each
    * document's character distribution, the compression-style gibberish
    * detector (near-zero entropy = repeated filler, abnormally high =
    * random noise; both are filter tails, complementing
    * [[textRepetition]]'s token-level signal). Per-char class
    * probabilities come from one (doc, char) aggregate; the per-doc
    * total is a window over the SAME key, so the histogram shuffle is
    * the only exchange (map-side combine collapses each partition to
    * ≤ |charset| rows per doc before it). The cross-class Σ p·ln p is
    * Det.dsum decimal-quantized (order-independent in both engines);
    * ln runs per-row on bitwise-identical ratio doubles (the
    * q_text_tfidf discipline). The fixture corpus is pure ASCII at
    * every scale point (verified sf0.01-sf1), so Spark's codepoint
    * split and DuckDB's grapheme split agree by construction.
    *
    * At 100 TB the explode-shuffle form here would move n_chars rows;
    * the production variant folds the per-row histogram with a native
    * char-count kernel (as rolling_hash does for fingerprints) and
    * shuffles nothing — kept SQL-expressible here so the oracle can
    * hash-check the semantics. */
  val textEntropy: Q = Q(
    "q_text_entropy",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val perChar = docsW(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "")).as("ch"))
        .where(col("ch") =!= "")
        .groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("cnt"))
      val tot = sum(col("cnt")).over(Window.partitionBy(col("doc_id")))
      val p = col("cnt").cast("double") / col("n_chars").cast("double")
      perChar
        .withColumn("n_chars", tot)
        .groupBy(col("doc_id"))
        .agg(
          max(col("n_chars")).as("n_chars"),
          count(lit(1)).as("n_classes"),
          (-Det.dsum(p * log(p), 6)).as("entropy"))
        .orderBy("doc_id")
    },
    Some(s"""WITH perchar AS (
      SELECT doc_id, ch, count(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
            FROM documents)
      WHERE ch != ''
      GROUP BY doc_id, ch),
    withtot AS (
      SELECT doc_id, cnt,
        sum(cnt) OVER (PARTITION BY doc_id) AS n_chars
      FROM perchar)
    SELECT doc_id,
      CAST(max(n_chars) AS BIGINT) AS n_chars,
      count(*) AS n_classes,
      -${Det.sqlSum(
        "(CAST(cnt AS DOUBLE) / CAST(n_chars AS DOUBLE))" +
          " * ln(CAST(cnt AS DOUBLE) / CAST(n_chars AS DOUBLE))", 6)}
        AS entropy
    FROM withtot GROUP BY doc_id ORDER BY doc_id"""))

  /** EXT (r14): hybrid retrieval with reciprocal-rank fusion — the
    * two-leg search shape every modern retrieval stack runs (lexical
    * BM25 + embedding cosine, fused by RRF: Cormack et al. 2009,
    * Σ 1/(60+rank)). Rank fusion is rank-space, not score-space, so
    * the legs need no score calibration against each other — which is
    * exactly why RRF is the production default.
    *
    * Leg shapes: the lexical leg is [[textBm25]]'s machinery (filter
    * inside the token array before the Generate, broadcast df/stats);
    * the vector leg is a brute-force cosine scan against one probe
    * vector — the declared baseline; at 100 TB the scan swaps for the
    * IVF/LSH candidate path (q_sim_ivf_topk / q_sim_lsh_topk) and the
    * fusion is unchanged. Each leg cuts to its top-100 via
    * orderBy+limit (TakeOrderedAndProject — no global sort), and the
    * partitionless row_number windows run AFTER the cut, over ≤100
    * rows — the one place an unpartitioned window is scale-correct.
    * Fusion is a full outer join of two 100-row sets.
    *
    * Determinism: legs rank on round(score, 6) with doc_id tiebreak;
    * RRF terms are 1/(60+rank) on integer ranks — bit-identical
    * doubles in both engines, summed in the same (lex, vec) order. */
  val searchHybrid: Q = Q(
    "q_search_hybrid",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val terms = Seq("spark", "vector", "query")
      val docs = docsW(s, d)
      // lexical leg: BM25(k1=1.2, b=0.75) over the fixed query terms
      val dl = docs.select(col("doc_id"),
        size(filter(tokens, t => t =!= "")).cast("double").as("dl"))
      val stats = dl.agg(
        count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl").cast("long")).cast("double")
          / count(lit(1))).as("avgdl"))
      val tf = docs
        .select(col("doc_id"),
          explode(filter(tokens,
            t => terms.map(q => t === q).reduce(_ || _))).as("t"))
        .groupBy(col("doc_id"), col("t"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).cast("double").as("df"))
      val perTerm = terms.map(t =>
        coalesce(max(when(col("t") === t, col("sc"))), lit(0.0)))
      val lex = tf
        .join(broadcast(df), "t")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("t"),
          (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
              / (col("df") + lit(0.5)))
            * col("tf") * lit(2.2)
            / (col("tf")
              + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
            .as("sc"))
        .groupBy(col("doc_id"))
        .agg(round(perTerm.reduce(_ + _), 6).as("bm25"))
      // partitionBy(doc_id % 1): both rank windows run AFTER the
      // top-100 cut, so a single partition is the scale-correct shape
      // — the constant-valued partition key says so EXPLICITLY and
      // keeps the plan out of WindowExec's "No Partition Defined"
      // warning, which otherwise floods the bench tail and trains
      // readers to ignore the one warning that flags REAL
      // unpartitioned-window mistakes (VERDICT r17 noise item). The
      // `% 1` (not `lit(0)`) matters: a foldable key is
      // constant-folded OUT of the partition spec and the warning
      // returns; a non-null column mod 1 is 0 on every row but
      // survives the optimizer.
      val wLex = Window.partitionBy(col("doc_id") % 1)
        .orderBy(col("bm25").desc, col("doc_id"))
      val lexTop = lex.orderBy(col("bm25").desc, col("doc_id")).limit(100)
        .select(col("doc_id"),
          row_number().over(wLex).cast("long").as("rank_lex"))
      // vector leg: cosine against the vec_id=0 probe embedding
      val emb = Tables.embeddings(s, d)
      val probe = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val vec = emb.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("doc_id"),
          round(graft.functions.CosineSimilarity(s,
            col("embedding"), col("qv")), 6).as("cos"))
      val wVec = Window.partitionBy(col("doc_id") % 1)
        .orderBy(col("cos").desc, col("doc_id"))
      val vecTop = vec.orderBy(col("cos").desc, col("doc_id")).limit(100)
        .select(col("doc_id"),
          row_number().over(wVec).cast("long").as("rank_vec"))
      lexTop.join(vecTop, Seq("doc_id"), "full")
        .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
          round(
            coalesce(lit(1.0) / (lit(60) + col("rank_lex")), lit(0.0))
              + coalesce(lit(1.0) / (lit(60) + col("rank_vec")), lit(0.0)),
            6).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""WITH dl AS (
      SELECT doc_id,
        CAST(len(list_filter($sqlTokens, t -> t != '')) AS DOUBLE) AS dl
      FROM documents),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest($sqlTokens) AS t FROM documents)
      WHERE t IN ('spark', 'vector', 'query')
      GROUP BY doc_id, t),
    df AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t),
    sc AS (
      SELECT doc_id, t,
        ln(1.0e0 + (n_docs - df + 0.5e0) / (df + 0.5e0))
          * tf * 2.2e0
          / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)) AS sc
      FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN stats),
    lex AS (
      SELECT doc_id,
        round(coalesce(max(CASE WHEN t = 'spark' THEN sc END), 0.0e0)
          + coalesce(max(CASE WHEN t = 'vector' THEN sc END), 0.0e0)
          + coalesce(max(CASE WHEN t = 'query' THEN sc END), 0.0e0), 6)
          AS bm25
      FROM sc GROUP BY doc_id),
    lex_top AS (
      SELECT doc_id,
        CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
          AS rank_lex
      FROM lex ORDER BY bm25 DESC, doc_id LIMIT 100),
    qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    vec AS (
      SELECT vec_id AS doc_id,
        round(${graft.functions.Vectors.sqlCosine("embedding", "qv")}, 6)
          AS cos
      FROM embeddings CROSS JOIN qv WHERE vec_id != 0),
    vec_top AS (
      SELECT doc_id,
        CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT)
          AS rank_vec
      FROM vec ORDER BY cos DESC, doc_id LIMIT 100)
    SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
      rank_lex, rank_vec,
      round(coalesce(1.0e0 / (60 + rank_lex), 0.0e0)
        + coalesce(1.0e0 / (60 + rank_vec), 0.0e0), 6) AS rrf
    FROM lex_top l FULL JOIN vec_top v ON l.doc_id = v.doc_id
    ORDER BY rrf DESC, doc_id LIMIT 20"""))

  val all: Seq[Q] = Seq(
    dedupExact, textTokens, textStats, textTfidf, textLangid, textQuality,
    textFingerprint, textTokencount, textBpeTokens, textNgramFreq,
    textRedact, textNormalize, textRepetition, textSourceOverlap,
    textCmsTopk, textUnigramLogprob, textBm25, dedupIncremental,
    textEntropy, searchHybrid)
}
