package graft.queries

import graft.Q
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the web-scale cleaning stages that sit
  * between a raw crawl and a training mix — substring-level exact
  * dedup statistics (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"), domain-blocklist filtering, and
  * hashed-feature linear quality scoring (the fastText-style scorer of
  * CCNet / RefinedWeb / FineWeb).
  *
  * Scale posture: dup-spans is one window-explode plus two keyed
  * shuffles (gram, doc) — the exact-substring inventory shape; the
  * blocklist and classifier are purely narrow per-row expressions that
  * run at scan speed. No UDFs anywhere; the only loop-shaped per-row
  * work (per-token hashing) rides the native `rolling_hash` kernel.
  */
object CurationOps {

  private val SpanWin = 40
  private val SpanStride = 10

  /** EXT: substring-level duplication profile — the ExactSubstr
    * statistic of Lee et al. 2022: fixed-width character windows
    * (width 40, stride 10, normalized text) inventoried corpus-wide; a
    * window is a duplicated span when its exact text occurs as a
    * window more than once anywhere in the corpus (same doc included —
    * internal boilerplate is duplication too). Per doc: window count,
    * duplicated-window count, duplicated fraction — the columns a
    * curation pass thresholds on to drop or trim boilerplate-heavy
    * documents.
    *
    * Plan: window explode (n_chars/stride rows per doc) → one keyed
    * aggregation on the window text for occurrence counts → rejoin on
    * the window key → per-doc aggregation. At 100 TB the window key
    * becomes its 64-bit rolling hash (the decontamination C35
    * discipline — strings here only for oracle parity), so the gram
    * shuffle moves (hash, doc_id) pairs; per-gram state is one
    * counter. Docs shorter than the window width surface with zero
    * windows rather than vanishing (left join back to the table).
    *
    * Parity: fixture text is ASCII, where Spark's `substr` and
    * DuckDB's `substr` agree position-for-position; `sequence` is
    * guarded (`sequence(1, 0)` is DESCENDING in Spark, not empty)
    * while DuckDB's `generate_series(1, n, s)` is empty for n<1. */
  val textDupSpans: Q = Q(
    "q_text_dup_spans",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val lt = lower(col("text"))
      val starts = when(length(lt) >= SpanWin,
        sequence(lit(1), length(lt) - lit(SpanWin - 1), lit(SpanStride)))
        .otherwise(array().cast("array<int>"))
      // widen: the window explode multiplies each doc into
      // n_chars/stride span rows — per-row work the single-split scan
      // would otherwise run serially (r18 qprofile: two 1-task stages
      // were 70% of the query).
      val w = Tables.widen(docs, col("doc_id"))
        .select(col("doc_id"), lt.as("lt"), explode(starts).as("i"))
        .select(col("doc_id"),
          col("lt").substr(col("i"), lit(SpanWin)).as("g"))
      // Frequency annotation via ONE window over the span exchange
      // (r19, guide §2.4 "two operations keyed the same way share one
      // exchange"): the r18 shape computed `w` twice — once partial-
      // aggregated into a df table, once exchanged for the w ⋈ df join
      // (sf20 qprofile: two explode passes writing 741 MB + 666 MB,
      // then a 1.4 GB join read). `count(*) OVER (PARTITION BY g)` is
      // the identical per-row frequency from a single explode pass and
      // a single exchange, no join.
      import org.apache.spark.sql.expressions.Window
      val per = w
        .withColumn("c", count(lit(1)).over(Window.partitionBy(col("g"))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
      docs.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_windows"), lit(0L)).as("n_windows"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          round(when(coalesce(col("n_windows"), lit(0L)) === 0, lit(0.0))
            .otherwise(col("n_dup_windows").cast("double") /
              col("n_windows")), 6).as("dup_frac"))
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (
      SELECT doc_id,
        substr(lower(text), CAST(i AS INTEGER), $SpanWin) AS g
      FROM documents,
        unnest(generate_series(1, length(text) - ${SpanWin - 1},
          $SpanStride)) AS t(i)),
    df AS (SELECT g, count(*) AS c FROM w GROUP BY g),
    per AS (
      SELECT w.doc_id, count(*) AS n_windows,
        sum(CASE WHEN df.c > 1 THEN 1 ELSE 0 END) AS n_dup
      FROM w JOIN df USING (g) GROUP BY w.doc_id)
    SELECT d.doc_id,
      CAST(coalesce(per.n_windows, 0) AS BIGINT) AS n_windows,
      CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_windows,
      round(CASE WHEN coalesce(per.n_windows, 0) = 0 THEN 0.0e0
        ELSE CAST(per.n_dup AS DOUBLE) / per.n_windows END, 6) AS dup_frac
    FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id"""))

  /** The blocklist is part of the declared semantics (mirrored in the
    * oracle). Entries match whole registrable suffixes only —
    * `fr.example.org` blocks `src3.fr.example.org` but can never block
    * `notfr.example.org` — which is why the implementation enumerates
    * dot-boundary suffixes instead of substring-matching. */
  private val Blocklist =
    Seq("fr.example.org", "src1.en.example.com", "blocked.example.net")

  /** True when any dot-boundary suffix of `host` is blocklisted.
    * Package-visible so CurationSpec can pin the boundary semantics
    * (`notfr.example.org` must NOT match `fr.example.org`). */
  private[graft] def blockedExpr(host: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val parts = split(host, "\\.")
    val sufs = transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
    exists(sufs, su => su.isin(Blocklist: _*))
  }

  /** EXT: domain-blocklist filter — the crawl-hygiene stage every web
    * corpus runs (UT1/adult blocklists in CCNet/RefinedWeb): each
    * document's provenance host (synthesized from metadata, the
    * q_fn_url discipline) is blocked when ANY dot-boundary suffix of
    * it appears in the blocklist. Declared output is the per-source
    * audit: docs seen / blocked / kept and the blocked share.
    *
    * Plan: suffix enumeration is a narrow per-row `transform` over the
    * ≤4 host labels and membership an `InSet` — zero joins, zero
    * shuffles before the per-source aggregate, scan speed at 100 TB.
    * The shape generalizes: a blocklist too large to inline (millions
    * of domains) becomes `explode(suffixes) ⋈ broadcast(blocklist)` —
    * still one narrow explode and a broadcast hash join, never a
    * per-rule LIKE scan (which is rules × corpus and unpushable). */
  val filterBlocklist: Q = Q(
    "q_filter_blocklist",
    (s, d) => {
      val host = concat_ws(".", col("source"), col("lang"), lit("example"),
        when(col("doc_id") % 3 === 0, "com").otherwise("org"))
      val blocked = blockedExpr(host)
      Tables.documents(s, d)
        .select(col("source"), blocked.as("blocked"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"),
          sum(when(col("blocked"), 0L).otherwise(1L)).as("n_kept"))
        .withColumn("pct_blocked",
          round(col("n_blocked").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    },
    Some(s"""WITH h AS (
      SELECT doc_id, source,
        source || '.' || lang || '.example.' ||
          (CASE WHEN doc_id % 3 = 0 THEN 'com' ELSE 'org' END) AS host
      FROM documents),
    b AS (
      SELECT source,
        len(list_filter(
          list_transform(generate_series(1, len(string_split(host, '.'))),
            i -> array_to_string(
              string_split(host, '.')[CAST(i AS INTEGER):], '.')),
          s2 -> s2 IN (${Blocklist.map(e => s"'$e'").mkString(",")}))) > 0
          AS blocked
      FROM h)
    SELECT source, count(*) AS n_docs,
      CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
      CAST(sum(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
      round(CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*), 6) AS pct_blocked
    FROM b GROUP BY source ORDER BY source"""))

  private val FeatBuckets = graft.functions.TokenWeightSum.FeatBuckets
  private val WeightPrime = graft.functions.TokenWeightSum.WeightPrime
  private val WeightMix = graft.functions.TokenWeightSum.WeightMix

  /** EXT: hashed-feature linear quality classifier — the fastText-style
    * scorer behind CCNet / RefinedWeb / FineWeb-Edu quality filtering,
    * in its deterministic skeleton: token → feature bucket via the
    * rolling hash mod 2^16, bucket → weight via a fixed multiplicative
    * mix into [-0.5, 0.5), document score = mean token weight, keep =
    * score > 0. A trained model swaps the weight FORMULA for a learned
    * table; the plumbing — per-token hashing, bucket lookup, length
    * normalization, sigmoid calibration — is exactly this and is what
    * must scale.
    *
    * Plan: entirely narrow per-row expressions (no shuffle at all
    * before the final sort). The per-document loop is the native
    * one-pass `token_weight_sum` kernel ([[graft.functions.
    * TokenWeightSum]]) over Spark's own `lower()`: r18 replaced the
    * original `aggregate(transform(filter(split(…))))` composition
    * after BenchOne showed the HOF lambda's interpreted per-token
    * eval (boxed doubles + per-token String decode + two materialized
    * arrays per doc) at 8.5 s steady-state / 32 s in-schedule at sf20
    * vs ~1 s for the kernel — same bit-exact fold, pinned against the
    * retained HOF form in CurationSpec. All integer steps stay
    * under 2^53 (65535 · WeightMix ≈ 1.7e14). `prob` (the only libm
    * value, one exp) is rounded to 6dp — the C99/PSI discipline;
    * `score` itself is exact-fold arithmetic and ships unrounded. */
  val textQualityClassifier: Q = Q(
    "q_text_quality_classifier",
    (s, d) => {
      val tw = graft.functions.TokenWeightSum(s, lower(col("text")))
      // NOT widened: the native kernel is fast enough that the fan-out
      // exchange costs more than the serial fold it would parallelize
      // (canonical 0.17 s un-widened vs 0.66 s widened at sf0.1); the
      // r18 win for this query is the kernel itself (interpreted HOF
      // loop → TokenWeightSum codegen, 4.3× at sf20 — see SCALE.md).
      val e = Tables.documents(s, d)
        .select(col("doc_id"), tw.as("tw"))
        .select(col("doc_id"),
          col("tw.n_tokens").as("n_tokens"),
          col("tw.wsum").as("wsum"))
        .withColumn("score",
          when(col("n_tokens") === 0, lit(0.0))
            .otherwise(col("wsum") / col("n_tokens")))
      e.select(col("doc_id"), col("n_tokens"), col("score"),
          round(lit(1.0) / (lit(1.0) + exp(col("score") * -4.0)), 6)
            .as("prob"),
          (col("score") > 0).as("keep"))
        .orderBy("doc_id")
    },
    Some(s"""WITH q AS (
      SELECT doc_id,
        list_filter(string_split(lower(text), ' '), t -> t != '') AS toks
      FROM documents),
    sc AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(toks, t ->
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(generate_series(1, length(t)), i ->
                  CAST(ascii(t[CAST(i AS INTEGER)]) AS BIGINT))),
              (h, c) -> (h * 31 + c) % 1000000007)
              % $FeatBuckets * $WeightMix % $WeightPrime AS DOUBLE)
              / $WeightPrime.0e0 - 0.5e0)),
          (a, b) -> a + b) AS wsum
      FROM q),
    e AS (
      SELECT doc_id, n_tokens,
        CASE WHEN n_tokens = 0 THEN 0.0e0
          ELSE wsum / n_tokens END AS score
      FROM sc)
    SELECT doc_id, n_tokens, score,
      round(1.0e0 / (1.0e0 + exp(score * -4.0e0)), 6) AS prob,
      score > 0 AS keep
    FROM e ORDER BY doc_id"""))

  val all: Seq[Q] =
    Seq(textDupSpans, filterBlocklist, textQualityClassifier)
}
