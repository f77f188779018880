package graft

import graft.queries.CurationOps
import org.apache.spark.sql.functions._

/** Semantics of the curation operators (C102-C104): substring-level
  * dup spans, domain-blocklist filtering, hashed-feature quality
  * scoring. The oracle checks value parity; these pin the edge cases
  * the fixture may not cover.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("dup_spans: every doc surfaces; short docs have zero windows") {
    val df = q("q_text_dup_spans").cache()
    val docs = graft.engine.Tables.documents(spark, sf)
    assert(df.count() == docs.count())
    // dup windows never exceed windows; fractions stay in [0,1]
    assert(df.where(col("n_dup_windows") > col("n_windows")).isEmpty)
    assert(df.where(col("dup_frac") < 0 || col("dup_frac") > 1).isEmpty)
    // a doc shorter than the 40-char window must report 0 windows and
    // dup_frac 0 (not vanish, not NaN)
    val short = docs.where(length(col("text")) < 40).select("doc_id")
    val joined = df.join(short, Seq("doc_id"))
    assert(joined.where(col("n_windows") =!= 0 || col("dup_frac") =!= 0.0)
      .isEmpty)
    // window accounting: a doc of length n >= 40 has
    // floor((n-40)/10)+1 windows
    val expected = docs
      .select(col("doc_id"),
        when(length(col("text")) >= 40,
          floor((length(col("text")) - 40) / 10) + 1).otherwise(0L)
          .cast("long").as("want"))
    assert(df.join(expected, Seq("doc_id"))
      .where(col("n_windows") =!= col("want")).isEmpty)
    df.unpersist()
  }

  test("dup_spans: identical texts mark all their windows duplicated") {
    // Two identical 60-char docs: every window of each occurs twice
    // corpus-wide -> dup_frac 1.0. Doc 3 is 60 distinct-window chars —
    // note "z"*60 would NOT work: its three windows are all "z"*40,
    // i.e. WITHIN-doc repetition, which the operator deliberately
    // counts as duplication.
    val text = "a" * 25 + " the quick brown fox jumps over " + "b" * 3
    val other = "the five boxing wizards jump quickly over those lazy dogs no"
    assert(text.length == 60 && other.length == 60)
    val docs = Seq((1L, text), (2L, text), (3L, other))
      .toDF("doc_id", "text")
    // same pipeline shape as the query, over a synthetic corpus
    val lt = lower(col("text"))
    val starts = when(length(lt) >= 40,
      sequence(lit(1), length(lt) - lit(39), lit(10)))
      .otherwise(array().cast("array<int>"))
    val w = docs.select(col("doc_id"), lt.as("lt"), explode(starts).as("i"))
      .select(col("doc_id"), col("lt").substr(col("i"), lit(40)).as("g"))
    val dfc = w.groupBy("g").agg(count(lit(1)).as("c"))
    val per = w.join(dfc, Seq("g")).groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, dup) => id -> ((n, dup)) }.toMap
    assert(per(1L) == (3L, 3L) && per(2L) == (3L, 3L))
    assert(per(3L) == (3L, 0L))
  }

  test("blocklist: suffix matching respects dot boundaries") {
    val hosts = Seq(
      ("src3.fr.example.org", true),   // proper suffix match
      ("fr.example.org", true),        // exact match
      ("notfr.example.org", false),    // label-boundary: must NOT match
      ("src1.en.example.com", true),
      ("xsrc1.en.example.com", false), // leading-label boundary
      ("en.example.com", false),       // parent of an entry: not listed
      ("fr.example.org.evil.com", false), // entry mid-host, not a suffix
      ("org", false))
      .toDF("host", "want")
    val got = hosts.select(col("host"), col("want"),
      CurationOps.blockedExpr(col("host")).as("got"))
    assert(got.where(col("got") =!= col("want")).isEmpty,
      got.collect().mkString(","))
  }

  test("blocklist: per-source counts are consistent and complete") {
    val df = q("q_filter_blocklist").cache()
    val docs = graft.engine.Tables.documents(spark, sf)
    assert(df.agg(sum("n_docs")).head().getLong(0) == docs.count())
    assert(df.where(col("n_blocked") + col("n_kept") =!= col("n_docs"))
      .isEmpty)
    assert(df.count() ==
      docs.select("source").distinct().count())
    df.unpersist()
  }

  test("quality classifier: score bounds, keep flag, empty-doc neutral") {
    val df = q("q_text_quality_classifier").cache()
    // mean of weights in [-0.5, 0.5) stays in [-0.5, 0.5]
    assert(df.where(col("score") < -0.5 || col("score") > 0.5).isEmpty)
    assert(df.where(col("keep") =!= (col("score") > 0)).isEmpty)
    assert(df.where(col("prob") < 0 || col("prob") > 1).isEmpty)
    // prob is monotone in score: the max-score doc has the max prob
    val top = df.orderBy(col("score").desc).limit(1).head()
    val maxProb = df.agg(max("prob")).head().getDouble(0)
    assert(top.getAs[Double]("prob") == maxProb)
    df.unpersist()
  }

  test("quality classifier: native kernel is bit-identical to the HOF form") {
    // The r18 kernel swap (functions.TokenWeightSum) must preserve the
    // original composed-HOF semantics EXACTLY — same token boundaries,
    // same per-token hash, same left-to-right IEEE sum — or the DuckDB
    // oracle's hash check breaks. Edge cases the fixture may not cover:
    // empty text, all-spaces, consecutive/leading/trailing spaces,
    // uppercase (the kernel takes Spark's own lower()), non-ASCII incl.
    // an astral-plane code point (𝄞 — charCount 2), and a long doc.
    val docs = (Seq(
      "", " ", "   ", "a", " a", "a ", "a  b", "  a  b  c ",
      "The QUICK Brown FOX", "é À ß Ü ñ 𝄞clef 𝄞 x",
      "single-token-no-spaces", "1 22 333 4444 55555"
    ) ++ Seq.tabulate(5)(i =>
      Seq.tabulate(200)(j => s"tok${i}_$j").mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val lt = lower(col("text"))
    val toks = filter(split(lt, " "), t => t =!= "")
    val weights = transform(toks, t =>
      (graft.functions.RollingHash(spark, t)
        % graft.functions.TokenWeightSum.FeatBuckets
        * graft.functions.TokenWeightSum.WeightMix
        % graft.functions.TokenWeightSum.WeightPrime).cast("double")
        / lit(graft.functions.TokenWeightSum.WeightPrime.toDouble)
        - lit(0.5))
    val hof = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      aggregate(weights, lit(0.0), (a, v) => a + v).as("wsum"))
    val tw = graft.functions.TokenWeightSum(spark, lt)
    val native = docs.select(col("doc_id"), tw.as("tw"))
      .select(col("doc_id"), col("tw.n_tokens").as("n_tokens"),
        col("tw.wsum").as("wsum"))
    val a = hof.orderBy("doc_id").collect().toSeq
    val b = native.orderBy("doc_id").collect().toSeq
    assert(a == b) // Row equality on double is bitwise via ==
    // and over the real fixture corpus, end to end
    val ltd = lower(col("text"))
    val fixtureHof = graft.engine.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(ltd, " "), t => t =!= "")).cast("long")
          .as("n_tokens"),
        aggregate(transform(filter(split(ltd, " "), t => t =!= ""), t =>
          (graft.functions.RollingHash(spark, t)
            % graft.functions.TokenWeightSum.FeatBuckets
            * graft.functions.TokenWeightSum.WeightMix
            % graft.functions.TokenWeightSum.WeightPrime).cast("double")
            / lit(graft.functions.TokenWeightSum.WeightPrime.toDouble)
            - lit(0.5)), lit(0.0), (acc, v) => acc + v).as("wsum"))
    val fixtureNative = graft.engine.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TokenWeightSum(spark, ltd).as("tw"))
      .select(col("doc_id"), col("tw.n_tokens").as("n_tokens"),
        col("tw.wsum").as("wsum"))
    assert(fixtureHof.orderBy("doc_id").collect().toSeq ==
      fixtureNative.orderBy("doc_id").collect().toSeq)
  }

  test("quality classifier: deterministic across partitionings") {
    val a = q("q_text_quality_classifier").collect().toSeq
    val b = Registry.byName("q_text_quality_classifier")
      .fn(spark, sf).repartition(7).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
