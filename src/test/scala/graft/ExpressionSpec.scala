package graft

import graft.engine.{Skew, Tables}
import graft.functions.{CosineSimilarity, Vectors}
import org.apache.spark.sql.functions._

class ExpressionSpec extends SparkSpec {
  import graft.functions.Bpe

  test("BPE trainer learns most-frequent merges with deterministic ties") {
    // "aaab"x10 + "ab"x5: round 1 counts (a,a)=20 (overlapping pairs
    // both count), (a,b)=15 -> merge (a,a); after applying, (a,b)
    // appears in [aa,a,b]x10 and [a,b]x5 = 15 vs (aa,a)=10 -> merge
    // (a,b). The classic Sennrich'16 procedure, pinned.
    val merges = Bpe.train(Map("aaab" -> 10L, "ab" -> 5L), 2)
    assert(merges == Seq(("a", "a"), ("a", "b")), merges.toString)
    // determinism under reversed map insertion order
    assert(Bpe.train(Map("ab" -> 5L, "aaab" -> 10L), 2) == merges)
  }

  test("BPE greedy encoder applies lowest-rank merges, all occurrences") {
    val r1 = Map(("a", "a") -> 0)
    assert(Bpe.encode("aaab", r1) == Seq("aa", "a", "b"))
    val r2 = Map(("a", "a") -> 0, ("aa", "aa") -> 1)
    assert(Bpe.encode("aaaa", r2) == Seq("aaaa"))
    assert(Bpe.encode("a", r2) == Seq("a"))
    assert(Bpe.encode("xyz", r2) == Seq("x", "y", "z"))
    // rank order decides: (b,c) outranks (a,b) -> "abc" = [a, bc]
    val r3 = Map(("a", "b") -> 1, ("b", "c") -> 0)
    assert(Bpe.encode("abc", r3) == Seq("a", "bc"))
  }

  test("bpe_token_count kernel equals the driver encoder; committed vocab loads") {
    // TrainBpe asked for 512 merges but the fixture's ~31-word
    // vocabulary EXHAUSTS at 89 (every word reaches one symbol and no
    // adjacent pair remains) — the committed table is the saturation
    // point, not a truncation
    assert(Bpe.defaultRanks.size >= 50,
      s"committed merge table suspiciously small: ${Bpe.defaultRanks.size}")
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        graft.functions.BpeTokenCount(spark, col("text")).as("n"))
      .limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = Bpe.preTokens(r.getString(1))
        .map(w => Bpe.encode(w, Bpe.defaultRanks).length.toLong).sum
      assert(r.getLong(2) == expected,
        s"doc ${r.getLong(0)}: kernel ${r.getLong(2)} != driver $expected")
    }
  }

  test("q_text_bpe_tokens invariants: pieces <= bpe_real <= non-space chars") {
    // merging only ever shrinks a word's symbol count from chars
    // toward one, so per doc: piece count <= BPE count <= chars
    val bad = q("q_text_bpe_tokens")
      .join(Tables.documents(spark, sf)
        .select(col("doc_id"),
          length(regexp_replace(col("text"), " ", "")).cast("long")
            .as("nsc")), "doc_id")
      .where(col("bpe_real_tokens") < col("pieces")
        || col("bpe_real_tokens") > col("nsc"))
    assert(bad.isEmpty, bad.take(3).mkString(","))
    val agg = q("q_text_bpe_tokens")
      .agg(sum("pieces"), sum("bpe_real_tokens")).head()
    assert(agg.getLong(1) < agg.getLong(0) * 8,
      "BPE output implausibly large")
    assert(agg.getLong(1) >= agg.getLong(0),
      "BPE can never produce fewer tokens than pre-tokenizer pieces")
    // and the committed merge table actually MERGES on this corpus:
    // strictly fewer tokens than non-space characters overall (a
    // merge-nothing table would sit at exactly sum(chars) and fail —
    // r9 advice: the *8 bound above is anti-blowup, not compression)
    val nscTotal = Tables.documents(spark, sf)
      .agg(sum(length(regexp_replace(col("text"), " ", "")).cast("long")))
      .head().getLong(0)
    assert(agg.getLong(1) < nscTotal,
      s"BPE ${agg.getLong(1)} tokens !< $nscTotal non-space chars — " +
        "the merge table merged nothing")
  }

  test("minhash_portable kernel equals an independent driver-side reference") {
    import graft.functions.GramSketch
    // Independent re-derivation from the family's DEFINITION (plain
    // String/BigInt ops, no shared code with the kernel's hot loop):
    // catches a kernel refactor that silently changes the hash unit —
    // the oracle would then also fail, but this pins it at unit scope.
    def ref(text: String, k: Int, perms: Int): Seq[Long] = {
      val toks = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      val grams = toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSeq
      if (toks.length < k) Seq.fill(perms + 1)(Long.MaxValue).updated(0, 0L)
      else {
        val P = GramSketch.PortableP
        val gh = grams.map(g =>
          g.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % P))
        (gh.distinct.size.toLong +:
          (0 until perms).map(s => gh.map(g =>
            (g * GramSketch.portableA(s) + GramSketch.portableB(s)) % P).min))
      }
    }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the the the the",                 // repeated grams → distinct < raw
      "  double  spaces   everywhere ",  // empty-token stripping
      "UPPER Case MiXeD tokens here",    // lowercase parity
      "only two",                        // < k tokens → sentinel
      "")                                // empty → sentinel
    import org.apache.spark.unsafe.types.UTF8String
    samples.foreach { t =>
      val kernel = GramSketch.minhashPortable(UTF8String.fromString(t), 3, 4)
      assert(kernel.toSeq == ref(t, 3, 4), s"text='$t'")
    }
    // and the Expression surface (codegen path) agrees with direct eval
    import spark.implicits._
    val viaExpr = samples.toDF("text")
      .select(col("text"),
        graft.functions.MinHashPortable(spark, col("text"), 3, 4).as("sig"))
      .collect()
    viaExpr.foreach { r =>
      assert(r.getSeq[Long](1) == ref(r.getString(0), 3, 4),
        s"codegen mismatch for '${r.getString(0)}'")
    }
  }

  test("fused cosine_sim is bit-identical to the composed form") {
    val e = Tables.embeddings(spark, sf).limit(100)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    val both = a.crossJoin(b)
      .select(
        CosineSimilarity(spark, col("av"), col("bv")).as("fused"),
        Vectors.cosine(col("av"), col("bv")).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"fused=${r.getDouble(0)} composed=${r.getDouble(1)}"))
  }

  test("cosine_sim yields NULL on ragged pairs and null elements, like the composed form") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)),   // ragged
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)))          // aligned
      .toDF("a", "b")
    val rows = df.select(
      CosineSimilarity(spark, col("a"), col("b")).as("fused"),
      Vectors.cosine(col("a"), col("b")).as("composed")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(0) && rows(1).getDouble(0) == rows(1).getDouble(1))
    val withNull = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c""".stripMargin)
    assert(withNull.head.isNullAt(0))
  }

  test("nearest_cell_2l: full-probe equals the flat scan; partial probe stays in probed groups") {
    import graft.functions.{NearestCells, NearestCellTwoLevel}
    val e = Tables.embeddings(spark, sf).limit(200)
    val cents = queries.AnnOps.trainCentroids(
      e.select(col("vec_id"), col("embedding")), k = 16)
    val (coarse, groups) = queries.AnnOps.coarsen(cents)
    // probing EVERY coarse cell makes two-level exhaustive → must
    // equal the flat scan's nearest centroid exactly
    val rows = e.select(
        element_at(NearestCells(spark, col("embedding"), cents, 1), 1)
          .as("flat"),
        NearestCellTwoLevel(spark, col("embedding"), coarse, cents,
          groups, coarse.length).as("two"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"flat=${r.getInt(0)} two-level=${r.getInt(1)}"))
    // partial probe: the returned fine cell must belong to one of the
    // nprobe nearest coarse cells (the declared approximation), and be
    // deterministic across evaluations
    val partial = e.select(col("vec_id"),
        NearestCellTwoLevel(spark, col("embedding"), coarse, cents,
          groups, 2).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val again = e.select(col("vec_id"),
        NearestCellTwoLevel(spark, col("embedding"), coarse, cents,
          groups, 2).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(partial.toSeq == again.toSeq)
    partial.foreach { case (_, cell) =>
      assert(cell >= 0 && cell < cents.length)
    }
    // dimension mismatch → NULL, like the flat kernel
    val ragged = e.select(NearestCellTwoLevel(spark,
      slice(col("embedding"), 1, 5), coarse, cents, groups, 2)).head()
    assert(ragged.isNullAt(0))
  }

  test("hyperplane_sig is bit-identical to the composed per-plane dot form") {
    import graft.functions.HyperplaneSig
    val planes = graft.queries.DedupOps.LshPlanes
    def composedBits(v: org.apache.spark.sql.Column) =
      planes.zipWithIndex.map { case (p, i) =>
        when(Vectors.dot(v, typedlit(p)) > 0, lit(1 << i)).otherwise(0)
      }.reduce(_ + _)
    val rows = Tables.embeddings(spark, sf).limit(200)
      .select(
        HyperplaneSig(spark, col("embedding"), planes).as("fused"),
        composedBits(col("embedding")).as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"fused=${r.getInt(0)} composed=${r.getInt(1)}"))
  }

  test("hyperplane_sig yields NULL on dimension mismatch and null elements") {
    import spark.implicits._
    import graft.functions.HyperplaneSig
    val planes = Seq(Seq(1.0, -1.0), Seq(0.5, 0.5))
    val df = Seq(
      Seq(1.0f, 2.0f),           // ok: dot1=-1<=0, dot2=1.5>0 → bit1 only
      Seq(1.0f))                 // ragged
      .toDF("v")
    val rows = df.select(HyperplaneSig(spark, col("v"), planes).as("s"))
      .collect()
    assert(rows(0).getInt(0) == 2)
    assert(rows(1).isNullAt(0))
    val withNull = Seq(Tuple1(Seq(Some(1.0f), None)))
      .toDF("v")
      .select(HyperplaneSig(spark, col("v").cast("array<float>"), planes))
      .collect()
    assert(withNull(0).isNullAt(0))
  }

  test("rolling_hash matches the composed HOF fold, including edge cases") {
    import spark.implicits._
    import graft.functions.RollingHash
    val composed = expr("""aggregate(
      transform(sequence(1, length(t)),
        i -> CAST(ascii(substr(t, i, 1)) AS LONG)),
      0L, (h, c) -> (h * 31 + c) % 1000000007)""")
    val docs = Tables.documents(spark, sf).limit(200)
      .select(col("text").as("t"))
      .unionByName(Seq("", "a", "abc", "naïve café — ✓",
        "😀 astral", "x" * 5000).toDF("t"))
    val rows = docs.select(
      RollingHash(spark, col("t")).as("fused"), composed.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fused=${r.getLong(0)} hof=${r.getLong(1)}"))
    // null text → null, like the HOF form
    val nulls = Seq(Option.empty[String]).toDF("t").select(
      RollingHash(spark, col("t")).as("fused"), composed.as("hof")).head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("cosine_sim is callable from SQL via GraftExtensions-style registration") {
    CosineSimilarity.register(spark)
    val v = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
      .head.getDouble(0)
    assert(v == 0.0)
    val same = spark.sql(
      """SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c""".stripMargin)
      .head.getDouble(0)
    assert(math.abs(same - 1.0) < 1e-12)
  }
}

class SortedIntersectSpec extends SparkSpec {
  import graft.functions.SortedIntersectCount
  import spark.implicits._

  test("merge count equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L, 8L), Seq(4L, 8L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 7L, 8L)))
      .toDF("a", "b")
    val rows = df.select(
      SortedIntersectCount(spark, col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 0L, 2L, 2L))
  }

  test("callable from SQL after registration") {
    SortedIntersectCount.register(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS n")
      .head.getLong(0)
    assert(n == 2L)
  }
}

class SkewSpec extends SparkSpec {
  test("salted count equals direct count") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(li, Seq("l_returnflag"), numSalts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted sum equals direct decimal sum") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(28,2)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(li, Seq("l_returnflag"), col("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }

  test("chunked running agg equals the plain window on a hot-key fixture") {
    import org.apache.spark.sql.expressions.Window
    // one pathological key (0) with 5k rows, plus 20 normal keys
    val df = spark.range(0, 6000).select(
      col("id"),
      when(col("id") < 5000, 0L).otherwise(col("id") % 20 + 1).as("k"),
      (col("id") * 7 % 1000).as("t"))
    val chunked = graft.engine.Skew.chunkedRunning(
      df, "k", expr("t DIV 100"), Seq("t", "id"), col("id"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = df
      .withColumn("running_sum", sum(col("id")).over(w))
      .withColumn("running_n", count(lit(1)).over(w))
    assert(chunked.select("id", "k", "t", "running_sum", "running_n")
      .exceptAll(plain.select("id", "k", "t", "running_sum", "running_n"))
      .isEmpty)
    assert(chunked.count() == plain.count())
  }

  test("de-cliffed q_text_pack / q_text_quality_filter match plain windows") {
    import org.apache.spark.sql.expressions.Window
    // r10: both queries route their fixed-cardinality-key window through
    // chunkedRunning / two-pass rank arithmetic; these pins re-derive the
    // PLAIN window form inline so a refactor that breaks equivalence
    // fails here, not only at the driver's sf0.01 oracle.
    val docs = Tables.documents(spark, sf)
    val nTokens = ceil(col("n_chars").cast("double") / 4.0).cast("long")
    val wp = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val packPlain = docs
      .select(col("doc_id"), col("source"), nTokens.as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(wp), lit(0L)))
      .select("doc_id", "source", "n_tokens", "start_offset")
    assert(q("q_text_pack")
      .select("doc_id", "source", "n_tokens", "start_offset")
      .exceptAll(packPlain).isEmpty)
    assert(q("q_text_pack").count() == packPlain.count())

    val nTok = size(filter(split(lower(col("text")), " "), t => t =!= ""))
      .cast("long")
    val alphaRatio =
      length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
        col("n_chars")
    val wq = Window.partitionBy(col("lang"))
      .orderBy(col("alpha_ratio"), col("doc_id"))
    val qfPlain = docs
      .select(col("doc_id"), col("lang"), nTok.as("n_tokens"),
        alphaRatio.as("alpha_ratio"))
      .withColumn("lang_pctile", percent_rank().over(wq))
      .where(col("lang_pctile") >= 0.2 && col("n_tokens") > 0)
      .select("doc_id", "lang", "n_tokens", "alpha_ratio", "lang_pctile")
    assert(q("q_text_quality_filter")
      .select("doc_id", "lang", "n_tokens", "alpha_ratio", "lang_pctile")
      .exceptAll(qfPlain).isEmpty)
    assert(q("q_text_quality_filter").count() == qfPlain.count())
  }

  test("NaN-safe ratio chunk keeps chunkedRunning ≡ plain window on empty docs") {
    import org.apache.spark.sql.expressions.Window
    // r11 (ADVICE): alpha_ratio is NaN for an empty doc (0.0/0);
    // floor(NaN*64) is NULL and chunkedRunning's inner join on __chunk
    // silently dropped the row. The fixture never emits empty docs, so
    // this pin feeds explicit NaN rows through the SAME chunk helper
    // the query uses and asserts full row retention + plain-window
    // equality (NaN sorts last, ties broken by id — both engines).
    val df = spark.range(0, 200).select(
      col("id"),
      (col("id") % 3).cast("string").as("lang"),
      when(col("id") % 50 === 0, lit(Double.NaN))
        .otherwise((col("id") % 97).cast("double") / 97.0).as("ratio"))
    val chunked = graft.engine.Skew.chunkedRunning(
      df, "lang", graft.queries.PipelineOps.ratioChunk64(col("ratio")),
      Seq("ratio", "id"), lit(1L))
    val w = Window.partitionBy(col("lang")).orderBy(col("ratio"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = df.withColumn("running_n", count(lit(1)).over(w))
    assert(chunked.count() == 200) // no silent NaN-row drop
    assert(chunked.select("id", "lang", "ratio", "running_n")
      .exceptAll(plain.select("id", "lang", "ratio", "running_n"))
      .isEmpty)
  }

  test("q_text_pack rejects a non-positive chunkDocs conf loudly") {
    // r11 (ADVICE): chunkDocs=0 made `doc_id div 0` null everywhere and
    // the query silently returned EMPTY instead of failing.
    spark.conf.set("spark.graft.pack.chunkDocs", "0")
    try {
      val e = intercept[IllegalArgumentException] { q("q_text_pack") }
      assert(e.getMessage.contains("chunkDocs"))
    } finally spark.conf.unset("spark.graft.pack.chunkDocs")
  }

  test("salted join equals direct join") {
    val li = Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val o = Tables.orders(spark, sf)
    val direct = li.join(o, Seq("o_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, Seq("o_orderkey"), numSalts = 4).count()
    assert(salted == direct)
  }
}

class BucketingSpec extends SparkSpec {
  test("unicode normalize kernels: composition, stripping, pass-throughs") {
    import graft.functions.{NfcNormalize, StripAccents}
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = "Café"   // e + combining acute
    val composed = "Café"
    assert(NfcNormalize.kernel(UTF8String.fromString(decomposed)).toString
      == composed)
    assert(StripAccents.kernel(UTF8String.fromString(composed)).toString
      == "Cafe")
    assert(StripAccents.kernel(UTF8String.fromString(decomposed)).toString
      == "Cafe")
    // no canonical decomposition → unchanged (the utf8proc contract)
    assert(StripAccents.kernel(UTF8String.fromString("Straße")).toString
      == "Straße")
    // ASCII fast path returns the SAME object — zero allocation
    val ascii = UTF8String.fromString("plain ascii")
    assert(NfcNormalize.kernel(ascii) eq ascii)
    assert(StripAccents.kernel(ascii) eq ascii)
    // Non-ASCII NFD input with no BMP Mn marks must NOT short-circuit:
    // decomposed Hangul jamo (U+1100 U+1161 = 가) is NFD-normalized yet
    // the contract says re-compose to NFC — the divergence the old
    // "isNormalized(NFD) && no Mn" fast path had.
    assert(StripAccents.kernel(UTF8String.fromString("가")).toString
      == "가")
    // Astral-plane combining mark (U+1D165 MUSICAL SYMBOL COMBINING
    // STEM is Mc; use U+1D167 COMBINING TREMOLO, type Mn): its chars
    // report type SURROGATE per-char, but the mark must still strip.
    val astral = new String(Character.toChars(0x41)) +
      new String(Character.toChars(0x1D167))
    assert(StripAccents.kernel(UTF8String.fromString(astral)).toString == "A")
    // SQL registration path
    graft.functions.NfcNormalize.register(spark)
    graft.functions.StripAccents.register(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') a, strip_accents('$decomposed') b")
      .head()
    assert(r.getString(0) == composed && r.getString(1) == "Cafe")
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    // warehouse dir is a static conf — uses the session default
    // (./spark-warehouse, gitignored); tables drop in finally.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    // bucketed joins need broadcast ruled out to show the SMJ path
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      // ShuffleExchangeExec renders as "Exchange hashpartitioning(...)";
      // broadcast is disabled above, so ANY Exchange means a shuffle.
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
