package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

/** KMV bottom-k sketch (functions.KmvSketch): exact regime, estimator
  * accuracy at n ≫ k, merge order-independence, and the set-operation
  * algebra the declared q_agg_kmv_overlap rides. */
class KmvSpec extends SparkSpec {

  private def sketchOf(n: Long, k: Int, parts: Int = 8): Seq[Long] = {
    val kmv = udaf(new KmvSketch.Agg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    spark.range(0, n).repartition(parts)
      .select(xxhash64(col("id")).as("h"))
      .agg(kmv(col("h")).as("sk"))
      .collect()(0).getSeq[Long](0)
  }

  test("exact regime: below k the sketch IS the distinct set") {
    val k = 256
    val sk = sketchOf(150, k)
    assert(sk.size == 150)
    assert(KmvSketch.estimate(sk, k) == 150.0)
    // sorted ascending (signed order on biased values)
    assert(sk == sk.sorted)
    // duplicates in the input don't inflate it
    val kmv = udaf(new KmvSketch.Agg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val dup = spark.range(0, 3000)
      .select(xxhash64(col("id") % 150).as("h"))
      .agg(kmv(col("h")).as("sk")).collect()(0).getSeq[Long](0)
    assert(dup == sk)
  }

  test("merge of two already-compacted buffers still trims to bottom-k " +
      "(r16 regression: oversized sketch broke the estimator window)") {
    // map-side combine emits compacted buffers (pending = Nil); the
    // pre-r16 compact skipped the trim for those, so this exact merge
    // shape produced a 16-value 'bottom-8' sketch whose k-th-minimum
    // order statistic — and thus the (k−1)/U(k) estimate — was wrong.
    val k = 8
    val agg = new KmvSketch.Agg(k)
    def raw(r: Range) =
      r.foldLeft(agg.zero)((b, v) => agg.reduce(b, v.toLong))
    val c1 = agg.merge(agg.zero, raw(1 to 20)) // compacts → pending Nil
    val c2 = agg.merge(agg.zero, raw(21 to 40))
    val sk = agg.finish(agg.merge(c1, c2))
    assert(sk.size == k, s"sketch must hold exactly k, got ${sk.size}")
    // and it must be the true bottom-k of the union — identical to a
    // single-pass sketch over all 40 values
    assert(sk == agg.finish(raw(1 to 40)))
  }

  test("merge of two compacted OVERLAPPING buffers with combined size <= k " +
      "stays sorted and duplicate-free (r17 regression: exact regime)") {
    // the ≤k twin of the r16 bug: two canonical runs sharing values
    // (the same element sketched in two partitions) glued together fit
    // inside k, so the pre-r17 early-out returned the concatenation —
    // duplicated, unsorted, overcounting size() in the exact regime
    // and breaking element_at(sk, -1) = maximum.
    val k = 32
    val agg = new KmvSketch.Agg(k)
    def raw(r: Range) =
      r.foldLeft(agg.zero)((b, v) => agg.reduce(b, v.toLong))
    val c1 = agg.merge(agg.zero, raw(1 to 12))  // compacted, pending Nil
    val c2 = agg.merge(agg.zero, raw(8 to 20))  // overlaps c1 on 8..12
    assert(c1.pending.isEmpty && c2.pending.isEmpty)
    val sk = agg.finish(agg.merge(c1, c2))
    assert(sk.size == 20, s"exact regime must count 20 distinct, got ${sk.size}")
    assert(sk == sk.sorted, "signed-ascending contract")
    assert(sk.distinct == sk, "cross-partition duplicate survived merge")
    assert(sk == agg.finish(raw(1 to 20)))
  }

  test("estimator regime: 200k distinct at k=1024 within the 3-sigma bound") {
    val k = 1024
    val n = 200000L
    val est = KmvSketch.estimate(sketchOf(n, k), k)
    // std err of (k-1)/U(k) is ~n/sqrt(k-2); allow 3 sigma
    val sigma = n / math.sqrt(k - 2.0)
    assert(math.abs(est - n) < 3 * sigma,
      s"estimate $est vs true $n (3-sigma band ${3 * sigma})")
  }

  test("merge is order-independent: partitioning never changes the sketch") {
    val k = 512
    val a = sketchOf(5000, k, parts = 1)
    val b = sketchOf(5000, k, parts = 7)
    val c = sketchOf(5000, k, parts = 32)
    assert(a == b && b == c)
    assert(a.size == k)
  }

  test("set algebra: union sketch composes, intersection estimator tracks truth") {
    val k = 4096
    val kmv = udaf(new KmvSketch.Agg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    // A = [0, 30k), B = [20k, 50k): |A|=|B|=30k, |A∩B|=10k, |A∪B|=50k
    def sk(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(xxhash64(col("id")).as("h"))
      .agg(kmv(col("h")).as("sk")).collect()(0).getSeq[Long](0)
    val a = sk(0, 30000)
    val b = sk(20000, 50000)
    val direct = sk(0, 50000) // sketch of the union, built from raw data
    assert(KmvSketch.unionSketch(a, b, k) == direct,
      "bottom-k of merged sketches must equal the union's own sketch")
    val uEst = KmvSketch.estimate(KmvSketch.unionSketch(a, b, k), k)
    val iEst = KmvSketch.intersectEstimate(a, b, k)
    assert(math.abs(uEst - 50000) / 50000 < 0.1, s"union est $uEst")
    assert(math.abs(iEst - 10000) / 10000 < 0.2, s"intersect est $iEst")
  }

  test("column-native estimator algebra ≡ the Scala estimators, both regimes") {
    // the declared query rides estimateCol/intersectEstimateCol; this
    // pins them to the driver-side reference implementations on an
    // EXACT-regime pair (all sizes < k) and a SATURATED pair (n ≫ k) —
    // the regime the r14 raw-size form silently corrupted.
    import spark.implicits._
    val kmvK = 512
    val kmv = udaf(new KmvSketch.Agg(kmvK),
      org.apache.spark.sql.Encoders.scalaLong)
    def sk(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(xxhash64(col("id")).as("h"))
      .agg(kmv(col("h")).as("sk")).collect()(0).getSeq[Long](0)
    for ((a, b) <- Seq(
        (sk(0, 200), sk(150, 400)),        // exact: 200/250/350 distinct
        (sk(0, 20000), sk(15000, 40000))   // saturated: n ≫ k
      )) {
      assert(KmvSketch.saturated(a, kmvK) == (a.size >= kmvK))
      val row = Seq((a, b)).toDF("a", "b")
        .select(
          KmvSketch.estimateCol(col("a"), kmvK).as("ea"),
          KmvSketch.estimateCol(
            KmvSketch.unionCol(col("a"), col("b"), kmvK), kmvK).as("eu"),
          KmvSketch.intersectEstimateCol(col("a"), col("b"), kmvK).as("ei"))
        .collect()(0)
      assert(row.getDouble(0) == KmvSketch.estimate(a, kmvK))
      assert(row.getDouble(1) ==
        KmvSketch.estimate(KmvSketch.unionSketch(a, b, kmvK), kmvK))
      assert(row.getDouble(2) == KmvSketch.intersectEstimate(a, b, kmvK))
    }
    // saturated-regime accuracy of the column path end-to-end: the
    // intersection estimate must track truth, not cap at k
    val (a, b) = (sk(0, 20000), sk(15000, 40000))
    val iEst = KmvSketch.intersectEstimate(a, b, kmvK)
    assert(math.abs(iEst - 5000) / 5000 < 0.3, s"saturated intersect $iEst")
  }

  test("q_agg_kmv_overlap is exact COUNT(DISTINCT) algebra at fixture scale") {
    val got = q("q_agg_kmv_overlap").collect()(0)
    val ev = engine.Tables.events(spark, sf)
    def users(t: String) = ev
      .where(col("event_type") === t && col("value") > 90)
      .select("user_id").distinct()
    val a = users("purchase").collect().map(_.getLong(0)).toSet
    val b = users("error").collect().map(_.getLong(0)).toSet
    assert(got.getLong(0) == a.size && got.getLong(1) == b.size)
    assert(got.getLong(2) == (a union b).size)
    assert(got.getLong(3) == (a intersect b).size)
  }
}
