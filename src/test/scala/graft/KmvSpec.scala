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
