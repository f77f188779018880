package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct sketch (Bar-Yossef et
  * al. 2002, "Counting distinct elements in a data stream"; Beyer et
  * al. 2007 for the unbiased (k−1)/U(k) estimator and set-operation
  * algebra).
  *
  * Why this exists next to `approx_count_distinct` (HLL): an HLL
  * register array answers ONLY cardinality — two HLLs cannot estimate
  * an INTERSECTION (inclusion-exclusion over HLL unions compounds
  * error catastrophically for small overlaps). A KMV sketch is a
  * uniform sample of the hash space, so sketches COMPOSE: the k
  * smallest of a union of two sketches is exactly the KMV sketch of
  * the union, and overlap counted inside that window estimates the
  * Jaccard / intersection directly. That makes audience-overlap /
  * segment-intersection queries one sketch-pass each at 100 TB
  * instead of a distinct-join.
  *
  * Exactness regime: while a set's true distinct count is ≤ k the
  * sketch retains EVERY distinct hash, so size(sketch) is the exact
  * distinct count and union/intersection via inclusion-exclusion are
  * exact too — the declared query rides that regime (its oracle is
  * plain COUNT(DISTINCT)); the estimator regime (n ≫ k) is pinned by
  * KmvSpec with the analytic error bound (~1/√(k−2) per sketch).
  *
  * Representation: values are xxhash64 outputs stored BIASED
  * (`h ^ Long.MinValue`), so SIGNED ascending order on the stored
  * longs equals unsigned order on the raw hashes — which lets
  * downstream composition use the native `array_sort`/`array_union`
  * kernels instead of driver code. finish() emits the sketch
  * signed-ascending.
  *
  * Scale posture: aggregation state is O(k) per group regardless of
  * input size (vs collect_set's O(distinct)); reduce is O(1) amortized
  * — appends batch into a pending list that is compacted every
  * [[KmvSketch.PendingCap]] inserts, and once the sketch is full every
  * value ≥ the current k-th minimum is rejected before touching the
  * buffer (acceptance decays as k/n). Merge is a compact of two
  * bounded buffers — associative and commutative, safe under Spark's
  * partial/final hash aggregation and map-side combine.
  */
object KmvSketch {

  private val PendingCap = 512

  /** Bias so signed order on stored values == unsigned order on raw
    * 64-bit hashes. */
  def bias(h: Long): Long = h ^ Long.MinValue

  final case class Buf(sorted: Seq[Long], pending: Seq[Long])

  final class Agg(k: Int) extends Aggregator[Long, Buf, Seq[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    // Invariant: a SINGLE buffer's `sorted` field is canonical
    // (ascending, distinct, length ≤ k) — it is only ever written by
    // [[fullCompact]] or `zero`, and `reduce` appends to `pending`
    // only. The early-out below is therefore safe for a lone buffer,
    // but NOT for the concatenation `merge` builds: two canonical runs
    // glued together are neither sorted nor duplicate-free even when
    // the combined length is ≤ k (the r16 q_agg_kmv_estimate gate
    // caught the >k half of this; the ≤k half silently overcounted
    // size in the exact regime and broke the signed-ascending contract
    // element_at(sk, -1) relies on). `merge` must never take the
    // early-out on two non-empty sides — see below.
    private def compact(b: Buf): Buf =
      if (b.pending.isEmpty && b.sorted.length <= k) b
      else fullCompact(b)

    private def fullCompact(b: Buf): Buf =
      Buf(((b.sorted ++ b.pending).distinct.sorted).take(k), Nil)

    override def zero: Buf = Buf(Vector.empty, Nil)

    override def reduce(b: Buf, h: Long): Buf = {
      val x = bias(h)
      // once k values are held, sorted.last upper-bounds the k-th
      // minimum (pending can only lower it) -> anything not below it
      // can never enter the bottom-k; reject without allocating
      if (b.sorted.length >= k && x >= b.sorted.last) b
      else {
        val nb = Buf(b.sorted, x +: b.pending)
        if (nb.pending.length >= PendingCap) compact(nb) else nb
      }
    }

    // Early-out ONLY when one side is empty (the other side's
    // invariant carries through); otherwise always the full
    // dedup+sort+trim — compact()'s lone-buffer early-out would let a
    // concatenation of two canonical runs escape unsorted and with
    // cross-partition duplicates whenever the combined length is ≤ k.
    override def merge(a: Buf, b: Buf): Buf =
      if (a.sorted.isEmpty && a.pending.isEmpty) compact(b)
      else if (b.sorted.isEmpty && b.pending.isEmpty) compact(a)
      else fullCompact(Buf(a.sorted ++ b.sorted, a.pending ++ b.pending))

    override def finish(r: Buf): Seq[Long] = compact(r).sorted

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Normalized position of a stored (biased) value in [0, 1). */
  private def frac(biased: Long): Double =
    (biased.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** True when the sketch holds k values — the exact/estimator
    * boundary. A saturated sketch CANNOT distinguish "exactly k
    * distinct" from "vastly more than k" (the bottom-k window looks
    * identical); that ambiguity is inherent to KMV, not a bug here.
    * Callers must branch on this explicitly — once saturated,
    * `size(sketch)` is a floor, never a count, and every derived
    * set-algebra quantity must come from [[estimate]] /
    * [[intersectEstimate]] (noisy-but-unbiased even at n == k) rather
    * than raw sizes. The r14 declared query trusted raw sizes and was
    * therefore silently wrong at sf ≥ 5 where segments exceed k; the
    * r15 form routes every output through the estimator algebra, which
    * degenerates to exact arithmetic below saturation. */
  def saturated(sketch: Seq[Long], k: Int): Boolean = sketch.size >= k

  /** Unbiased distinct estimate: exact size below k, (k−1)/U(k) at and
    * beyond (Beyer et al. 2007). At exactly n == k distinct the true
    * answer is in hand but indistinguishable from the n ≫ k case (see
    * [[saturated]]), so the estimator is returned — the correct choice
    * when the caller can't know which side of the boundary it is on. */
  def estimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.size < k) sketch.size.toDouble
    else (k - 1).toDouble / frac(sketch.last)

  /** Column-native twin of [[estimate]] — IDENTICAL algebra expressed
    * on a sketch column, so declared queries estimate without leaving
    * codegen (KmvSpec pins the two forms equal on both regimes). */
  def estimateCol(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((element_at(sk, -1).cast("double") - lit(Long.MinValue.toDouble))
          / lit(math.pow(2.0, 64))))

  /** Column-native union sketch: bottom-k of the merged sketches
    * (valid because stored values are biased — signed `array_sort`
    * order equals unsigned hash order). */
  def unionCol(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Column-native twin of [[intersectEstimate]]: overlap counted
    * inside the union's bottom-k window, scaled by the union estimate.
    * The `size(u) < k` branch keeps the exact regime BIT-exact (no
    * (x/n)·n float round-trip where the integer answer is in hand). */
  def intersectEstimateCol(a: Column, b: Column, k: Int): Column = {
    val u = unionCol(a, b, k)
    val ovl = size(array_intersect(u, array_intersect(a, b)))
    when(size(u) === 0, lit(0.0))
      .when(size(u) < k, ovl.cast("double"))
      .otherwise(ovl.cast("double") / size(u) * estimateCol(u, k))
  }

  /** KMV sketch of the UNION of two sets = bottom-k of the merged
    * sketches (both must be bottom-k of the same hash function). */
  def unionSketch(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** Intersection estimate via the overlap INSIDE the union's bottom-k
    * window (the Beyer et al. set-operation estimator — NOT
    * inclusion-exclusion, which compounds three estimates' errors):
    * the fraction of the union window present in both sketches times
    * the union estimate. Exact when both inputs are in the exact
    * regime and the union fits in k (explicit branch — same bit-exact
    * discipline as [[intersectEstimateCol]]). */
  def intersectEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val u = unionSketch(a, b, k)
    if (u.isEmpty) 0.0
    else {
      val sa = a.toSet
      val sb = b.toSet
      val overlap = u.count(v => sa.contains(v) && sb.contains(v))
      if (u.size < k) overlap.toDouble
      else overlap.toDouble / u.size * estimate(u, k)
    }
  }
}
