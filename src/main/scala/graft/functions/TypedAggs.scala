package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface — the Dataset-API UDAF
  * path (SURVEY.md §2B "UDF/UDAF surface"). The engine's production
  * aggregations are all expression-level (the queries package); this typed
  * aggregator exists for the case-class pipelines (streaming jobs,
  * multimodal rows) where compile-time field checks matter more than
  * squeezing out codegen.
  *
  * Merge is associative + commutative, so partial buffers combine in
  * any order — the property that makes it safe under Spark's two-phase
  * (partial/final) execution.
  */
object TypedAggs {

  final case class Stats(n: Long, sum: Double, min: Double, max: Double) {
    def mean: Double = if (n == 0) Double.NaN else sum / n
  }

  final case class RankedId(u: Long, id: Long)
  final case class TopKBuf(items: Seq[RankedId])
  final case class TopKIds(ids: Seq[Long])

  /** Bounded top-k-smallest (u, id) per group — the scale-safe form of
    * `row_number().over(partitionBy(group).orderBy(u, id)) <= k`: the
    * window form SORTS every group's full row stream in one task (fatal
    * when the group key has fixed cardinality — SCALE.md cliff 6),
    * while this keeps an O(k) sorted buffer through Spark's
    * partial/final hash aggregation — map-side combine reduces each
    * input split to ≤ k rows per group before anything shuffles.
    * Merge is associative + commutative (merge-sort of two ≤ k lists,
    * keep k), so partials combine in any order; ties are impossible by
    * construction when `id` is unique. finish() returns ids in rank
    * order — posexplode positions are the 0-based ranks. */
  final class TopKMinAgg(k: Int)
      extends Aggregator[RankedId, TopKBuf, TopKIds] {
    private def lt(a: RankedId, b: RankedId): Boolean =
      a.u < b.u || (a.u == b.u && a.id < b.id)
    override def zero: TopKBuf = TopKBuf(Vector.empty)
    override def reduce(b: TopKBuf, t: RankedId): TopKBuf =
      if (b.items.lengthCompare(k) >= 0 && lt(b.items.last, t)) b
      else TopKBuf((b.items :+ t).sortWith(lt).take(k))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.items ++ b.items).sortWith(lt).take(k))
    override def finish(r: TopKBuf): TopKIds = TopKIds(r.items.map(_.id))
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKIds] = Encoders.product[TopKIds]
  }

  /** Running (count, sum, min, max) over a numeric field of T. */
  final class StatsAgg[T](f: T => Double) extends Aggregator[T, Stats, Stats] {
    override def zero: Stats =
      Stats(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: Stats, t: T): Stats = {
      val v = f(t)
      Stats(b.n + 1, b.sum + v, math.min(b.min, v), math.max(b.max, v))
    }
    override def merge(a: Stats, b: Stats): Stats =
      Stats(a.n + b.n, a.sum + b.sum, math.min(a.min, b.min),
        math.max(a.max, b.max))
    override def finish(r: Stats): Stats = r
    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
