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
