package graft

import graft.functions.TypedAggs
import graft.streaming.StreamingJobs.Event

class TypedAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed StatsAgg over a Dataset[Event] matches untyped aggregation") {
    import org.apache.spark.sql.functions._
    val events = engine.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    val typed = events.groupByKey(_.user_id)
      .agg(new TypedAggs.StatsAgg[Event](_.value).toColumn.name("stats"))
      .collect().map { case (u, s) => u -> s }.toMap
    val untyped = engine.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("value").as("mn"), max("value").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (u, s) =>
      val (n, mn, mx) = untyped(u)
      assert(s.n == n && s.min == mn && s.max == mx)
      assert(s.mean >= mn && s.mean <= mx)
    }
  }
}
