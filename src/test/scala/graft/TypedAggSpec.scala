package graft

import graft.functions.TypedAggs
import graft.streaming.StreamingJobs.Event

class TypedAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopKMinAgg equals the row_number window on a hot-group fixture") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // one pathological group (0) holding 5k of 6k rows — the shape the
    // q_sample_per_group window form would serialize through one task
    val df = spark.range(0, 6000).select(
      when(col("id") < 5000, 0L).otherwise(col("id") % 7 + 1).as("grp"),
      pmod(col("id") * 48271L, lit(2147483647L)).as("u"),
      col("id"))
    val topk = udaf(new TypedAggs.TopKMinAgg(3),
      org.apache.spark.sql.Encoders.product[TypedAggs.RankedId])
    def run(partitions: Int) = df.repartition(partitions)
      .groupBy("grp").agg(topk(col("u"), col("id")).as("top"))
      .select(col("grp"), posexplode(col("top.ids")).as(Seq("pos", "id")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val w = Window.partitionBy(col("grp")).orderBy(col("u"), col("id"))
    val ref = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("grp"), (col("rn") - 1).as("pos"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = run(8)
    assert(got == ref)
    // merge is associative+commutative: partitioning must not change it
    assert(run(1) == got && run(32) == got)
  }

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
