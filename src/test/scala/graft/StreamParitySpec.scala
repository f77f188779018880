package graft

import org.apache.spark.sql.functions._

/** Batch/stream parity over the REAL fixture files: the same tumbling
  * aggregation expression run as a Structured Streaming file-source
  * query must produce exactly the batch q_stream_tumbling result.
  */
class StreamParitySpec extends SparkSpec {
  test("streaming file-source tumbling agg equals the batch query") {
    // file source wants a directory: stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        queries.Det.dsum(col("value"), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("parity_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("parity_out")
    val batch = Registry.byName("q_stream_tumbling").fn(spark, sf)
    assert(batch.exceptAll(streamed).isEmpty
      && streamed.exceptAll(batch).isEmpty,
      "streaming result must equal batch result exactly")
  }
}
