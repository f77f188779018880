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
    // schema from the batch reader, ts normalized the same way as
    // Tables.events — the parity claim must survive fixture re-encoding
    val fileSchema = spark.read.parquet(dir.toString).schema
    val stream = engine.Tables.normalizeEventsTs(
      spark.readStream.schema(fileSchema).parquet(dir.toString))
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

  test("graft-feed replay of the events fixture drives the tumbling twin to batch parity") {
    // r11 verdict task #7: the offset-managed feed seam must carry the
    // REAL fixture, not toy rows. Replay every event into a
    // 4-partition feed log and run the same tumbling aggregation the
    // file-source parity case runs — the result must equal the batch
    // query exactly. ts rides the log as epoch MILLIS: flooring the
    // fixture's micros to ms can never move an event across an HOUR
    // window boundary (boundaries are whole ms; floor is downward), so
    // window assignment — and therefore every group, count, and
    // decimal sum — is identical.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_feedreplay_").toString
    val ev = engine.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .collect()
    assert(ev.length >= 1000, "fixture must be the real events table")
    ev.groupBy(r => (r.getLong(0) % 4).toInt).toSeq.sortBy(_._1)
      .foreach { case (p, rows) =>
        graft.streaming.FeedSource.append(dir, p,
          rows.sortBy(_.getLong(0)).map { r =>
            (r.getTimestamp(1).getTime, r.getString(2),
              r.getDouble(3).toString)
          }.toSeq)
      }
    val streamAgg = spark.readStream.format("graft-feed").load(dir)
      .select(col("ts"), col("key").as("event_type"),
        col("value").cast("double").as("value"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        queries.Det.dsum(col("value"), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
    val q = streamAgg.writeStream.outputMode("complete")
      .format("memory").queryName("feed_parity_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("feed_parity_out")
    val batch = Registry.byName("q_stream_tumbling").fn(spark, sf)
    assert(batch.exceptAll(streamed).isEmpty
      && streamed.exceptAll(batch).isEmpty,
      "feed-replayed streaming result must equal the batch result exactly")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("streaming parquet file sink with checkpoint lands exactly the input rows") {
    val in = java.nio.file.Files.createTempDirectory("graft_sink_in_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      in.resolve("part-0.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft_sink_out_")
    val inSchema = spark.read.parquet(in.toString).schema
    val q = engine.Tables.normalizeEventsTs(
      spark.readStream.schema(inSchema).parquet(in.toString))
      .writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val landed = spark.read.parquet(s"$out/data")
    val source = engine.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(landed.count() == source.count())
    assert(source.exceptAll(landed.select(source.columns.map(col): _*)).isEmpty)
    // restart with same checkpoint: no new data -> no duplicates
    val q2 = engine.Tables.normalizeEventsTs(
      spark.readStream.schema(inSchema).parquet(in.toString))
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$out/data").count() == source.count(),
      "checkpointed restart must be exactly-once, not duplicate")
  }
}
