package graft

import graft.streaming.FeedSource
import org.apache.spark.sql.functions._

class FeedSourceSpec extends SparkSpec {

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("offset-managed feed: exactly-once across triggers, restarts, and appends") {
    val dir = tmpDir("graft-feed")
    val ckpt = tmpDir("graft-feed-ckpt")
    // two partitions, interleaved appends (immutable segments)
    assert(FeedSource.append(dir, 0,
      (0 until 5).map(i => (1000L * i, s"k$i", s"p0-$i"))) == 5L)
    assert(FeedSource.append(dir, 1,
      (0 until 3).map(i => (1000L * i, s"k$i", s"p1-$i"))) == 3L)

    // the FILE sink: checkpoint-recoverable (memory sink is not), and
    // its commit log is what upgrades at-least-once re-reads into
    // end-to-end exactly-once — the posture under test
    val out = tmpDir("graft-feed-out")
    def startQuery() = spark.readStream.format("graft-feed").load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    def sunk() = spark.read.parquet(out)
      .select("partition", "offset", "value").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq
    val firstPass = sunk()
    assert(firstPass.size == 8, s"expected 8 records, got $firstPass")
    assert(firstPass.toSet ==
      ((0 until 5).map(i => (0, i.toLong, s"p0-$i")) ++
        (0 until 3).map(i => (1, i.toLong, s"p1-$i"))).toSet)

    // RESTART from the same checkpoint after appending a new segment:
    // only the new offsets may arrive — none of the first 8 re-emit
    FeedSource.append(dir, 0, Seq((9000L, "k9", "p0-5")))
    FeedSource.append(dir, 1, Seq((9000L, "k9", "p1-3"), (9500L, "ka", "p1-4")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val secondPass = sunk()
    assert(secondPass.size == 11,
      s"restart must deliver exactly the 3 new records, got ${secondPass.size}")
    assert(secondPass.groupBy(identity).forall(_._2.size == 1),
      "duplicate delivery after restart")

    // the consumer-group commit hook recorded durably-processed
    // positions. Spark invokes the commit callback for batch N when
    // batch N+1 completes, so the external record lags ONE batch
    // behind the checkpoint (exactly how a Kafka consumer's committed
    // position trails its in-flight poll) — after run1's batch and
    // run2's batch, the hook holds run1's end.
    assert(FeedSource.committedOffsets(dir) == Map(0 -> 5L, 1 -> 3L),
      s"commit hook: ${FeedSource.committedOffsets(dir)}")
  }

  test("admission control caps per-trigger offsets like maxOffsetsPerTrigger") {
    val dir = tmpDir("graft-feed-cap")
    val ckpt = tmpDir("graft-feed-cap-ckpt")
    FeedSource.append(dir, 0,
      (0 until 20).map(i => (1000L * i, s"k$i", s"v$i")))
    val q = spark.readStream.format("graft-feed")
      .option("maxBatchRecords", "4").load(dir)
      .writeStream.format("memory").queryName("feed_cap_sink")
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    // all records arrive (multiple bounded batches), exactly once
    val got = spark.table("feed_cap_sink").select("offset").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 20L), s"got $got")
    // and no single batch exceeded the cap
    val progress = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(progress.forall(_ <= 4), s"batch sizes ${progress.toSeq}")
    assert(progress.length >= 5, s"expected >=5 capped batches, ${progress.toSeq}")
  }

  test("feed records drive the existing streaming jobs (tumbling counts)") {
    // the seam's point: a Kafka-shaped source slots under the same
    // StreamingJobs API the MemoryStream specs exercise
    val dir = tmpDir("graft-feed-jobs")
    val ckpt = tmpDir("graft-feed-jobs-ckpt")
    val base = 1700000000000L // fixed epoch ms
    FeedSource.append(dir, 0, Seq(
      (base, "click", "u1"), (base + 60000, "click", "u2"),
      (base + 3600000L, "view", "u1")))
    val events = spark.readStream.format("graft-feed").load(dir)
      .select(col("ts"), col("key").as("event_type"))
    val outDir = tmpDir("graft-feed-jobs-out")
    val counts = graft.streaming.StreamingJobs.tumblingCounts(
      events.withColumn("value", lit(0.0)))
    def run() = {
      val q = counts.writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // append-mode windowed aggs only emit when the watermark passes the
    // window; push it forward with a late-hour record and re-trigger
    // (ALSO a checkpoint-restart of a stateful job over this source)
    FeedSource.append(dir, 0, Seq((base + 3 * 3600000L, "click", "u3")))
    run()
    val rows = spark.read.parquet(outDir)
      .select("event_type", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.contains(("click", 2L)), s"got $rows")
  }
}
