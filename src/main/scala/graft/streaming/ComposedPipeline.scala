package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The production streaming story COMPOSED, one job (r15 — VERDICT r14
  * missing #3): until now the three pieces were each verified alone
  * (feed-source replay r13, transformWithState+RocksDB sessionization
  * r14, CDC apply spec-only). What a user deploys is their
  * composition:
  *
  *   graft-feed source (offset-managed, admission-controlled)
  *     → [[StreamingJobs.sessionizeTws]] on RocksDB keyed state
  *       → foreachBatch CDC apply into IMMUTABLE SNAPSHOT GENERATIONS
  *
  * with a crash anywhere in the chain and a restart from the
  * checkpoint. The composition is where the exactly-once story can
  * actually break: Spark's foreachBatch sink is AT-LEAST-ONCE (the
  * batch re-executes after a crash between the sink call and the
  * commit-log write), so the generation apply must be idempotent on
  * `batchId` or a crash double-applies a changelog.
  *
  * The discipline that makes it exactly-once END TO END:
  *   - the feed source replays a re-run batch from the SAME offset
  *     range (offsets land in the checkpoint WAL before the sink
  *     runs), so a retried batchId carries identical rows;
  *   - state rolls back to the last committed version on restart, so
  *     sessionizeTws re-emits the same closed sessions for that batch;
  *   - each non-empty batch publishes `gen_<batchId>` via
  *     [[graft.engine.Snapshot.publishAtomic]] — create-if-absent
  *     rename, so the RETRY of a batch whose generation already
  *     landed SKIPS (loses the publish race to its own first attempt)
  *     instead of double-applying. The generation dir is the
  *     processed-marker, data and marker in one atomic rename — the
  *     same derived-watermark discipline as
  *     [[graft.engine.JdbcExtract.watermark]].
  *
  * Each generation is the FULL merged snapshot (base = previous
  * generation, changelog = this batch's closed sessions via
  * [[graft.engine.Snapshot.applyChangelog]]), so any generation is a
  * consistent point-in-time table and retention/time-travel apply
  * unchanged. ComposedPipelineSpec pins crash-run ≡ clean-run
  * bit-parity with the skip path actually taken; StreamScale's
  * `composed` mode replays sf5 (50×) through a mid-run crash/restart
  * and reports state flatness + drained lag (SCALE.md).
  */
object ComposedPipeline {

  /** Thrown by the injected fault: a crash AFTER the batch's
    * generation published but BEFORE Spark wrote the batch's commit
    * log — the exact window where at-least-once re-execution happens. */
  final class InjectedCrash(batchId: Long)
    extends RuntimeException(s"injected crash after batch $batchId")

  final case class RunStats(
      batches: Int, peakStateRows: Long, peakStateBytes: Long,
      emittedSessions: Long, generations: Int, skippedReapplies: Int,
      processedLag: Long, wallSec: Double, crashed: Boolean)

  private val GenRe = "^gen_(\\d+)$".r

  /** Published generation ids under `root` (exact match — publish
    * staging dirs share the prefix and must never read as processed
    * markers). Listed through the Hadoop FS so the discipline carries
    * to object-store roots unchanged. */
  def generationIds(s: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case GenRe(id) => id.toLong
    }.sorted
  }

  /** Latest published snapshot under `root`, if any. */
  def latestSnapshot(s: SparkSession, root: String): Option[DataFrame] =
    generationIds(s, root).lastOption.map(id =>
      s.read.parquet(s"$root/gen_$id"))

  /** Published generation ids under a POINTER-MODE root (r18 — the
    * rename-free commit, [[graft.engine.Snapshot.publishPointer]]):
    * the processed-markers are the pointer FILES under
    * `root/_pointers`, not generation dirs — visibility is pointer
    * existence, so a crashed publisher's staged object is never read
    * as a processed batch. */
  def pointerGenerationIds(s: SparkSession, root: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(
      s"$root/${graft.engine.Snapshot.PointersDir}")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isFile)
      .map(_.getPath.getName).collect { case GenRe(id) => id.toLong }
      .sorted
  }

  /** Latest pointer-committed snapshot under `root`, if any. */
  def latestSnapshotPointer(
      s: SparkSession, root: String): Option[DataFrame] =
    pointerGenerationIds(s, root).lastOption.map(id =>
      graft.engine.Snapshot.readPointer(s, root, s"gen_$id"))

  /** [[applyGeneration]]'s RENAME-FREE twin (r18): identical merge +
    * idempotency discipline, committed by create-if-absent of a
    * pointer file instead of a rename — the commit that stays atomic
    * on S3-class stores where rename is a non-atomic copy (the
    * reference's actual sink). A re-executed batch skips on the
    * pointer's existence; a racing retry loses the pointer create and
    * self-cleans its staged object. The streaming CDC pipeline runs
    * end-to-end on a store with NO atomic rename anywhere in its
    * commit path (ComposedPipelineSpec proves it on the objstore
    * copy-rename double). */
  def applyGenerationPointer(
      s: SparkSession, root: String, sessions: DataFrame,
      batchId: Long): Boolean = {
    if (sessions.isEmpty) return false
    if (pointerGenerationIds(s, root).contains(batchId))
      return false // retry of a done batch
    val changes = sessions.withColumn("op", lit("U"))
    val merged = latestSnapshotPointer(s, root) match {
      case Some(prev) => graft.engine.Snapshot.applyChangelog(
        prev, changes, Seq("user_id", "session_seq"), "op")
      case None => changes.drop("op")
    }
    try {
      graft.engine.Snapshot.publishPointer(
        s, merged, root, s"gen_$batchId", publisherStamp)
      true
    } catch {
      // racing retry of the same batch: first attempt's pointer won
      case _: graft.engine.Snapshot.SnapshotExistsException => false
    }
  }

  /** Name of the publisher-identity stamp each generation carries (an
    * `extras` file riding [[graft.engine.Snapshot.publishAtomic]]'s
    * atomic commit, so it is visible iff the generation is). In a
    * split-brain window two live drivers race the same batchId; the
    * stamp records WHICH process's publish won — the evidence the
    * zombie-fencing proof reads back (FaultInject `zombie`). */
  val PublisherFile = "_publisher.json"

  /** The pid recorded in a generation's publisher stamp, if present
    * (generations published before the stamp existed have none). */
  def publisherPid(s: SparkSession, root: String, batchId: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/gen_$batchId/$PublisherFile")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    "\"pid\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toLong)
  }

  private def publisherStamp: Map[String, String] =
    Map(PublisherFile ->
      s"""{"pid":${ProcessHandle.current().pid()}}""")

  /** Idempotent per-batch CDC apply: merge this batch's closed
    * sessions into the previous generation and publish `gen_<batchId>`
    * atomically; a re-executed batch (its generation already visible)
    * is a no-op. Returns true when this call published. */
  def applyGeneration(
      s: SparkSession, root: String, sessions: DataFrame,
      batchId: Long): Boolean = {
    if (sessions.isEmpty) return false
    val dest = s"$root/gen_$batchId"
    if (generationIds(s, root).contains(batchId))
      return false // retry of a done batch
    val changes = sessions.withColumn("op", lit("U"))
    val merged = latestSnapshot(s, root) match {
      case Some(prev) => graft.engine.Snapshot.applyChangelog(
        prev, changes, Seq("user_id", "session_seq"), "op")
      case None => changes.drop("op")
    }
    try {
      graft.engine.Snapshot.publishAtomic(s, merged, dest, publisherStamp)
      true
    } catch {
      // racing retry of the same batch: first attempt's rename won
      case _: graft.engine.Snapshot.SnapshotExistsException => false
    }
  }

  /** [[applyGeneration]]'s SERVING-SHAPE twin (r17 — VERDICT r16 next
    * #7): identical merge + idempotency discipline, but the generation
    * publishes BUCKETED by `user_id` via
    * [[graft.engine.Bucketed.publishGeneration]], so the
    * streaming-maintained table is directly servable: a consumer that
    * attaches the latest generation ([[servedSnapshot]]) joins on
    * `user_id` with zero exchange and zero sort. This closes the loop
    * between the CDC pipeline (which used to land plain-parquet
    * generations only) and the publish-once join layouts — the
    * production shape where a stream MAINTAINS the table other queries
    * serve from. */
  def applyGenerationBucketed(
      s: SparkSession, root: String, sessions: DataFrame,
      batchId: Long, buckets: Int): Boolean = {
    if (sessions.isEmpty) return false
    val dest = s"$root/gen_$batchId"
    if (generationIds(s, root).contains(batchId))
      return false // retry of a done batch
    val changes = sessions.withColumn("op", lit("U"))
    val merged = latestSnapshot(s, root) match {
      case Some(prev) => graft.engine.Snapshot.applyChangelog(
        prev, changes, Seq("user_id", "session_seq"), "op")
      case None => changes.drop("op")
    }
    try {
      graft.engine.Bucketed.publishGeneration(
        s, merged, dest, "user_id", buckets)
      true
    } catch {
      // racing retry of the same batch: first attempt's rename won
      case _: graft.engine.Snapshot.SnapshotExistsException => false
    }
  }

  /** The latest generation attached as a bucketed serving table —
    * valid only for roots maintained by [[applyGenerationBucketed]]
    * with the same bucket count. */
  def servedSnapshot(
      s: SparkSession, root: String, buckets: Int): Option[DataFrame] =
    generationIds(s, root).lastOption.map { id =>
      val dest = s"$root/gen_$id"
      graft.engine.Bucketed.attachGeneration(
        s, dest, s.read.parquet(dest).schema, "user_id", buckets)
    }

  /** Replay a batch events table into a feed log PARTITIONED BY USER
    * (the key is the user id, so per-user arrival order is the
    * per-partition offset order sessionization assumes), events
    * encoded on the feed value ("event_id,event_type,value" — the
    * segment-line split keeps the tail intact). Driver-light: one
    * ts-ordered toLocalIterator pass, segment-buffered appends. */
  def replayToFeed(
      ev: DataFrame, feedDir: String, parts: Int,
      segSize: Int = 250000): Long = {
    val bufs = Array.fill(parts)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)])
    var replayed = 0L
    val it = ev
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("ts"), col("event_id"))
      .toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val user = r.getLong(2)
      val p = (user % parts).toInt
      bufs(p) += ((r.getTimestamp(1).getTime, user.toString,
        s"${r.getLong(0)},${r.getString(3)},${r.getDouble(4)}"))
      if (bufs(p).size >= segSize) {
        FeedSource.append(feedDir, p, bufs(p).toSeq)
        replayed += bufs(p).size
        bufs(p).clear()
      }
    }
    bufs.zipWithIndex.foreach { case (b, p) =>
      if (b.nonEmpty) {
        FeedSource.append(feedDir, p, b.toSeq)
        replayed += b.size
      }
    }
    replayed
  }

  /** Run the composed job over an existing feed log until drained.
    *
    * @param crashAfterBatch inject [[InjectedCrash]] after the apply
    *   of this batchId (post-publish, pre-commit) — the caller then
    *   calls run() again with the same dirs to model the restart.
    * @param crashBeforeApply inject [[InjectedCrash]] AFTER the
    *   batch's stateful plan fully executed (every state-store
    *   partition committed while draining the batch) but BEFORE its
    *   generation published — the OTHER half of the at-least-once
    *   window (r16): on restart the batch re-executes against
    *   rolled-back state and must re-emit identical rows, and the
    *   apply runs for real (no generation marker exists), so parity
    *   here proves the state rollback, not just the skip path.
    * @param tailWhile when set, the run LIVE-TAILS a feed that is
    *   still being appended to: it keeps draining for as long as the
    *   callback returns true (writer active), then drains once more —
    *   the production shape where appends race the stream, vs the
    *   pre-written-log replay (r16). Admission control
    *   (`maxBatchRecords`) stays active throughout.
    * @param bucketServe when set, generations publish BUCKETED by
    *   `user_id` into this many buckets ([[applyGenerationBucketed]])
    *   — the streaming-maintained serving table; read it back with
    *   [[servedSnapshot]]. Default keeps the plain-parquet shape.
    * @param holdBeforeApply callback invoked with each batchId AFTER
    *   the batch's stateful plan fully executed (state committed,
    *   offsets WAL'd) but BEFORE its generation publishes — a blocking
    *   callback PARKS the driver inside the at-least-once window, the
    *   zombie-fencing proof's stall point (a network-partitioned
    *   driver frozen mid-batch while a supervisor starts its
    *   replacement; FaultInject `zombie`).
    * @param pointerCommit when true, generations commit via the
    *   rename-free pointer protocol ([[applyGenerationPointer]]) —
    *   the object-store-safe shape; read the result back with
    *   [[latestSnapshotPointer]]. Mutually exclusive with
    *   `bucketServe` (a bucketed serving layout is a catalog-attached
    *   directory contract, not an object commit).
    * @return telemetry incl. whether the injected crash fired. */
  def run(
      s: SparkSession, feedDir: String, snapRoot: String, ckptDir: String,
      maxBatchRecords: Long,
      crashAfterBatch: Option[Long] = None,
      crashBeforeApply: Option[Long] = None,
      tailWhile: Option[() => Boolean] = None,
      bucketServe: Option[Int] = None,
      holdBeforeApply: Option[Long => Unit] = None,
      pointerCommit: Boolean = false): RunStats = {
    require(!(pointerCommit && bucketServe.nonEmpty),
      "pointerCommit and bucketServe are mutually exclusive")
    import s.implicits._
    // transformWithState requires the RocksDB provider (state-v2
    // runtime); set it for the run and restore the caller's choice.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(provKey)
    s.conf.set(provKey, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    var skipped = 0
    var applied = 0
    // Telemetry accumulates in a listener, not only q.recentProgress:
    // recentProgress retains just the last ~100 updates, so a long
    // replay silently undercounts emitted sessions and peak state
    // (ADVICE r15). The listener sees every update; recentProgress is
    // still merged at the end because listener delivery is async and
    // the tail may not have been posted yet — keying by (queryId,
    // batchId) makes the union exact with no double counting.
    val progById = scala.collection.mutable.HashMap
      .empty[(java.util.UUID, Long),
        org.apache.spark.sql.streaming.StreamingQueryProgress]
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        progById.synchronized {
          progById((e.progress.id, e.progress.batchId)) = e.progress
        }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    // Everything below runs under try/finally: a non-injected failure
    // must still stop the query, drop the listener, and restore the
    // caller's provider conf (ADVICE r15 — a rethrow used to leak all
    // three into subsequent tests/modes).
    try {
    s.streams.addListener(listener)
    val events = s.readStream.format("graft-feed")
      .option("maxBatchRecords", maxBatchRecords.toString)
      .load(feedDir)
      // feed value carries "event_id,event_type,value" (split limit 3
      // on the segment line keeps embedded commas intact); key is the
      // user id — also the feed partitioner, so per-user order is the
      // per-partition order sessionization assumes
      .select(col("ts"), col("key").cast("long").as("user_id"),
        split(col("value"), ",", 3).as("v"))
      .select(element_at(col("v"), 1).cast("long").as("event_id"),
        col("ts"), col("user_id"),
        element_at(col("v"), 2).as("event_type"),
        element_at(col("v"), 3).cast("double").as("value"))
      .as[StreamingJobs.Event]
    val sessions = StreamingJobs.sessionizeTws(events).toDF()
    val t0 = System.nanoTime()
    val q = sessions.writeStream
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // Drain EVERY partition before deciding anything (found by the
        // sf5 crash/restart replay): Spark 4.x validates that all
        // state-store partitions committed for the batch, so a
        // re-executed batch whose generation already exists must still
        // process the full DataFrame — gating the only action behind
        // the dir check (or an isEmpty/limit-style probe) commits 0 of
        // N state partitions and the restart dies with
        // STATE_STORE_COMMIT_VALIDATION_FAILED. persist() keeps the
        // decide-then-apply path one computation of the stateful plan.
        batch.persist()
        try {
          val n = batch.count()
          // count() ran the stateful plan: state partitions are
          // committed for this batch — crashing HERE leaves committed
          // state but no generation (the pre-publish window)
          holdBeforeApply.foreach(_(id))
          if (crashBeforeApply.contains(id)) throw new InjectedCrash(id)
          if (n > 0) {
            val published = bucketServe match {
              case Some(b) => applyGenerationBucketed(s, snapRoot, batch, id, b)
              case None if pointerCommit =>
                applyGenerationPointer(s, snapRoot, batch, id)
              case None => applyGeneration(s, snapRoot, batch, id)
            }
            if (published) applied += 1 else skipped += 1
          }
        } finally batch.unpersist()
        if (crashAfterBatch.contains(id)) throw new InjectedCrash(id)
      }
      .start()
    val crashed =
      try {
        try {
          tailWhile match {
            case None => q.processAllAvailable()
            case Some(writerActive) =>
              // live tail: drain, let the writer land more segments,
              // repeat; one final drain after the writer stops closes
              // the race between its last append and our last check
              while (writerActive()) {
                q.processAllAvailable(); Thread.sleep(20L)
              }
              q.processAllAvailable()
          }
          false
        }
        catch { case e: Throwable =>
          val root = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).toSeq
          if (root.exists(_.isInstanceOf[InjectedCrash])) true else throw e
        }
      } finally { try q.stop() catch { case _: Throwable => () } }
    // Union: listener map (full history) + recentProgress tail (the
    // last ~100, synchronously complete after stop) — see above.
    val progress = progById.synchronized {
      q.recentProgress.foreach(p => progById((p.id, p.batchId)) = p)
      progById.toSeq.collect { case ((id, _), p) if id == q.id => p }
        .sortBy(_.batchId)
    }
    var peakRows = 0L
    var peakBytes = 0L
    var emitted = 0L
    progress.foreach { p =>
      val so = p.stateOperators.headOption
      peakRows = math.max(peakRows, so.map(_.numRowsTotal).getOrElse(0L))
      peakBytes = math.max(peakBytes, so.map(_.memoryUsedBytes).getOrElse(0L))
      emitted += Option(p.sink).map(_.numOutputRows).getOrElse(0L)
      System.err.println(s"[composed] batch=${p.batchId} " +
        s"in=${p.numInputRows} " +
        s"stateRows=${so.map(_.numRowsTotal).getOrElse(0L)} " +
        s"out=${Option(p.sink).map(_.numOutputRows).getOrElse(0L)} " +
        s"watermark=${Option(p.eventTime.get("watermark")).getOrElse("-")}")
    }
    val logEnd = FeedSource.endOffsets(feedDir).values.sum
    val processed = progress.flatMap(p =>
      p.sources.headOption.flatMap(src => Option(src.endOffset))
        .map(j => FeedSource.parseOffsets(j).values.sum))
      .maxOption.getOrElse(0L)
    RunStats(progress.size, peakRows, peakBytes, emitted,
      (if (pointerCommit) pointerGenerationIds(s, snapRoot)
       else generationIds(s, snapRoot)).size,
      skipped, logEnd - processed,
      (System.nanoTime() - t0) / 1e9, crashed)
    } finally {
      s.streams.removeListener(listener)
      prevProv match {
        case Some(v) => s.conf.set(provKey, v)
        case None => s.conf.unset(provKey)
      }
    }
  }
}
