package graft

import java.sql.Timestamp

import graft.streaming.StreamingJobs
import graft.streaming.StreamingJobs.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private def runToMemory(
      df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("watermark drops events later than the 10-minute bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingJobs.tumblingCounts(in.toDF())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("wm_out").start()
    // batch 1: two events at 10:05/10:20 set watermark to 10:20-10m=10:10
    in.addData(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: advance event time to 11:30 → watermark 11:20 closes 10:xx
    in.addData(Event(3, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 3: a straggler back in hour 10 is beyond the bound → dropped
    in.addData(Event(4, ts(40), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val hour10 = spark.table("wm_out")
      .where(col("w_start") === lit("2024-01-01 10:00:00").cast("timestamp"))
      .collect()
    assert(hour10.map(_.getLong(2)).sum == 2,
      s"late event must not count: ${hour10.mkString(",")}")
  }

  test("streaming session windows merge events within the 30-minute gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // user 1: 10:00,10:10 (one session), 11:00 (new session)
    in.addData(
      Event(1, ts(0), 1, "a", 0), Event(2, ts(10), 1, "a", 0),
      Event(3, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "a", 0),
      Event(9, Timestamp.valueOf("2024-01-01 12:30:00"), 99, "a", 0))
    runToMemory(StreamingJobs.sessionize(in.toDF()), "sess_out")
    val rows = spark.table("sess_out").where(col("user_id") === 1)
      .orderBy("session_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Timestamp]("session_end") ==
      Timestamp.valueOf("2024-01-01 10:40:00")) // last event + gap
    assert(rows(0).getLong(3) == 2 && rows(1).getLong(3) == 1)
  }

  test("stream-static join enriches events against the dim per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(15), 2, "click", 1.0),
      Event(4, ts(20), 99, "click", 1.0)) // no dim row → dropped (inner)
    // Complete mode: the hour-10 window never finalizes (no later event
    // advances the watermark), so Append would emit nothing here.
    runToMemory(StreamingJobs.enrichedTumbling(in.toDF(), dim), "enrich_out",
      OutputMode.Complete)
    val rows = spark.table("enrich_out").orderBy("c_mktsegment")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("BUILDING", 2L), ("MACHINERY", 1L)))
  }

  test("salted stream-static enrichment: result ≡ plain join, plan stays " +
      "shuffled on (user_id, salt) — the niche AQE cannot re-plan") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // skewed stream: user 1 is hot (4 of 6 events)
    val data = Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(15), 1, "click", 1.0), Event(4, ts(20), 1, "click", 1.0),
      Event(5, ts(25), 2, "click", 1.0), Event(6, ts(30), 3, "click", 1.0))
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (3L, "BUILDING"))
      .toDF("user_id", "c_mktsegment")
    val in = MemoryStream[Event]
    in.addData(data: _*)
    val job = StreamingJobs.saltedEnrichment(in.toDF(), dim)
    val sq = job.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("salted_enrich_out").start()
    sq.processAllAvailable()
    // the streaming plan is FROZEN (no AQE): the join must be the
    // shuffled (key, salt) form, never a broadcast — a broadcast has
    // no shuffle for the salt to spread, and at scale the premise is
    // a dim too large/volatile to broadcast
    val plan = sq.asInstanceOf[org.apache.spark.sql.execution.streaming
      .runtime.StreamingQueryWrapper].streamingQuery.lastExecution
      .executedPlan.toString
    sq.stop()
    assert(plan.contains("salt"), plan.take(1500))
    assert(plan.contains("ShuffledHashJoin"), plan.take(1500))
    assert(!plan.contains("BroadcastHashJoin"), plan.take(1500))
    val got = spark.table("salted_enrich_out")
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    // parity oracle: the plain (unsalted, unhinted) batch join
    val plain = data.toDF().join(dim, "user_id")
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == plain, s"salted streaming $got vs plain batch $plain")
    assert(got == Seq(("BUILDING", 5L), ("MACHINERY", 1L)))
  }

  test("sessionizeWithIds: gap closes a session with a stable per-user seq") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // user 1: 10:00, 10:10 (session 1), then 11:00 — gap > 30m closes
    // session 1 and opens session 2, which stays open (never emitted)
    in.addData(
      Event(1, ts(0), 1, "a", 0), Event(2, ts(10), 1, "a", 0),
      Event(3, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "a", 0))
    runToMemory(StreamingJobs.sessionizeWithIds(in.toDS()).toDF(), "sid_out")
    val rows = spark.table("sid_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(rows == Seq((1L, 1L, 2L, 600L, false)), s"got $rows")
  }

  test("sessionizeWithIds: event-time timeout closes an abandoned session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingJobs.sessionizeWithIds(in.toDS())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("sid_to_out").start()
    in.addData(Event(1, ts(0), 7, "a", 0)) // user 7 opens a session
    q.processAllAvailable()
    // another user's events advance the watermark past 10:30+gap...
    in.addData(Event(2, Timestamp.valueOf("2024-01-01 12:00:00"), 8, "a", 0))
    q.processAllAvailable()
    // ...and the next batch fires user 7's timeout (no row needed)
    in.addData(Event(3, Timestamp.valueOf("2024-01-01 14:00:00"), 8, "a", 0))
    q.processAllAvailable()
    q.stop()
    val u7 = spark.table("sid_to_out").where(col("user_id") === 7)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4))).toSeq
    assert(u7 == Seq((1L, 1L, true)), s"got $u7")
  }

  test("sessionizeWithIds matches batch q_event_sessions on the fixture") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = graft.engine.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Event].collect().toSeq
    val maxTs = ev.map(_.ts.getTime).max
    // per-user sentinels a day past the fixture close every real
    // session via the row path; the sentinel's own session stays open
    val sentinels = ev.map(_.user_id).distinct.zipWithIndex.map {
      case (u, i) => Event(1000000L + i, new Timestamp(maxTs + 86400000L),
        u, "sentinel", 0)
    }
    val in = MemoryStream[Event]
    in.addData(ev)
    val sq = StreamingJobs.sessionizeWithIds(in.toDS())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("sid_parity_out").start()
    sq.processAllAvailable()
    in.addData(sentinels)
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.table("sid_parity_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val batch = q("q_event_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(batch.nonEmpty && streamed == batch,
      s"stream ${streamed.size} vs batch ${batch.size}; " +
        s"only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("keyed-state jobs run identically on the RocksDB state store provider") {
    // r13: the production state-store posture. Local/HDFS-backed state
    // is the toy default; a 1000-executor job holding O(users) session
    // state runs RocksDB (bounded executor heap, changelog/snapshot to
    // checkpoint storage, the Kafka-scale default every cluster guide
    // recommends). This proves the engine's stateful jobs —
    // mapGroupsWithState sessionization with ids and the tumbling
    // watermark agg — run on RocksDB with results identical to the
    // default provider, i.e. nothing in the jobs depends on provider
    // semantics (rocksdbjni ships in this container, so the real
    // native store runs, not a stub).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider"
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "view", 2.0),
      Event(3, ts(10), 2, "click", 3.0), Event(4, ts(50), 1, "click", 4.0),
      Event(5, ts(55), 2, "view", 5.0))
    val closer = Seq(
      Event(9, Timestamp.valueOf("2024-01-02 10:00:00"), 1, "x", 0),
      Event(10, Timestamp.valueOf("2024-01-02 10:00:00"), 2, "x", 0))
    def run(name: String): Set[(Long, Long, Long)] = {
      val in = MemoryStream[Event]
      val q = StreamingJobs.sessionizeWithIds(in.toDS())
        .writeStream.outputMode(OutputMode.Append).format("memory")
        .queryName(name).start()
      in.addData(events)
      q.processAllAvailable()
      in.addData(closer)
      q.processAllAvailable()
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    }
    val default = run("rocks_default_out")
    val old = spark.conf.getOption(key)
    spark.conf.set(key, rocks)
    try {
      val onRocks = run("rocks_rocksdb_out")
      assert(onRocks == default,
        s"RocksDB-backed run diverged: $onRocks vs $default")
      assert(default.nonEmpty)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState sessionization matches the mapGroupsWithState twin") {
    // r13: the same operator on Spark 4's state-v2 API (named state
    // slots, explicit event-time timers, RocksDB-mandatory runtime).
    // Parity on the same input — including a batch-gap session split,
    // a timer-closed abandoned session, and the multi-batch path —
    // proves the two APIs are interchangeable implementations.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch1 = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "view", 2.0),
      Event(3, ts(10), 2, "click", 3.0),
      Event(4, ts(50), 1, "click", 4.0)) // >30m after u1's last → split
    val batch2 = Seq(
      Event(5, ts(55), 2, "view", 5.0),
      Event(6, Timestamp.valueOf("2024-01-01 12:40:00"), 3, "click", 6.0))
    val closer = Seq( // a day later: watermark closes everything open
      Event(9, Timestamp.valueOf("2024-01-02 10:00:00"), 99, "x", 0))
    def run(name: String,
        job: org.apache.spark.sql.Dataset[Event] =>
          org.apache.spark.sql.Dataset[StreamingJobs.UserSession])
        : Set[(Long, Long, Long, Long, Boolean)] = {
      val in = MemoryStream[Event]
      val q = job(in.toDS())
        .writeStream.outputMode(OutputMode.Append).format("memory")
        .queryName(name).start()
      Seq(batch1, batch2, closer).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSet
    }
    val viaMgws = run("tws_mgws_out", StreamingJobs.sessionizeWithIds(_))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val viaTws = run("tws_tws_out", StreamingJobs.sessionizeTws(_))
      assert(viaTws == viaMgws,
        s"state-v2 diverged: only-tws=${viaTws -- viaMgws} " +
          s"only-mgws=${viaMgws -- viaTws}")
      // the fixture shape really exercised the paths: a split session
      // for user 1 and at least 4 closed sessions overall
      assert(viaMgws.count(_._1 == 1) >= 2, s"$viaMgws")
      assert(viaMgws.size >= 4)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("dropDuplicatesWithinWatermark dedups repeated event ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(0), 1, "a", 0), Event(1, ts(1), 1, "a", 0),
      Event(2, ts(2), 1, "a", 0))
    runToMemory(StreamingJobs.dedupWithinWatermark(in.toDF()), "dedup_out")
    assert(spark.table("dedup_out").count() == 2)
  }

  test("stream-stream interval join pairs clicks with later errors, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = StreamingJobs.clicksBeforeErrors(clicks.toDF(), errors.toDF())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("ss_join_out").start()
    // user 1: clicks at 10:02 and 10:04; error at 10:05 → both pair.
    // click at 09:58 is outside the 5-minute window → no pair.
    // user 2: click at 10:03 but no error → no pair.
    clicks.addData(
      Event(10, Timestamp.valueOf("2024-01-01 09:58:00"), 1, "click", 0),
      Event(11, ts(2), 1, "click", 0), Event(12, ts(4), 1, "click", 0),
      Event(13, ts(3), 2, "click", 0))
    errors.addData(Event(20, ts(5), 1, "error", 0))
    q.processAllAvailable()
    // advance both watermarks past the window, then a straggler error
    // at 10:06 still inside retained click state pairs with 10:02/10:04
    clicks.addData(Event(14, Timestamp.valueOf("2024-01-01 10:30:00"), 9, "click", 0))
    errors.addData(Event(21, ts(6), 1, "error", 0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join_out")
      .select("error_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got == Set((20L, 11L), (20L, 12L), (21L, 11L), (21L, 12L)),
      s"got $got")
  }

  test("q_stream_join batch form matches the streaming join on the fixture") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = graft.engine.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Event]
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    clicks.addData(ev.filter(_.event_type == "click").collect().toSeq)
    errors.addData(ev.filter(_.event_type == "error").collect().toSeq)
    runToMemory(
      StreamingJobs.clicksBeforeErrors(clicks.toDF(), errors.toDF()),
      "ss_parity_out")
    val streamed = spark.table("ss_parity_out")
      .select("error_id", "click_id").as[(Long, Long)].collect().toSet
    val batch = q("q_stream_join")
      .select("error_id", "click_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty,
      s"stream ${streamed.size} vs batch ${batch.size}")
  }

  test("flatMapGroupsWithState keeps a running per-user count across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingJobs.runningCountPerUser(in.toDS())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("state_out").start()
    in.addData(Event(1, ts(0), 7, "a", 0), Event(2, ts(1), 7, "a", 0))
    q.processAllAvailable()
    in.addData(Event(3, ts(2), 7, "a", 0))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("state_out").where(col("user_id") === 7)
      .orderBy("n_events").collect().map(_.getLong(1))
    assert(counts.toSeq == Seq(2L, 3L), s"got ${counts.toSeq}")
  }

  test("streaming last-touch attribution: state carries the last view across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingJobs.lastTouchAttribution(in.toDS(),
        lookbackUs = 10L * 60 * 1000000L) // 10-minute lookback
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("attr_out").start()
    // batch 1: view then purchase (same batch, in-batch sort attributes);
    // a purchase by a user with no view stays unattributed
    in.addData(
      Event(1, ts(0), 7, "view", 0),
      Event(2, ts(2), 7, "purchase", 5.0),
      Event(3, ts(2), 9, "purchase", 5.0))
    q.processAllAvailable()
    // batch 2: the view carried in state attributes a later purchase;
    // then a purchase beyond the 10-minute lookback does not
    in.addData(Event(4, ts(8), 7, "purchase", 5.0))
    q.processAllAvailable()
    in.addData(Event(5, ts(30), 7, "purchase", 5.0))
    q.processAllAvailable()
    // batch 3: a view whose EVENT TIME is after the purchase must not
    // attribute it, whatever the arrival order in the batch — the
    // in-batch (ts, event_id) sort, not arrival order, decides
    in.addData(
      Event(6, ts(41), 11, "purchase", 5.0),
      Event(7, ts(42), 11, "view", 0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr_out").orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(rows == Seq(
      2L -> Some(1L),  // in-batch attribution
      3L -> None,      // no view for user 9
      4L -> Some(1L),  // state carried across batches
      5L -> None,      // beyond lookback
      6L -> None       // view sorts after the purchase
    ), s"got $rows")
  }

  test("streaming CDC apply: foreachBatch merges each micro-batch into the snapshot") {
    // The CDC tail-end: a changelog stream applied to a parquet
    // snapshot generation-by-generation via Snapshot.applyChangelog —
    // upserts and deletes land exactly once per micro-batch, and the
    // final snapshot equals applying all batches in order.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_").toString
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v").write.parquet(s"$root/gen0")

    val in = MemoryStream[(Long, String, Int, String)]
    var gen = 0
    val q = in.toDF().toDF("k", "name", "v", "op")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // read current generation, merge, write next — generations are
        // immutable, so a replayed batch rewrites the SAME next
        // generation (idempotent), never double-applies
        val cur = spark.read.parquet(s"$root/gen$gen")
        graft.engine.Snapshot.applyChangelog(
            cur, batch, Seq("k"), "op")
          .write.mode("overwrite").parquet(s"$root/gen${gen + 1}")
        gen += 1
      }
      .start()
    in.addData((2L, "b2", 21, "U"), (9L, "z", 90, "U"))
    q.processAllAvailable()
    in.addData((3L, "c", 30, "D"))
    q.processAllAvailable()
    q.stop()

    assert(gen == 2)
    val fin = spark.read.parquet(s"$root/gen2")
      .orderBy("k").as[(Long, String, Int)].collect()
    assert(fin.toSeq == Seq(
      (1L, "a", 10), (2L, "b2", 21), (9L, "z", 90)))
    graft.engine.Snapshot.delete(spark, root)
  }
}
