package graft

import org.apache.spark.sql.functions._

/** Streaming scale probe (r8 verdict next-10 #9): run the two
  * spec-only streaming components — C106 keyed-state sessionization
  * and C63 CDC apply — over a REAL scale fixture (sf5 events, ~50× the
  * canonical bench) instead of toy MemoryStreams, and report the
  * numbers that matter for a cluster: state-store rows/bytes per
  * micro-batch (must be O(users), watermark-bounded — never O(events))
  * and per-batch apply latency for the CDC path.
  *
  * The fixture streams as ~20 EVENT-TIME-RANGED parquet files
  * (repartitionByRange on ts; the file source takes them in path
  * order, so per-user arrival is event-time-ordered — the documented
  * delivery assumption of the keyed-state jobs) with
  * maxFilesPerTrigger=1, giving a 20-micro-batch run whose progress
  * telemetry is printed per batch and summarized at the end.
  *
  * Usage: runMain graft.StreamScale [sfDir] [chunks]
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata-sf5")
    val chunks = if (args.length > 1) args(1).toInt else 20
    if (args.contains("composed-tail")) { runComposedTail(sfDir, chunks); return }
    if (args.contains("composed-serve")) { runComposedServe(sfDir, chunks); return }
    if (args.contains("composed")) { runComposed(sfDir, chunks); return }
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"), "graft-streamscale")
    import spark.implicits._
    val ev = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    println(s"[streamscale] events=$nEvents users=$nUsers sf=$sfDir")
    val work = java.nio.file.Files
      .createTempDirectory("graft_streamscale_").toString
    val inDir = s"$work/in"
    ev.repartitionByRange(chunks, col("ts")).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema

    // ---- C106: keyed-state sessionization over the full sf5 stream
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .as[graft.streaming.StreamingJobs.Event]
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamingJobs.sessionizeWithIds(stream)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$work/ckpt_sess")
      .outputMode("append").start()
    q.processAllAvailable()
    val wallSess = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    q.stop()
    var peakRows = 0L
    var peakBytes = 0L
    var outRows = 0L
    progress.foreach { p =>
      val so = p.stateOperators.headOption
      val rows = so.map(_.numRowsTotal).getOrElse(0L)
      val bytes = so.map(_.memoryUsedBytes).getOrElse(0L)
      peakRows = math.max(peakRows, rows)
      peakBytes = math.max(peakBytes, bytes)
      outRows += Option(p.sink).map(_.numOutputRows).getOrElse(0L)
      println(s"[streamscale] sess batch=${p.batchId} in=${p.numInputRows} " +
        s"stateRows=$rows stateBytes=$bytes " +
        s"watermark=${Option(p.eventTime.get("watermark")).getOrElse("-")}")
    }
    println(f"[streamscale] SESSIONIZE: wall=$wallSess%.1f s " +
      s"batches=${progress.size} peakStateRows=$peakRows " +
      s"peakStateBytes=$peakBytes sessionRowsOut=$outRows " +
      s"(users=$nUsers events=$nEvents -> state/users=" +
      f"${peakRows.toDouble / nUsers}%.2f)")

    // ---- C123 (r14, VERDICT r13 next #5): the SAME sessionization on
    // the transformWithState/state-v2 runtime under RocksDB, over the
    // same 20-batch replay — the production-posture twin of the leg
    // above. Reports the same telemetry (state rows/bytes per batch,
    // wall) plus OUTPUT PARITY with the mapGroupsWithState run: the
    // two APIs must emit the same number of closed sessions on the
    // same input or they are not one operator. Timer hygiene is the
    // scale risk this probes: state-v2 timers ACCUMULATE across
    // batches (no setTimeoutTimestamp overwrite), so a leak shows up
    // here as state rows growing past O(users).
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val streamTws = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .as[graft.streaming.StreamingJobs.Event]
    val tTws = System.nanoTime()
    val qTws = graft.streaming.StreamingJobs.sessionizeTws(streamTws)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$work/ckpt_tws")
      .outputMode("append").start()
    qTws.processAllAvailable()
    val wallTws = (System.nanoTime() - tTws) / 1e9
    val progTws = qTws.recentProgress.toSeq
    qTws.stop()
    prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    var peakRowsTws = 0L
    var peakBytesTws = 0L
    var outRowsTws = 0L
    progTws.foreach { p =>
      val so = p.stateOperators.headOption
      val rows = so.map(_.numRowsTotal).getOrElse(0L)
      val bytes = so.map(_.memoryUsedBytes).getOrElse(0L)
      peakRowsTws = math.max(peakRowsTws, rows)
      peakBytesTws = math.max(peakBytesTws, bytes)
      outRowsTws += Option(p.sink).map(_.numOutputRows).getOrElse(0L)
      println(s"[streamscale] tws batch=${p.batchId} in=${p.numInputRows} " +
        s"stateRows=$rows stateBytes=$bytes " +
        s"watermark=${Option(p.eventTime.get("watermark")).getOrElse("-")}")
    }
    println(f"[streamscale] TWS-SESSIONIZE (RocksDB): wall=$wallTws%.1f s " +
      s"batches=${progTws.size} peakStateRows=$peakRowsTws " +
      s"peakStateBytes=$peakBytesTws sessionRowsOut=$outRowsTws " +
      f"(state/users=${peakRowsTws.toDouble / nUsers}%.2f; " +
      s"parity with mGWS: ${outRowsTws == outRows} " +
      s"[$outRowsTws vs $outRows]; throughput ratio tws/mGWS=" +
      f"${wallTws / wallSess}%.2f)")

    // ---- C63: CDC apply at scale — each micro-batch is a changelog
    // of per-user upserts merged into an immutable snapshot chain
    Seq.empty[(Long, Long, String)].toDF("user_id", "event_id", "event_type")
      .write.parquet(s"$work/gen0")
    var gen = 0
    val batchTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cdcStream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q2 = cdcStream
      .writeStream
      .option("checkpointLocation", s"$work/ckpt_cdc")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // changelog = each user's LAST event in the batch, as an upsert
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val changes = batch
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"),
            lit("U").as("op"))
        val cur = spark.read.parquet(s"$work/gen$gen")
        val tb = System.nanoTime()
        graft.engine.Snapshot.applyChangelog(
            cur, changes, Seq("user_id"), "op")
          .write.mode("overwrite").parquet(s"$work/gen${gen + 1}")
        batchTimes += (System.nanoTime() - tb) / 1e9
        gen += 1
      }
      .start()
    q2.processAllAvailable()
    q2.stop()
    val finalRows = spark.read.parquet(s"$work/gen$gen").count()
    println(f"[streamscale] CDC: batches=$gen " +
      f"avgApply=${batchTimes.sum / math.max(1, batchTimes.size)}%.2f s " +
      f"maxApply=${batchTimes.max}%.2f s snapshotRows=$finalRows " +
      s"(== users? ${finalRows == nUsers})")

    // ---- r13 (r11 verdict task #7): the offset-managed feed source at
    // scale — replay the whole fixture into a partitioned feed log,
    // drive the declared tumbling job through format("graft-feed")
    // under admission control, and report FEED LAG per batch (log end
    // minus processed-through — the kafka-consumer-groups --describe
    // number): the telemetry a backfill run watches to size
    // maxBatchRecords. The replay writer streams via toLocalIterator
    // (driver-light), segments of 250k records.
    val feedDir = s"$work/feed"
    val parts = 4
    val segSize = 250000
    val bufs = Array.fill(parts)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)])
    var replayed = 0L
    val it = ev.select(col("event_id"), col("ts"), col("event_type"))
      .toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val p = (r.getLong(0) % parts).toInt
      bufs(p) += ((r.getTimestamp(1).getTime, r.getString(2), "1"))
      if (bufs(p).size >= segSize) {
        graft.streaming.FeedSource.append(feedDir, p, bufs(p).toSeq)
        replayed += bufs(p).size
        bufs(p).clear()
      }
    }
    bufs.zipWithIndex.foreach { case (b, p) =>
      if (b.nonEmpty) {
        graft.streaming.FeedSource.append(feedDir, p, b.toSeq)
        replayed += b.size
      }
    }
    val logEnd = graft.streaming.FeedSource.endOffsets(feedDir).values.sum
    val cap = math.max(10000L, nEvents / chunks)
    println(s"[streamscale] FEED: replayed=$replayed records " +
      s"parts=$parts logEnd=$logEnd maxBatchRecords=$cap")
    val feedStream = spark.readStream.format("graft-feed")
      .option("maxBatchRecords", cap.toString).load(feedDir)
      .select(col("ts"), col("key").as("event_type"))
    val tF = System.nanoTime()
    val q3 = graft.streaming.StreamingJobs.tumblingCounts(feedStream)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$work/ckpt_feed")
      .outputMode("append").start()
    q3.processAllAvailable()
    val wallFeed = (System.nanoTime() - tF) / 1e9
    val feedProg = q3.recentProgress.toSeq
    q3.stop()
    feedProg.foreach { p =>
      val processed = p.sources.headOption
        .flatMap(s => Option(s.endOffset))
        .map(j => graft.streaming.FeedSource.parseOffsets(j).values.sum)
        .getOrElse(0L)
      println(s"[streamscale] feed batch=${p.batchId} " +
        s"in=${p.numInputRows} processedThrough=$processed " +
        s"lag=${logEnd - processed}")
    }
    val processedFinal = feedProg.flatMap(p =>
      p.sources.headOption.flatMap(s => Option(s.endOffset))
        .map(j => graft.streaming.FeedSource.parseOffsets(j).values.sum))
      .maxOption.getOrElse(0L)
    val committed =
      graft.streaming.FeedSource.committedOffsets(feedDir).values.sum
    println(f"[streamscale] FEED: wall=$wallFeed%.1f s " +
      s"batches=${feedProg.size} " +
      s"processedLag=${logEnd - processedFinal} " +
      s"committedSurfaceLag=${logEnd - committed} " +
      s"(the _committed monitor trails the checkpoint by one batch — " +
      s"Spark fires commit(end) when the NEXT batch starts)")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(work))
    spark.stop()
  }

  /** r15 (VERDICT r14 missing #3): the COMPOSED production pipeline at
    * 50× — feed source → transformWithState sessionization on RocksDB
    * → exactly-once CDC apply into snapshot generations — with an
    * injected crash mid-run (post-publish, pre-commit: the
    * at-least-once window) and a restart from the checkpoint. Twin
    * CLEAN run (separate dirs, same feed log) is the parity oracle:
    * the crash/restart snapshot must equal it bit-for-bit. Reports the
    * three claims a deployment rests on: exactly-once generations
    * (skip path taken, parity holds), FLAT state (peak state rows ≈
    * users, never events), drained lag (processed-through == log end)
    * across the restart. */
  private def runComposed(sfDir: String, chunks: Int): Unit = {
    import graft.streaming.ComposedPipeline
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"), "graft-streamcompose")
    val ev = graft.engine.Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val work = java.nio.file.Files
      .createTempDirectory("graft_streamcompose_").toString
    val feedDir = s"$work/feed"
    val parts = 4
    val replayed = ComposedPipeline.replayToFeed(ev, feedDir, parts)
    // maxBatchRecords is PER PARTITION (FeedSource admission), so a
    // ~`chunks`-batch replay needs nEvents / (parts × chunks)
    val cap = math.max(2500L, nEvents / (parts.toLong * chunks))
    println(s"[streamcompose] events=$nEvents users=$nUsers " +
      s"replayed=$replayed parts=$parts maxBatchRecords=$cap sf=$sfDir")

    // leg 1: crash at ~mid-replay, then restart from the checkpoint
    val crashAt = chunks / 2
    val t0 = System.nanoTime()
    val s1 = ComposedPipeline.run(spark, feedDir, s"$work/snap_crash",
      s"$work/ckpt_crash", cap, crashAfterBatch = Some(crashAt.toLong))
    println(s"[streamcompose] crash-leg: batches=${s1.batches} " +
      s"crashed=${s1.crashed} gens=${s1.generations} " +
      s"peakStateRows=${s1.peakStateRows}")
    require(s1.crashed, "injected crash did not fire — raise chunks")
    val s2 = ComposedPipeline.run(spark, feedDir, s"$work/snap_crash",
      s"$work/ckpt_crash", cap)
    val wallCrash = (System.nanoTime() - t0) / 1e9
    println(s"[streamcompose] restart-leg: batches=${s2.batches} " +
      s"gens=${s2.generations} skippedReapplies=${s2.skippedReapplies} " +
      s"peakStateRows=${s2.peakStateRows} processedLag=${s2.processedLag}")

    // leg 2: clean single run, the parity oracle
    val t1 = System.nanoTime()
    val sc = ComposedPipeline.run(spark, feedDir, s"$work/snap_clean",
      s"$work/ckpt_clean", cap)
    val wallClean = (System.nanoTime() - t1) / 1e9

    val crashFinal = ComposedPipeline
      .latestSnapshot(spark, s"$work/snap_crash").get
    val cleanFinal = ComposedPipeline
      .latestSnapshot(spark, s"$work/snap_clean").get
    val crashRows = crashFinal.count()
    val parity = crashRows == cleanFinal.count() &&
      crashFinal.exceptAll(cleanFinal).isEmpty &&
      cleanFinal.exceptAll(crashFinal).isEmpty
    val dupKeys = crashFinal.groupBy("user_id", "session_seq").count()
      .where(org.apache.spark.sql.functions.col("count") > 1).count()
    println(f"[streamcompose] COMPOSED: wallCrashPath=$wallCrash%.1f s " +
      f"(incl. restart) wallClean=$wallClean%.1f s " +
      s"sessions=$crashRows dupKeys=$dupKeys " +
      s"parityWithCleanRun=$parity " +
      s"stateFlat=${s2.peakStateRows <= nUsers * 2} " +
      s"lagDrained=${s2.processedLag == 0L && sc.processedLag == 0L} " +
      s"exactlyOnce=${parity && dupKeys == 0}")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(work))
    spark.stop()
  }

  /** SERVING-LAYOUT variant of [[runComposed]] (r17 — VERDICT r16 next
    * #7 at scale): the same composed pipeline, but every generation
    * publishes BUCKETED by user via `bucketServe`, so the
    * stream-maintained table serves zero-exchange joins. Reports the
    * cost side of that trade at scale — wall vs the plain-parquet
    * pipeline over the same feed (the bucketed publish pays a layout
    * shuffle per generation) — and the benefit side: a timed consumer
    * join + bucket-key aggregate over the final served table, with the
    * exchange count of each plan printed (must be 0 under the join).
    * Run beside `composed` at the same sf for the comparison. */
  private def runComposedServe(sfDir: String, chunks: Int): Unit = {
    import graft.streaming.ComposedPipeline
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"), "graft-streamserve")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_SERVE_BUCKETS", "32").toInt
    val ev = graft.engine.Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val work = java.nio.file.Files
      .createTempDirectory("graft_streamserve_").toString
    try {
      val feedDir = s"$work/feed"
      val parts = 4
      val replayed = ComposedPipeline.replayToFeed(ev, feedDir, parts)
      val cap = math.max(2500L, nEvents / (parts.toLong * chunks))
      println(s"[streamserve] events=$nEvents users=$nUsers " +
        s"replayed=$replayed buckets=$buckets maxBatchRecords=$cap sf=$sfDir")
      // bucketed leg FIRST so it absorbs session warm-up (RocksDB
      // provider init, first feed scans) — biases the reported
      // overhead ratio AGAINST the serving layout, making the "modest
      // overhead" claim conservative
      val t1 = System.nanoTime()
      val sb = ComposedPipeline.run(spark, feedDir, s"$work/snap_bkt",
        s"$work/ckpt_bkt", cap, bucketServe = Some(buckets))
      val wallBkt = (System.nanoTime() - t1) / 1e9
      val t0 = System.nanoTime()
      val sp = ComposedPipeline.run(spark, feedDir, s"$work/snap_plain",
        s"$work/ckpt_plain", cap)
      val wallPlain = (System.nanoTime() - t0) / 1e9
      val served =
        ComposedPipeline.servedSnapshot(spark, s"$work/snap_bkt", buckets).get
      val plain =
        ComposedPipeline.latestSnapshot(spark, s"$work/snap_plain").get
      val parity = served.count() == plain.count() &&
        served.exceptAll(plain).isEmpty && plain.exceptAll(served).isEmpty
      // benefit side: consumer reads over the served table. The count
      // that matters is exchanges BELOW the join (a consumer's own
      // post-join rollup shuffles on its own key — that's its cost,
      // not the layout's).
      import org.apache.spark.sql.execution.SparkPlan
      def kids(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      def collectAll[T](p: SparkPlan)(
          f: PartialFunction[SparkPlan, T]): Seq[T] =
        (if (f.isDefinedAt(p)) Seq(f(p)) else Nil) ++
          kids(p).flatMap(collectAll(_)(f))
      def exchangesUnderJoin(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        val join = collectAll(df.queryExecution.executedPlan) {
          case j: org.apache.spark.sql.execution.joins
            .SortMergeJoinExec => (j: SparkPlan)
          case j: org.apache.spark.sql.execution.joins
            .ShuffledHashJoinExec => (j: SparkPlan)
        }.headOption
        join.map(j => collectAll(j) {
          case e: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => e
        }.size).getOrElse(-1) // -1: no shuffle-family join found
      }
      def exchangesTotal(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        collectAll(df.queryExecution.executedPlan) {
          case e: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => e
        }.size
      }
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val dimDir = s"$work/dim"
        graft.engine.Bucketed.publishGeneration(spark,
          ev.groupBy(col("user_id"))
            .agg(countDistinct(col("event_type")).as("n_types")),
          dimDir, "user_id", buckets)
        val dim = graft.engine.Bucketed.attachGeneration(spark, dimDir,
          spark.read.parquet(dimDir).schema, "user_id", buckets)
        val tJ = System.nanoTime()
        val joinEx = exchangesUnderJoin(served.join(dim, "user_id")
          .groupBy(col("n_types")).agg(count(lit(1)).as("n")))
        val wallJoin = (System.nanoTime() - tJ) / 1e9
        val tA = System.nanoTime()
        val aggEx = exchangesTotal(served.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n")))
        val wallAgg = (System.nanoTime() - tA) / 1e9
        println(f"[streamserve] COMPOSED-SERVE: wallPlain=$wallPlain%.1f s " +
          f"wallBucketed=$wallBkt%.1f s overhead=${wallBkt / wallPlain}%.2fx " +
          s"gens=${sb.generations} parity=$parity " +
          s"peakStateRows=${sb.peakStateRows} " +
          s"lagDrained=${sb.processedLag == 0L && sp.processedLag == 0L} " +
          f"serveJoin=$wallJoin%.2f s (exchangesUnderJoin=$joinEx, want 0) " +
          f"serveAgg=$wallAgg%.2f s (exchanges=$aggEx, want 0)")
      } finally spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    } finally {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_bktgen_"))
        .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(work))
      spark.stop()
    }
  }

  /** LIVE-TAIL variant of [[runComposed]] (r16 — VERDICT r15 next #7):
    * the r15 replay ran over a PRE-WRITTEN feed log; production has
    * appends racing the stream. Here ~60% of the sf events land
    * upfront and a writer thread appends the remaining 40% in
    * time-ordered segments WHILE the pipeline tails (admission control
    * active throughout), with the crash injected at the SECOND point —
    * after a batch's state-store partitions committed, before its
    * generation published — so the restart proves the state ROLLBACK
    * re-emits identical rows (no skip marker exists for that batch).
    * Exactly-once is judged the same way: bit-parity with a clean run
    * over the same final feed + zero duplicate (user, session) keys. */
  private def runComposedTail(sfDir: String, chunks: Int): Unit = {
    import graft.streaming.ComposedPipeline
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"), "graft-streamtail")
    val ev = graft.engine.Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // ts is a TIMESTAMP column — quantile on its epoch-seconds view
    val cut = ev.selectExpr(
      "CAST(percentile_approx(CAST(ts AS double), 0.6, 1000) AS timestamp) AS c")
      .head().getTimestamp(0)
    val work = java.nio.file.Files
      .createTempDirectory("graft_streamtail_").toString
    val feedDir = s"$work/feed"
    val parts = 4
    val head = ComposedPipeline.replayToFeed(
      ev.where(col("ts") <= lit(cut)), feedDir, parts)
    val cap = math.max(2500L, nEvents / (parts.toLong * chunks))
    println(s"[streamtail] events=$nEvents users=$nUsers head=$head " +
      s"tail=${nEvents - head} parts=$parts maxBatchRecords=$cap sf=$sfDir")
    // the tail writer: segments small enough that appends interleave
    // with many micro-batches (the race this mode exists to exercise)
    val writing = new java.util.concurrent.atomic.AtomicBoolean(true)
    def startWriter(): Thread = {
      val t = new Thread(() => {
        try {
          val n = ComposedPipeline.replayToFeed(
            ev.where(col("ts") > lit(cut)), feedDir, parts,
            segSize = math.max(1000, ((nEvents - head) / 40).toInt))
          println(s"[streamtail] writer appended $n records live")
        } finally writing.set(false)
      })
      t.setDaemon(true); t.start(); t
    }
    val crashAt = chunks / 2
    val t0 = System.nanoTime()
    val writer = startWriter()
    val s1 =
      try ComposedPipeline.run(spark, feedDir, s"$work/snap_crash",
        s"$work/ckpt_crash", cap,
        crashBeforeApply = Some(crashAt.toLong),
        tailWhile = Some(() => writing.get()))
      finally writer.join()
    println(s"[streamtail] crash-leg: batches=${s1.batches} " +
      s"crashed=${s1.crashed} gens=${s1.generations} " +
      s"peakStateRows=${s1.peakStateRows}")
    require(s1.crashed, "injected pre-apply crash did not fire — raise chunks")
    require(!ComposedPipeline.generationIds(spark, s"$work/snap_crash")
      .contains(crashAt.toLong),
      s"batch $crashAt must not have published before the pre-apply crash")
    val s2 = ComposedPipeline.run(spark, feedDir, s"$work/snap_crash",
      s"$work/ckpt_crash", cap)
    val wallCrash = (System.nanoTime() - t0) / 1e9
    println(s"[streamtail] restart-leg: batches=${s2.batches} " +
      s"gens=${s2.generations} skippedReapplies=${s2.skippedReapplies} " +
      s"peakStateRows=${s2.peakStateRows} processedLag=${s2.processedLag}")
    // clean leg over the SAME final feed
    val t1 = System.nanoTime()
    val sc = ComposedPipeline.run(spark, feedDir, s"$work/snap_clean",
      s"$work/ckpt_clean", cap)
    val wallClean = (System.nanoTime() - t1) / 1e9
    val crashFinal = ComposedPipeline
      .latestSnapshot(spark, s"$work/snap_crash").get
    val cleanFinal = ComposedPipeline
      .latestSnapshot(spark, s"$work/snap_clean").get
    val crashRows = crashFinal.count()
    val parity = crashRows == cleanFinal.count() &&
      crashFinal.exceptAll(cleanFinal).isEmpty &&
      cleanFinal.exceptAll(crashFinal).isEmpty
    val dupKeys = crashFinal.groupBy("user_id", "session_seq").count()
      .where(col("count") > 1).count()
    println(f"[streamtail] COMPOSED-TAIL: wallCrashPath=$wallCrash%.1f s " +
      f"(incl. restart) wallClean=$wallClean%.1f s " +
      s"sessions=$crashRows dupKeys=$dupKeys " +
      s"parityWithCleanRun=$parity " +
      s"stateFlat=${s2.peakStateRows <= nUsers * 2} " +
      s"lagDrained=${s2.processedLag == 0L && sc.processedLag == 0L} " +
      s"exactlyOnce=${parity && dupKeys == 0}")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(work))
    spark.stop()
  }
}
