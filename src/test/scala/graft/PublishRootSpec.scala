package graft

import java.time.Instant

import org.apache.spark.sql.functions._

/** Non-default publish roots (VERDICT r16 missing #2): every layout /
  * snapshot / ANN-index root defaults to `java.io.tmpdir` for the
  * demo queries, and every existing spec that overrides a root still
  * points it at a createTempDirectory — i.e. the same tmpdir, same
  * implicit FS, no scheme. On a cluster these roots are object-store
  * URIs; the engine's claim is that the Hadoop-FS path discipline
  * makes that a pure configuration change. This spec holds the claim
  * to a concrete test: a conf-supplied root OUTSIDE tmpdir, addressed
  * through an EXPLICIT `file:` scheme URI (so resolution goes through
  * Hadoop's scheme → FileSystem lookup, the same seam an `s3a://` or
  * `hdfs://` root uses, not the schemeless local default), driving
  * the full lifecycle of each publish family:
  *
  *  - snapshot generations: publishAtomic → readAsOf → expire
  *  - bucketed join layout: publish-once → reuse → catalog attach
  *  - partitioned layout + artifact: publish-once → reread
  *  - ANN model artifacts: train+publish → load-don't-retrain
  *
  * A regression where any path in these families falls back to
  * driver-local tmpdir or schemeless resolution (the cross-host
  * failure class SCALE.md names) breaks this spec.
  */
class PublishRootSpec extends SparkSpec {

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withRoot(test: String => Unit): Unit = {
    // outside java.io.tmpdir, scheme-qualified
    val local = java.nio.file.Paths.get(
      "target", s"publish_root_${java.util.UUID.randomUUID().toString.take(8)}")
      .toAbsolutePath
    val root = "file:" + local.toString
    assert(!root.contains(sys.props("java.io.tmpdir").stripSuffix("/")))
    try test(root)
    finally org.apache.commons.io.FileUtils.deleteDirectory(local.toFile)
  }

  test("snapshot generations live a full lifecycle under a file:-scheme " +
      "non-tmpdir root: publish, time-travel, expire") {
    withRoot { root =>
      val snaps = s"$root/snaps"
      val g1 = graft.engine.Snapshot.snapshotName(
        "db", Instant.parse("2024-03-01T00:00:00Z"))
      val g2 = graft.engine.Snapshot.snapshotName(
        "db", Instant.parse("2024-03-02T00:00:00Z"))
      val df1 = spark.range(0, 100).withColumn("gen", lit(1))
      val df2 = spark.range(0, 120).withColumn("gen", lit(2))
      graft.engine.Snapshot.publishAtomic(spark, df1, s"$snaps/$g1")
      graft.engine.Snapshot.publishAtomic(spark, df2, s"$snaps/$g2")
      // time travel resolves through the scheme-qualified root
      val asOf = graft.engine.Snapshot.readAsOf(spark, snaps, "db",
        Instant.parse("2024-03-01T12:00:00Z"))
      assert(asOf.count() == 100
        && asOf.select(max("gen")).head().getInt(0) == 1)
      val latest = graft.engine.Snapshot.readAsOf(spark, snaps, "db",
        Instant.parse("2024-03-03T00:00:00Z"))
      assert(latest.count() == 120)
      // manifest landed inside the generation on the target FS
      assert(graft.engine.Snapshot.readManifest(spark, s"$snaps/$g2")
        .exists(_.rowCount == 120L))
      // retention deletes the old generation on the target FS
      // (readAsOf attached recently, so expiry must be told grace=0)
      val expired = graft.engine.Snapshot.expireGenerations(
        spark, snaps, keep = 1, dbName = Some("db"))
      assert(expired == Seq(g1), s"expected to expire $g1, got $expired")
      assert(!fsOf(snaps).exists(new org.apache.hadoop.fs.Path(s"$snaps/$g1")))
      assert(fsOf(snaps).exists(new org.apache.hadoop.fs.Path(s"$snaps/$g2")))
    }
  }

  test("bucketed layout publishes once and reuses under a file:-scheme " +
      "non-tmpdir root") {
    withRoot { root =>
      spark.conf.set(graft.engine.Bucketed.DirConf, s"$root/buckets")
      try {
        def orders = graft.engine.Tables.orders(spark, sf)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val n = orders.count()
        val t1 = graft.engine.Bucketed.table(
          spark, sf, "pubroot_orders", orders, "o_custkey")
        assert(t1.count() == n)
        // the layout landed under the conf root, not tmpdir
        val dirs = fsOf(root).listStatus(
          new org.apache.hadoop.fs.Path(s"$root/buckets"))
          .map(_.getPath.getName).toSeq
        assert(dirs.exists(_.startsWith("graft_bkt_pubroot_orders_")),
          s"bucketed layout not under conf root: $dirs")
        // publish-once: second attach serves the same files
        val before = fsOf(root).getContentSummary(
          new org.apache.hadoop.fs.Path(s"$root/buckets")).getFileCount
        val t2 = graft.engine.Bucketed.table(
          spark, sf, "pubroot_orders", orders, "o_custkey")
        assert(t2.count() == n)
        val after = fsOf(root).getContentSummary(
          new org.apache.hadoop.fs.Path(s"$root/buckets")).getFileCount
        assert(before == after, "second attach must not rewrite the layout")
      } finally {
        spark.catalog.listTables().collect()
          .filter(_.name.startsWith("graft_bkt_pubroot_"))
          .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
        spark.conf.unset(graft.engine.Bucketed.DirConf)
      }
    }
  }

  test("partitioned layout + artifact publish and reread under a " +
      "file:-scheme non-tmpdir root") {
    withRoot { root =>
      spark.conf.set(graft.engine.Partitioned.DirConf, s"$root/parts")
      try {
        def ev = graft.engine.Tables.events(spark, sf)
          .select(col("event_id"), col("user_id"), col("event_type"))
        val n = ev.count()
        val t = graft.engine.Partitioned.table(
          spark, sf, "pubroot_events", ev, "event_type")
        assert(t.count() == n)
        val art = graft.engine.Partitioned.artifact(
          spark, sf, "pubroot_rollup",
          ev.groupBy("event_type").agg(count(lit(1)).as("n")))
        val roll = art.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val dirs = fsOf(root).listStatus(
          new org.apache.hadoop.fs.Path(s"$root/parts"))
          .map(_.getPath.getName).toSeq
        assert(dirs.exists(_.startsWith("graft_prt_pubroot_events_")))
        assert(dirs.exists(_.startsWith("graft_art_pubroot_rollup_")))
        assert(roll.values.sum == n)
      } finally spark.conf.unset(graft.engine.Partitioned.DirConf)
    }
  }

  test("ANN model artifacts publish + load-don't-retrain under a " +
      "file:-scheme non-tmpdir root") {
    withRoot { root =>
      spark.conf.set(graft.queries.AnnOps.IndexDirConf, s"$root/ann")
      try {
        val first = q("q_sim_ivf_topk").collect().toSeq
        val emb = graft.engine.Tables.embeddings(spark, sf)
        val dest = graft.queries.AnnOps.modelDest(
          spark, emb, s"$root/ann", "ivf_centroids")
        assert(fsOf(root).exists(new org.apache.hadoop.fs.Path(
          s"$dest/_graft_manifest.json")),
          "centroid generation must publish under the scheme-qualified root")
        // second run loads the artifact (identical rows, no retrain drift)
        assert(q("q_sim_ivf_topk").collect().toSeq == first)
      } finally spark.conf.unset(graft.queries.AnnOps.IndexDirConf)
    }
  }
}
