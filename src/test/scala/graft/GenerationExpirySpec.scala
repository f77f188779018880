package graft

import graft.engine.{LayoutUse, Snapshot, Tables}

/** Snapshot-generation retention under CONCURRENT TIME TRAVEL (r16 —
  * VERDICT r15 missing #4): the LayoutUse race discipline, ported to
  * the older component. Same shape as LayoutExpirySpec, for generation
  * roots:
  *
  *  1. attach-wins: a generation whose use marker is touched between
  *     the sweep's listing and the delete makes the delete STAND DOWN
  *     (the TOCTOU re-check in Snapshot.expireGenerations);
  *  2. grace: a reader's attach within `minIdleMs` of the sweep keeps
  *     the generation outright — an in-flight `readAsOf` is never
  *     raced by a graced sweep;
  *  3. loud-error: a graceless count-based sweep MAY reclaim a
  *     generation a reader already resolved (that is retention's
  *     documented contract — time travel is bounded by retention),
  *     but the reader then FAILS, never silently returns empty
  *     (session default `ignoreMissingFiles=false`).
  */
class GenerationExpirySpec extends SparkSpec {

  private val dayMs = 24L * 3600 * 1000

  private def ageDir(d: java.io.File, ageMs: Long): Unit = {
    val old = System.currentTimeMillis() - ageMs
    assert(d.setLastModified(old))
    val marker = new java.io.File(d, LayoutUse.LastUsedFile)
    if (marker.exists()) assert(marker.setLastModified(old))
  }

  test("attach racing the sweep wins: a marker touched after the " +
      "listing makes the generation delete stand down") {
    val root = java.nio.file.Files.createTempDirectory("graft_genrace_")
      .toString
    val names = Seq("2024_01_01_000000", "2024_02_01_000000",
      "2024_03_01_000000").map("db_" + _)
    names.foreach(n => Snapshot.write(Tables.region(spark, sf), s"$root/$n"))
    names.take(2).foreach(n => ageDir(new java.io.File(root, n), 30 * dayMs))
    // the racing attach: touch from the sweep's own onExpire hook —
    // AFTER the listing ranked the generation as expirable, BEFORE the
    // attach-wins re-check (the exact TOCTOU interleaving)
    val deleted = Snapshot.expireGenerations(spark, root, keep = 1,
      minIdleMs = dayMs,
      onExpire = n => LayoutUse.touch(spark, s"$root/$n"))
    assert(deleted.isEmpty,
      s"delete must stand down for just-touched generations: $deleted")
    names.foreach(n => assert(new java.io.File(root, n).exists(),
      s"raced generation $n must survive"))
    // same sweep with the markers forced idle again reclaims them —
    // proving the stand-down above was the touch, not ranking luck
    names.take(2).foreach(n => ageDir(new java.io.File(root, n), 30 * dayMs))
    val deleted2 = Snapshot.expireGenerations(spark, root, keep = 1,
      minIdleMs = dayMs)
    assert(deleted2 == names.take(2))
    // a candidate that vanished before the re-check (another actor's
    // delete) is NOT claimed in this sweep's deleted-list
    Snapshot.write(Tables.region(spark, sf), s"$root/db_2023_01_01_000000")
    ageDir(new java.io.File(root, "db_2023_01_01_000000"), 30 * dayMs)
    val deleted3 = Snapshot.expireGenerations(spark, root, keep = 1,
      minIdleMs = dayMs,
      onExpire = n => Snapshot.delete(spark, s"$root/$n"))
    assert(deleted3.isEmpty,
      "a generation removed by another actor mid-sweep must not be " +
        s"reported as this sweep's delete: $deleted3")
    Snapshot.delete(spark, root)
  }

  test("in-flight readAsOf: the attach defeats a graced sweep; a " +
      "graceless reclaim fails the reader loudly, never silently empty") {
    assert(spark.conf.get("spark.sql.files.ignoreMissingFiles",
      "false") == "false",
      "ignoreMissingFiles must stay false: flipping it converts an " +
        "expiry race into silently wrong (empty) results")
    val root = java.nio.file.Files.createTempDirectory("graft_genread_")
      .toString
    val at = Seq("2024-01-10T00:00:00Z", "2024-02-10T00:00:00Z")
      .map(java.time.Instant.parse)
    at.foreach(t => Snapshot.write(Tables.nation(spark, sf),
      s"$root/${Snapshot.snapshotName("db", t)}"))
    val oldGen = new java.io.File(root, Snapshot.snapshotName("db", at.head))
    ageDir(oldGen, 30 * dayMs)
    // in-flight time travel: resolves + ATTACHES the old generation
    val reader = Snapshot.readAsOf(spark, root, "db",
      java.time.Instant.parse("2024-01-15T00:00:00Z"))
    // a graced sweep honors the attach readAsOf just made
    assert(Snapshot.expireGenerations(spark, root, keep = 1,
      minIdleMs = dayMs).isEmpty,
      "the readAsOf attach must keep the generation under a graced sweep")
    assert(reader.count() == 25)
    // graceless count-based retention is allowed to win by contract…
    ageDir(oldGen, 30 * dayMs)
    assert(Snapshot.expireGenerations(spark, root, keep = 1)
      == Seq(oldGen.getName))
    // …but the in-flight reader must then fail LOUDLY on next use
    val e = intercept[Exception] {
      val n = spark.read.parquet(oldGen.toString).count()
      assert(n != 0L,
        "expired generation returned silently EMPTY instead of failing")
    }
    assert(e != null)
    // the surviving generation still answers time travel at its cutoff
    assert(Snapshot.readAsOf(spark, root, "db",
      java.time.Instant.parse("2025-01-01T00:00:00Z")).count() == 25)
    Snapshot.delete(spark, root)
  }
}
