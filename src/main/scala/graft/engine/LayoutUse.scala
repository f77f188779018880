package graft.engine

import org.apache.spark.sql.SparkSession

/** Shared use-tracking + retention for publish-once layout roots
  * ([[Bucketed]], [[Partitioned]]).
  *
  * The r13 review found the footgun this closes: expire() grouped
  * layouts by logical NAME only and kept the `keep` most recently
  * modified — but the identity docstrings guarantee that different
  * scale factors / keys / bucket counts of the same table name coexist
  * as independently ACTIVE layouts, so maintenance with the default
  * keep=1 deleted all but one and alternating sf0.1/sf1 sessions (or
  * two keys) thrashed full rebuilds.
  *
  * Fix: every attach TOUCHES a hidden `_graft_last_used` marker inside
  * the layout dir (underscore-prefixed → invisible to Spark's file
  * listing), so "most recently used" is observable rather than proxied
  * by publish mtime; and expire deletes a beyond-keep layout only when
  * it has been IDLE for a grace period (default 7 days) — an abandoned
  * layout's marker stops advancing the moment its source changes, while
  * a second active identity keeps renewing its own. Layouts published
  * before the marker existed grandfather to the dir's mtime. All
  * layouts here are re-derivable caches, so the worst case of any
  * clock lie is a rebuild, never data loss. */
private[graft] object LayoutUse {
  val LastUsedFile = "_graft_last_used"

  /** Record a use of the layout at `path` (create-overwrite of the
    * hidden marker — one cheap FS op per attach). Never throws: a
    * read-only root degrades to publish-mtime retention, not failure. */
  def touch(s: SparkSession, path: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(path, LastUsedFile)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.create(p, true).close()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Last observed use: the marker's mtime, else the dir's (legacy). */
  def lastUsed(
      fs: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Long = {
    val m = new org.apache.hadoop.fs.Path(st.getPath, LastUsedFile)
    if (fs.exists(m)) fs.getFileStatus(m).getModificationTime
    else st.getModificationTime
  }

  /** Retention sweep over one layout root: per logical name (extracted
    * by `nameOf`), retain the `keep` most recently USED layouts
    * unconditionally, and delete the rest only once idle ≥ `minIdleMs`.
    * @return deleted directory names */
  def expireRoot(
      s: SparkSession, root: String,
      nameOf: String => Option[String],
      keep: Int, minIdleMs: Long,
      onDelete: String => Unit): Seq[String] = {
    require(keep >= 1, "retention must keep at least one layout")
    require(minIdleMs >= 0, s"negative idle grace: $minIdleMs")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return Nil
    val now = System.currentTimeMillis()
    fs.listStatus(rootP).toSeq
      .filter(st => st.isDirectory &&
        !st.getPath.getName.contains(".__staging__"))
      .flatMap(st => nameOf(st.getPath.getName).map(_ -> st))
      .groupBy(_._1)
      .toSeq.flatMap { case (_, named) =>
        named.map(_._2).sortBy(st => -lastUsed(fs, st)).drop(keep)
      }
      .filter(st => now - lastUsed(fs, st) >= minIdleMs)
      .flatMap { st =>
        onDelete(st.getPath.getName)
        // ATTACH-WINS re-check (r15): between the sweep's listing and
        // this delete, an attach may have touched the marker — the
        // classic TOCTOU window. Re-read the marker's mtime now and
        // stand down if it advanced past the sweep's idle horizon.
        // Deliberately AFTER onDelete: onDelete only drops catalog
        // entries, which the next attach re-creates over the intact
        // files (metadata-only heal), whereas a delete under a live
        // attach destroys data a reader holds a listing of. The
        // residual window between this getFileStatus and the delete
        // syscall is why in-flight readers ALSO get the loud-failure
        // guarantee (session default ignoreMissingFiles=false — a
        // vanished file fails the scan, never silently returns
        // empty; LayoutExpirySpec pins both halves).
        val freshStatus =
          try Some(fs.getFileStatus(st.getPath))
          catch { case _: java.io.FileNotFoundException => None }
        freshStatus match {
          // Dir already gone: some other actor removed it between the
          // listing and the re-check — nothing for THIS sweep to
          // delete, so don't claim it in the returned deleted-list
          // (ADVICE r15: forall made a vanished dir read as "deleted
          // by us" even though fs.delete would have been a no-op).
          case None => None
          case Some(fresh)
            if System.currentTimeMillis() - lastUsed(fs, fresh) < minIdleMs =>
            None // attach won the race — stand down
          case Some(_) =>
            fs.delete(st.getPath, true)
            Some(st.getPath.getName)
        }
      }
  }
}
