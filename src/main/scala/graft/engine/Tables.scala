package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers for the fixture star schema (FIXTURES.md).
  *
  * The reference treats its source as an opaque whole-database snapshot
  * (`pg_dump -Fc`, backup.sh:210); here each table is a columnar Parquet
  * scan so Catalyst can push filters/projections into the file source.
  * At 100 TB these reads become partitioned-parquet (or JDBC with
  * partitionColumn/numPartitions for the snapshot-extract job).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation cache — the catalog role a metastore plays in a
    * real deployment: listing files and reading footers once per
    * (session, path), not once per query. Sound because fixture inputs
    * are immutable for a session's lifetime (specs that synthesize
    * inputs write to fresh temp dirs); a mutable-source deployment
    * would invalidate on write, exactly as a metastore does. Keyed on
    * the session so a stopped session's plans are never reused; entries
    * of stopped sessions are swept on every lookup (the cache would
    * otherwise retain dead sessions and their analyzed plans for the
    * JVM's life — r5 advice), and [[invalidate]] is the writer hook for
    * the in-session-overwrite case. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    cache.keySet.removeIf(_._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      key => spark.read.parquet(key._2))
  }

  /** Drop any cached relation for `path` (every session). A writer that
    * overwrites a previously-read path in-session must call this, or the
    * cached plan would serve the stale file listing. */
  def invalidate(path: String): Unit =
    cache.keySet.removeIf(_._2 == path)

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a raw long and truncate to µs (integer
    * `div 1000` == DuckDB's `CAST(ts AS TIMESTAMP)` truncation, verified
    * empirically — both truncate toward zero for the fixture's
    * post-epoch data; pre-1970 nanos would diverge, pinned in
    * EngineSpec). Oracle SQL must always wrap ts in
    * CAST(ts AS TIMESTAMP).
    *
    * The nanos flag is session-scoped and must be set at session
    * CONSTRUCTION ([[graft.Sessions.local]]) — a reader that flips a
    * session-global mid-query changes the behavior of every other
    * parquet read in the session (the r5 bench warm-up crash). The
    * read-only check below fails loudly instead of mutating. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(
      s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (use graft.Sessions.local)")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
