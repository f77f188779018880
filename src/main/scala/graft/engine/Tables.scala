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
    * the session so a stopped session's plans are never reused. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      key => spark.read.parquet(key._2))

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
    * empirically). Oracle SQL must always wrap ts in CAST(ts AS TIMESTAMP). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
