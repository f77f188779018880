package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture generator for scale points the driver doesn't
  * ship (TESTDATA.md stops at sf0.1). Reproduces the driver fixture's
  * schemas, key ranges, category sets, and correlations (profiled from
  * sf0.1) so every declared query runs unchanged; values are
  * hash-derived (xxhash64 with a folded seed), so output is identical
  * regardless of partitioning or executor count — the same property the
  * declared sampling queries rely on.
  *
  * `runMain graft.GenData <outDir> [scale]` — scale 1.0 means TPC-H-ish
  * sf1: 6M lineitem / 1.5M orders / 1M events / 50k documents / 20k
  * embeddings.
  *
  * Two deliberate physical differences from the driver fixture, neither
  * visible to the engine:
  *  - `events.ts` is written as a raw LONG of epoch-nanos. The driver
  *    writes parquet TIMESTAMP(NANOS), which Spark cannot author; under
  *    the session's `nanosAsLong=true` both surface as LongType, so
  *    `Tables.events` takes the identical code path.
  *  - tables are directories of parquet parts named `<t>.parquet`, not
  *    single files — the same path `Tables` already reads.
  */
object GenData {
  private val Seed = 42L

  /** Deterministic uniform in [0, 1) from (id-column, stream index). */
  private def u(idCol: Column, k: Int): Column =
    pmod(xxhash64(idCol, lit(Seed), lit(k)), lit(1000000L)) / 1000000.0

  /** Deterministic long in [0, n) from (id-column, stream index). */
  private def h(idCol: Column, k: Int, n: Long): Column =
    pmod(xxhash64(idCol, lit(Seed), lit(k)), lit(n))

  private def pick(idCol: Column, k: Int, values: Seq[String]): Column =
    element_at(array(values.map(lit): _*),
      (h(idCol, k, values.size.toLong) + 1).cast("int"))

  private val Segments =
    Seq("MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val PTypes =
    Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val PAdjs = Seq("large", "hot", "blue", "old", "cold", "small",
    "dark", "light", "new", "red")
  private val PNouns = Seq("ring", "bolt", "plate", "screw", "wheel",
    "cap", "rod", "pin", "gear", "tube")
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val Langs = Seq("en", "en", "de", "zh", "fr", "es") // en-weighted
  private val Vocab = Seq("spark", "query", "table", "hash", "line",
    "column", "order", "batch", "sort", "fast", "slow", "scan", "value",
    "filter", "customer", "stream", "group", "key", "vector", "agg",
    "part", "small", "a", "b", "has", "join", "plan", "merge", "read",
    "write", "row", "page", "cache", "disk", "node", "task", "stage",
    "shuffle", "index", "range")

  private def range(s: SparkSession, n: Long, idName: String): DataFrame =
    s.range(n).withColumnRenamed("id", idName)

  def region(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name")
  }

  def nation(s: SparkSession): DataFrame =
    range(s, 25, "k").select(
      col("k").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("k")).as("n_name"),
      (col("k") % 5).cast("int").as("n_regionkey"))

  def customer(s: SparkSession, n: Long): DataFrame =
    range(s, n, "c_custkey").select(
      col("c_custkey"),
      format_string("Customer#%09d", col("c_custkey")).as("c_name"),
      h(col("c_custkey"), 1, 25).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u(col("c_custkey"), 2) * 11000.0, 2)
        .as("c_acctbal"),
      pick(col("c_custkey"), 3, Segments).as("c_mktsegment"))

  def supplier(s: SparkSession, n: Long): DataFrame =
    range(s, n, "s_suppkey").select(
      col("s_suppkey"),
      format_string("Supplier#%09d", col("s_suppkey")).as("s_name"),
      h(col("s_suppkey"), 4, 25).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u(col("s_suppkey"), 5) * 11000.0, 2)
        .as("s_acctbal"))

  def part(s: SparkSession, n: Long): DataFrame =
    range(s, n, "p_partkey").select(
      col("p_partkey"),
      concat(pick(col("p_partkey"), 6, PAdjs), lit(" "),
        pick(col("p_partkey"), 7, PNouns)).as("p_name"),
      concat(lit("Brand#"), h(col("p_partkey"), 8, 25)).as("p_brand"),
      pick(col("p_partkey"), 9, PTypes).as("p_type"),
      (h(col("p_partkey"), 10, 50) + 1).cast("int").as("p_size"),
      round(lit(900.0) + col("p_partkey") * 0.1, 2).as("p_retailprice"))

  /** 1995-01-01..2001-07-31 order dates (the sf0.1 window). */
  def orders(s: SparkSession, n: Long, nCust: Long): DataFrame =
    range(s, n, "o_orderkey").select(
      col("o_orderkey"),
      h(col("o_orderkey"), 11, nCust).as("o_custkey"),
      when(u(col("o_orderkey"), 12) < 0.48, "F")
        .when(u(col("o_orderkey"), 12) < 0.96, "O").otherwise("P")
        .as("o_orderstatus"),
      round(lit(1000.0) + u(col("o_orderkey"), 13) * 104000.0, 2)
        .as("o_totalprice"),
      timestamp_seconds(lit(788918400L) + // 1995-01-01T00:00:00Z
        h(col("o_orderkey"), 14, 2403) * 86400L).as("o_orderdate"),
      pick(col("o_orderkey"), 15, Priorities).as("o_orderpriority"))

  /** 1..7 lines per order (mean ~4, matching sf0.1's 4.08); shipdate =
    * orderdate + 1..120 days; returnflag/linestatus hash-uniform and
    * INDEPENDENT of shipdate — the driver fixture populates all six
    * flag×status combos (~1/6 each) with identical date ranges (sf0.01
    * profile: 9.9-10.0k rows per combo, same min/max shipdate), unlike
    * TPC-H's cutoff-correlated split. r6 caught the earlier
    * cutoff-correlated form: q_agg_hash_group returned 2 groups at the
    * GenData scale points vs 6 at every driver point. */
  def lineitem(s: SparkSession, orders: DataFrame,
      nPart: Long, nSupp: Long): DataFrame = {
    val o = orders.select(col("o_orderkey").as("l_orderkey"),
      col("o_orderdate"))
    val id = xxhash64(col("l_orderkey"), col("l_linenumber"), lit(Seed))
    o.withColumn("l_linenumber",
        explode(sequence(lit(1),
          (h(col("l_orderkey"), 16, 7) + 1).cast("int"))))
      .withColumn("ship_s",
        unix_timestamp(col("o_orderdate")) +
          (pmod(id, lit(120L)) + 1) * 86400L)
      .select(
        col("l_orderkey"),
        pmod(xxhash64(id, lit(17)), lit(nPart)).as("l_partkey"),
        pmod(xxhash64(id, lit(18)), lit(nSupp)).as("l_suppkey"),
        col("l_linenumber"),
        (pmod(xxhash64(id, lit(19)), lit(50)) + 1).cast("double")
          .as("l_quantity"),
        round(lit(900.0) +
          pmod(xxhash64(id, lit(20)), lit(1000000L)) / 1000000.0 * 104100.0,
          2).as("l_extendedprice"),
        (pmod(xxhash64(id, lit(21)), lit(11)) / lit(100.0)).as("l_discount"),
        (pmod(xxhash64(id, lit(22)), lit(9)) / lit(100.0)).as("l_tax"),
        element_at(array(lit("A"), lit("N"), lit("R")),
          (pmod(xxhash64(id, lit(23)), lit(3)) + 1).cast("int"))
          .as("l_returnflag"),
        when(pmod(xxhash64(id, lit(31)), lit(2)) === 0, "F").otherwise("O")
          .as("l_linestatus"),
        timestamp_seconds(col("ship_s")).as("l_shipdate"))
  }

  /** 30 days of events from 2024-01-01, epoch-NANOS as LONG (see class
    * doc); ~1% zero values like the driver fixture. */
  def events(s: SparkSession, n: Long, nUser: Long): DataFrame =
    range(s, n, "event_id").select(
      col("event_id"),
      (lit(1704067200L) + h(col("event_id"), 24, 30L * 86400)).cast("long")
        .*(lit(1000000000L)).+(h(col("event_id"), 25, 1000000000L))
        .as("ts"),
      h(col("event_id"), 26, nUser).as("user_id"),
      pick(col("event_id"), 27, EventTypes).as("event_type"),
      when(u(col("event_id"), 28) < 0.01, 0.0)
        .otherwise(round(u(col("event_id"), 29) * 560.0, 2)).as("value"),
      concat(lit("{\"k\": "), h(col("event_id"), 30, 100), lit("}"))
        .as("props"))

  /** Bag-of-words docs over a 40-word vocab, 8..107 words (mean ~297
    * chars like sf0.1); ~2% near-duplicates (an earlier doc + one
    * appended word) and ~0.2% exact duplicates, so the dedup family has
    * real positives at every scale. n_chars == length(text) invariant
    * preserved. */
  def documents(s: SparkSession, n: Long): DataFrame = {
    val isNear = h(col("doc_id"), 31, 50) === 0
    val isExact = h(col("doc_id"), 32, 500) === 0
    val baseId = when(isNear || isExact,
      greatest(col("doc_id") - (h(col("doc_id"), 33, 20) + 1), lit(0L)))
      .otherwise(col("doc_id"))
    val nWords = (h(baseId, 34, 100) + 8).cast("int")
    val words = transform(sequence(lit(1), nWords),
      i => element_at(array(Vocab.map(lit): _*),
        pmod(xxhash64(baseId, i, lit(Seed), lit(35)),
          lit(Vocab.size.toLong)).cast("int") + 1))
    val baseText = concat_ws(" ", words)
    val text = when(isExact, baseText)
      .when(isNear, concat(baseText, lit(" "), pick(col("doc_id"), 36, Vocab)))
      .otherwise(baseText)
    range(s, n, "doc_id").select(
      col("doc_id"),
      text.as("text"),
      pick(baseId, 37, Langs).as("lang"),
      concat(lit("src"), h(col("doc_id"), 38, 20)).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** 64-dim float vectors, uniform in [-1, 1) per dim, label INDEPENDENT
    * of geometry — profiled from the driver fixture: within-label pairs
    * are near-orthogonal (p10/p50/p90 cosine = -0.16/0.00/0.17, 0.2% ≥
    * 0.35), i.e. labels are metadata over random vectors, NOT clusters.
    * The first version of this generator made labels 0.99-cosine
    * clusters and q_dedup_embedding's within-label pair set exploded
    * quadratically at sf1 (45 s vs the driver-faithful ~1 s) — the
    * near-dup density of the fixture is load-bearing for every dedup
    * benchmark number, so it must match the reference fixture, not a
    * convenient cluster model. */
  def embeddings(s: SparkSession, n: Long): DataFrame = {
    val label = h(col("vec_id"), 39, 10).cast("int")
    val dims = sequence(lit(0), lit(63))
    val vec = transform(dims, j =>
      (pmod(xxhash64(col("vec_id"), j, lit(Seed), lit(41)), lit(2000L))
        / 1000.0 - 1.0).cast("float"))
    range(s, n, "vec_id")
      .withColumn("label", label)
      .select(col("vec_id"), vec.as("embedding"), col("label"))
  }

  /** Write one table as a directory of `files` parquet parts named
    * `<name>.parquet` (the path shape Tables already reads). */
  private def write(df: DataFrame, dir: String, name: String,
      files: Int): Unit =
    df.repartition(files).write.mode("overwrite")
      .parquet(s"$dir/$name.parquet")

  /** File count for a scaled table: the base count at sf≤1, grown
    * with `scale` above it (halved so sf5 lands at ~2.5× base, capped
    * at 256). Scaling the LAYOUT with the data matters as much as
    * scaling the rows: a real 100 TB table is tens of thousands of
    * objects, never 8 — and parquet parallelism is row-group-gated,
    * so a fixed-8-file fixture written with default 128 MB row groups
    * caps every scan of that table at 8 concurrent tasks no matter
    * the cluster. The r18 sf20 forensics measured exactly that: 8
    * RUNNABLE workers, 25 parked, on a 32-thread box (SCALE.md "the
    * fixture's 8 files"), i.e. the old fixed counts silently
    * benchmarked a 4×-starved engine at the top of the ladder. The
    * sf≤1 base is kept so historical sf0.1/sf1 records stay drawn on
    * the layout they always used. */
  private def scaledFiles(base: Int, scale: Double): Int =
    math.min(256, math.max(base, math.ceil(base * scale / 2.0).toInt))

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("testdata-sf1")
    val scale = if (args.length > 1) args(1).toDouble else 1.0
    def n(atSf1: Long): Long = math.max(1L, (atSf1 * scale).toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-gendata")
    val nCust = n(150000)
    val nSupp = n(10000)
    val nPart = n(200000)
    def f(base: Int) = scaledFiles(base, scale)
    write(region(spark), outDir, "region", 1)
    write(nation(spark), outDir, "nation", 1)
    write(customer(spark, nCust), outDir, "customer", f(4))
    write(supplier(spark, nSupp), outDir, "supplier", 1)
    write(part(spark, nPart), outDir, "part", f(4))
    val o = orders(spark, n(1500000), nCust)
    write(o, outDir, "orders", f(8))
    write(lineitem(spark, spark.read.parquet(s"$outDir/orders.parquet"),
      nPart, nSupp), outDir, "lineitem", f(16))
    write(events(spark, n(1000000), n(15000)), outDir, "events", f(8))
    write(documents(spark, n(50000)), outDir, "documents", f(8))
    write(embeddings(spark, n(20000)), outDir, "embeddings", f(4))
    println(s"[gendata] wrote scale=$scale fixture to $outDir")
    spark.stop()
  }
}
