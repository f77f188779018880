package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at 100 TB.
  *
  * AQE's skew-join splitting (on by default) covers sort-merge joins;
  * these helpers cover the two shapes AQE doesn't: a skewed high-
  * cardinality aggregation, and a shuffled join whose hot keys are known
  * to overwhelm one reducer. Salting spreads one hot key over
  * `numSalts` reducers at the cost of a second (tiny) combine pass /
  * a `numSalts`× replication of the dimension side.
  *
  * The salt is a deterministic hash of the whole row, not a random
  * number — results stay reproducible and Spark may re-execute tasks.
  */
object Skew {

  private def salt(df: DataFrame, numSalts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(numSalts))

  /** Two-phase salted count: groupBy(keys, salt) partials → final sum.
    * Result is identical to a direct groupBy count (asserted in
    * SkewSpec); the shuffle's hottest reducer shrinks by ~numSalts×. */
  def saltedCount(df: DataFrame, keys: Seq[String], numSalts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(df, numSalts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("n"))

  /** Two-phase salted decimal sum (exact, order-independent — same
    * decimal-domain discipline as queries.Det). */
  def saltedSum(
      df: DataFrame, keys: Seq[String], value: Column,
      scale: Int = 2, numSalts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(df, numSalts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(value.cast(org.apache.spark.sql.types.DecimalType(28, scale)))
        .as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).cast("double").as("sum_value"))

  /** Chunked running aggregation — the window-skew escape hatch
    * (SCALE.md cliff 3): a running count/sum per key sorts each key's
    * rows in ONE task, so a pathological key (one user with 10⁹
    * events) serializes on a single reducer. Splitting each key's
    * stream into ORDER-ALIGNED chunks (a monotone function of the
    * ordering column, e.g. `ts DIV 1h`) makes it two bounded passes:
    * an intra-chunk running aggregate — parallel across (key, chunk)
    * — plus a per-key prefix over CHUNK TOTALS (rows = #chunks, tiny),
    * joined back and added. Works for any associative aggregate; exact
    * in integer/decimal domain.
    *
    * Result ≡ the plain running window (the declared query's DuckDB
    * oracle IS the plain form, so the rewrite is cross-checked
    * end-to-end, not against itself).
    *
    * @param chunk monotone-in-`ord` chunk id (same order unit)
    * @param ord   total-order columns within a key (ties broken by
    *              later columns; must be a total order for a
    *              well-defined running value) */
  def chunkedRunning(
      df: DataFrame, key: String, chunk: Column, ord: Seq[String],
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Exchange audit (r18, guide §2.3/§2.4 — measured, then left
    // alone): the intra window and the chunk-totals aggregate both
    // cluster on (key, __chunk), which tempts a shared explicit
    // repartition. Tried: column pruning specializes each branch's
    // subtree below the repartition, so ReuseExchange does NOT fire
    // and the totals branch then shuffles the FULL stream where the
    // grouped shape ships only per-(key,chunk) partial aggregates —
    // locally faster (fewer serial stages over ~MB data) but strictly
    // more network at scale. The two-exchange shape is the
    // scale-correct one: one full-stream shuffle for the window, one
    // tiny partial-aggregate shuffle for the totals.
    val base = df.withColumn("__chunk", chunk)
    val wIn = Window.partitionBy(col(key), col("__chunk"))
      .orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = base
      .withColumn("__run_in", sum(value).over(wIn))
      .withColumn("__cnt_in", count(lit(1)).over(wIn))
    // chunk totals per key: rows = #chunks per key — tiny; the prefix
    // window here sorts chunk totals, never the raw stream
    val wPrefix = Window.partitionBy(col(key)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = base
      .groupBy(col(key), col("__chunk"))
      .agg(sum(value).as("__tot"), count(lit(1)).as("__n"))
      .select(col(key), col("__chunk"),
        coalesce(sum(col("__tot")).over(wPrefix), lit(0L))
          .as("__run_prefix"),
        coalesce(sum(col("__n")).over(wPrefix), lit(0L))
          .as("__cnt_prefix"))
    intra.join(prefix, Seq(key, "__chunk"))
      .withColumn("running_sum", col("__run_in") + col("__run_prefix"))
      .withColumn("running_n", col("__cnt_in") + col("__cnt_prefix"))
      .drop("__chunk", "__run_in", "__cnt_in",
        "__run_prefix", "__cnt_prefix")
  }

  /** Salted equi-join for a skewed fact side: fact rows get a hash salt,
    * the (small) dimension side replicates across all salts, and the
    * join key becomes (key, salt) — one hot key now lands on numSalts
    * reducers. Equivalent to fact.join(dim, keys) (asserted in SkewSpec).
    *
    * MEASURED BOUNDARY (r14, `graft.Diag skew` sf5/sf20, 30% hot key): for a
    * batch SMJ this is the WRONG tool when the dim is fact-sized — the
    * ×numSalts dim replication cost exceeded the skew it cured (salt
    * 9.1/36.2 s vs un-mitigated 7.1/25.4 s), while AQE's runtime skew
    * split — which replicates only the matching dim RANGES of the
    * oversized partitions — won 2.5–2.7× (2.6/10.0 s, `skew=true`
    * verified in the final plan; PlanSpec pins it). Keep AQE's default
    * ON as the batch answer; reach for saltedJoin only where AQE
    * cannot re-plan: stream-static joins (no runtime stats, fixed
    * plan), skew inside a single in-flight partition, or a genuinely
    * small dim whose replication is cheap (where broadcast is usually
    * better still). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      numSalts: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt", salt(fact, numSalts))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
