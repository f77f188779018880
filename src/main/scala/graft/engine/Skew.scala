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

  /** Salted equi-join for a skewed fact side: fact rows get a hash salt,
    * the (small) dimension side replicates across all salts, and the
    * join key becomes (key, salt) — one hot key now lands on numSalts
    * reducers. Equivalent to fact.join(dim, keys) (asserted in SkewSpec). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      numSalts: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt", salt(fact, numSalts))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
