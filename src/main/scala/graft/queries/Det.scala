package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for DuckDB-oracle parity (SURVEY.md §7 risks).
  *
  * Floating-point SUM depends on partition/accumulation order, so a
  * 32-partition Spark sum and a DuckDB sum of the same doubles can differ
  * in the last ulp — enough to break a hash compare. Casting each addend
  * to a fixed-scale decimal makes the sum EXACT (order-independent) in
  * both engines; the final cast back to double is then deterministic.
  * The per-row double→decimal rounding is identical in both engines
  * (round-to-nearest on values that are nowhere near half-way points).
  */
object Det {
  /** Order-independent sum: cast addend to DECIMAL(28,scale), sum, back
    * to double. DuckDB mirror: CAST(sum(CAST(x AS DECIMAL(28,s))) AS DOUBLE). */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Deterministic mean: exact decimal sum cast to double, then a single
    * IEEE double division by the group count. DuckDB mirror:
    * CAST(sum(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / count(*). */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))

  /** SQL fragment mirroring [[dsum]]. */
  def sqlSum(expr: String, scale: Int = 4): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(28,$scale))) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def sqlAvg(expr: String, scale: Int = 4): String =
    s"(${sqlSum(expr, scale)} / count(*))"

  /** Cast a RAW column (data with ≤`scale` true decimal digits, e.g.
    * prices/discounts) to decimal. Only raw columns may be cast — casting
    * a computed double product to decimal double-rounds differently in
    * DuckDB (which scales in double) once the scaled value nears 2^53.
    * Derived money arithmetic must instead stay in the decimal domain
    * (decimal × decimal is exact in both engines). */
  def dec(c: Column, scale: Int = 2, prec: Int = 12): Column =
    c.cast(DecimalType(prec, scale))

  /** SQL fragment mirroring [[dec]]. */
  def sqlDec(expr: String, scale: Int = 2, prec: Int = 12): String =
    s"CAST($expr AS DECIMAL($prec,$scale))"

  /** Exact decimal→double for POSITIVE sums whose unscaled value can pass
    * 2^53 (where DuckDB's decimal→double cast stops being correctly
    * rounded): split into integer part (< 2^53, exact in both) and
    * fraction (< 1, exact), then one deterministic IEEE add.
    * DuckDB's CAST(x AS DECIMAL(38,0)) truncates toward zero == floor for
    * positives, mirroring Spark's floor. */
  def bigToDouble(c: Column): Column =
    floor(c).cast("double") + (c - floor(c)).cast("double")

  /** SQL fragment mirroring [[bigToDouble]] — DuckDB DIALECT; `expr`
    * must be a decimal. DuckDB's decimal downscale cast truncates
    * toward zero (== floor for positives). Spark's rounds half-up, so
    * this text is NOT portable: Spark SQL must use
    * [[sqlBigToDoubleSpark]] instead. */
  def sqlBigToDouble(expr: String): String =
    s"(CAST(CAST(($expr) AS DECIMAL(38,0)) AS DOUBLE) + " +
      s"CAST(($expr) - CAST(($expr) AS DECIMAL(38,0)) AS DOUBLE))"

  /** [[sqlBigToDouble]] in SPARK SQL dialect: FLOOR on a decimal stays
    * in the exact decimal domain (DecimalType(p-s+1, 0)), mirroring the
    * Column-API floor in [[bigToDouble]]. For positive sums this equals
    * DuckDB's truncating-cast form value-for-value. */
  def sqlBigToDoubleSpark(expr: String): String =
    s"(CAST(FLOOR($expr) AS DOUBLE) + CAST(($expr) - FLOOR($expr) AS DOUBLE))"
}
