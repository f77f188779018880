package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd higher-order functions (no UDFs, no collect).
  *
  * Cross-engine determinism: every reduction is a sequential
  * left-to-right fold seeded with 0.0 — exactly DuckDB's
  * `list_reduce(list_prepend(0.0, list_transform(...)))` — and elements
  * cast float→double *before* multiplying, so both engines run the same
  * IEEE operation sequence and produce bit-identical doubles.
  */
object Vectors {

  /** Σ aᵢ·bᵢ in double precision, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity, written as dot/sqrt(n2a·n2b) — one sqrt, one
    * divide — so the oracle can mirror the exact operation order. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** DuckDB SQL mirror of [[dot]]; `a`/`b` are list-typed SQL exprs. */
  def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       list_transform(generate_series(1, len($a)),
         i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       (s, x) -> s + x)"""

  /** DuckDB SQL mirror of [[cosine]]. */
  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / sqrt(${sqlDot(a, a)} * ${sqlDot(b, b)}))"

  /** DuckDB mirror of one hyperplane dot against list column `v`: the
    * same left-to-right double fold as HyperplaneSig's kernel (plane
    * values rendered with Scala's shortest-round-trip Double.toString,
    * which every correct parser reads back to the identical double), so
    * each signature BIT — a sign test on a bit-identical double —
    * matches. */
  def sqlPlaneDot(plane: Seq[Double], v: String): String = {
    val lit = plane.map(_.toString).mkString("[", ", ", "]")
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       list_transform(generate_series(1, ${plane.length}),
         i -> CAST($v[i] AS DOUBLE) * ($lit)[i])),
       (s, x) -> s + x)"""
  }

  /** DuckDB mirror of band `b`'s value from a hyperplane signature:
    * `rowsPerBand` sign bits packed little-endian, matching
    * `shiftright(sig, b*rowsPerBand) & ((1<<rowsPerBand)-1)` over
    * HyperplaneSig's bit order. */
  def sqlBandVal(
      planes: Seq[Seq[Double]], b: Int, rowsPerBand: Int,
      v: String): String =
    (0 until rowsPerBand).map { j =>
      s"(CASE WHEN ${sqlPlaneDot(planes(b * rowsPerBand + j), v)} > 0" +
        s" THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
}
