package graft.queries

import graft.Q
import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** SQL-API surface: the same engine driven through `spark.sql` over
  * temp views — TPC-H-shaped analytics (Q3/Q5/Q10 forms adapted to the
  * fixture schema). Demonstrates that every capability is reachable
  * from SQL, not just the DataFrame DSL; Catalyst plans both
  * identically.
  *
  * Money sums use the same exact-decimal discipline as Det (see
  * Det.scala scaladoc): raw 2/4-digit columns cast to decimal, products
  * stay decimal, final rescale to the true product scale.
  */
object SqlQueries {

  /** Register as temp views ONLY the tables the statement actually
    * names, resolved by word-boundary match against the SQL text — a
    * fixture problem in one table must not take down SQL queries that
    * never touch it (r6: an events re-encoding killed four
    * lineitem-only queries at eager whole-catalog view setup). */
  private def withViews(s: SparkSession, d: String)(sql: String): DataFrame = {
    Tables.names.foreach { t =>
      if (s"""\\b$t\\b""".r.findFirstIn(sql).isDefined) {
        // events routes through Tables.events for ts normalization
        // (nanos-long vs TIMESTAMP(µs) encodings; Tables.normalizeEventsTs).
        val df = if (t == "events") Tables.events(s, d) else Tables(s, d, t)
        // Views are registered as-is. An earlier r18 draft widened the
        // fact tables here ([[Tables.widen]]); the full-schedule A/B
        // showed the added exchange was a net tax for the SQL family
        // (q_sql_returned_revenue 1.45→1.27 s without it) — the
        // broadcast-join cascades stream fine over a narrow scan and
        // the decimal folds shuffle only per-group partials.
        df.createOrReplaceTempView(t)
      }
    }
    s.sql(sql)
  }

  private val revenue =
    """sum(CAST(l_extendedprice AS DECIMAL(12,2))
      | * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))"""
      .stripMargin
  // Big-sum double conversion per engine dialect: the q_sql_local_volume
  // nation groups approach 2^53 unscaled within one order of magnitude
  // of sf1, where a direct decimal→double cast stops being correctly
  // rounded in DuckDB (see Det.bigToDouble). Spark text and oracle text
  // differ ONLY in this conversion idiom — same exact decimal sum.
  private val revenueOutSpark =
    Det.sqlBigToDoubleSpark(s"CAST($revenue AS DECIMAL(24,6))")
  private val revenueOutDuck =
    Det.sqlBigToDouble(s"CAST($revenue AS DECIMAL(24,6))")

  /** TPC-H Q3 shape: shipping-priority revenue of building-segment
    * orders not yet shipped at the cutoff. */
  val sqlQ3: Q = Q(
    "q_sql_shipping_priority",
    (s, d) => withViews(s, d)(s"""
      SELECT o_orderkey, $revenueOutSpark AS revenue, o_orderdate, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '2000-03-15'
        AND l_shipdate > TIMESTAMP '2000-03-15'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""),
    Some(s"""SELECT o_orderkey, $revenueOutDuck AS revenue, o_orderdate,
      o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15'
      AND l_shipdate > TIMESTAMP '2000-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10"""))

  /** TPC-H Q5 shape: revenue by nation within one region (the fixture
    * has no s_nationkey=c_nationkey co-location, so the supplier leg is
    * joined by suppkey only). */
  val sqlQ5: Q = Q(
    "q_sql_local_volume",
    (s, d) => withViews(s, d)(s"""
      SELECT n_name, $revenueOutSpark AS revenue, count(*) AS n_items
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY n_name"""),
    Some(s"""SELECT n_name, $revenueOutDuck AS revenue, count(*) AS n_items
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY n_name"""))

  /** TPC-H Q10 shape: top returned-revenue customers. */
  val sqlQ10: Q = Q(
    "q_sql_returned_revenue",
    (s, d) => withViews(s, d)(s"""
      SELECT c_custkey, c_name, $revenueOutSpark AS revenue, c_mktsegment, n_name
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_mktsegment, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    Some(s"""SELECT c_custkey, c_name, $revenueOutDuck AS revenue,
      c_mktsegment, n_name
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_mktsegment, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** Correlated scalar subquery + EXISTS in SQL form — customers whose
    * account balance exceeds their nation's average, having 2001 orders. */
  val sqlSubquery: Q = Q(
    "q_sql_subquery",
    (s, d) => withViews(s, d)("""
      SELECT c_custkey, c_acctbal, c_nationkey
      FROM customer c
      WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
            / count(*)
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        AND EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2001-01-01')
      ORDER BY c_custkey"""),
    Some("""SELECT c_custkey, c_acctbal, c_nationkey
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
          / count(*)
        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      AND EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01')
    ORDER BY c_custkey"""))

  /** EXT: correlated LATERAL join — top-2 orders per customer via a
    * per-row correlated subquery with ORDER BY + LIMIT, the SQL-standard
    * form of the per-group top-k (the DSL twin is q_topk_per_group's
    * window). Catalyst decorrelates this into a ranked window join, so
    * the plan is the same shuffle-on-custkey shape, not a per-customer
    * re-scan of orders. Restricted to c_custkey < 300 to keep the
    * declared result bounded; the oracle runs the identical text. */
  val sqlLateral: Q = Q(
    "q_sql_lateral",
    (s, d) => withViews(s, d)("""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey < 300
      ORDER BY c.c_custkey, t.o_orderkey"""),
    Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey < 300
    ORDER BY c.c_custkey, t.o_orderkey"""))

  /** EXT (r13): RECURSIVE CTE — Spark 4's `WITH RECURSIVE` (the
    * UnionLoop execution added in 4.0) on the canonical warehouse
    * use: a calendar spine generated by recursion, outer-joined to
    * monthly revenue so empty months SURFACE as rows (the
    * gap-detection report a plain GROUP BY month cannot produce —
    * missing months simply don't exist in its output). The recursion
    * is the month-index walk 0..83 (strictly increasing → terminates;
    * Spark's recursive CTEs support UNION ALL only — cyclic closures
    * like the components oracle still need the DataFrame iteration,
    * which is also the 100 TB-scale answer). Decimal-domain month
    * sums; the monthly unscaled total stays far under 2^53 at every
    * measured SF, so the direct decimal→double cast is correctly
    * rounded in both engines (Det rules). */
  val sqlRecursiveSpine: Q = Q(
    "q_sql_recursive_spine",
    (s, d) => withViews(s, d)("""
      WITH RECURSIVE months(i) AS (
        SELECT 0
        UNION ALL
        SELECT i + 1 FROM months WHERE i < 83),
      spine AS (
        SELECT add_months(DATE '1995-01-01', i) AS month_start
        FROM months),
      rev AS (
        SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE)
            AS month_start,
          count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
            AS month_total
        FROM orders GROUP BY 1)
      SELECT s.month_start,
        COALESCE(r.n_orders, 0) AS n_orders,
        COALESCE(r.month_total, CAST(0 AS DOUBLE)) AS month_total,
        (r.n_orders IS NULL) AS is_gap
      FROM spine s LEFT JOIN rev r ON r.month_start = s.month_start
      ORDER BY s.month_start"""),
    Some("""WITH RECURSIVE months(i) AS (
      SELECT 0
      UNION ALL
      SELECT i + 1 FROM months WHERE i < 83),
    spine AS (
      SELECT CAST(DATE '1995-01-01' + to_months(CAST(i AS INT)) AS DATE)
        AS month_start
      FROM months),
    rev AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          AS month_total
      FROM orders GROUP BY 1)
    SELECT s.month_start,
      COALESCE(r.n_orders, 0) AS n_orders,
      COALESCE(r.month_total, CAST(0 AS DOUBLE)) AS month_total,
      (r.n_orders IS NULL) AS is_gap
    FROM spine s LEFT JOIN rev r ON r.month_start = s.month_start
    ORDER BY s.month_start"""))

  /** EXT (r14): Spark 4 SQL PIPE syntax (SPARK-49555) — the linear
    * `FROM … |> WHERE … |> EXTEND … |> AGGREGATE … |> ORDER BY` form
    * that reads in dataflow order (the GoogleSQL pipe dialect). This
    * is a PARSER frontend, not an engine: the pipe chain lowers to the
    * same logical plan as the classic statement, so the DuckDB oracle
    * is the semantically-identical classic SQL — hash-equality across
    * the two syntaxes IS the test that the frontend adds no semantics.
    * `EXTEND` computes the exact-decimal discounted price once;
    * `AGGREGATE … GROUP BY` emits group keys then aggregates; money
    * follows the Det decimal discipline with the per-dialect big-sum
    * double conversion. */
  val sqlPipe: Q = Q(
    "q_sql_pipe",
    (s, d) => withViews(s, d)(s"""
      FROM lineitem
      |> WHERE l_quantity > 5
      |> EXTEND CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
           AS disc_price
      |> AGGREGATE count(*) AS n_items,
           ${Det.sqlBigToDoubleSpark(
             "CAST(sum(disc_price) AS DECIMAL(24,6))")} AS revenue
         GROUP BY l_returnflag, l_linestatus
      |> ORDER BY l_returnflag, l_linestatus"""),
    Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n_items,
      ${Det.sqlBigToDouble(
        """CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        AS DECIMAL(24,6))""")} AS revenue
    FROM lineitem WHERE l_quantity > 5
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  /** EXT (r14): Spark 4.1 SQL-language UDFs (`CREATE FUNCTION …
    * RETURN <expr>`) — reusable scalar logic DECLARED IN SQL and
    * inlined by Catalyst at analysis time, so unlike JVM/Python UDFs
    * they stay inside whole-stage codegen and cost nothing over the
    * hand-expanded expression (the only UDF form this engine permits
    * in a hot path). One money UDF in the exact-decimal domain and one
    * banding UDF used in BOTH the projection and the GROUP BY prove
    * the definitions compose like built-ins. CREATE OR REPLACE keeps
    * the declaration idempotent per session. The DuckDB oracle inlines
    * the same expressions — hash-equality is the proof that the UDF
    * layer added no semantics. */
  val sqlUdf: Q = Q(
    "q_sql_udf",
    (s, d) => {
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
        p DECIMAL(12,2), disc DECIMAL(8,4)) RETURNS DECIMAL(21,6)
        RETURN p * (CAST(1 AS DECIMAL(8,4)) - disc)""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_qty_band(
        q DOUBLE) RETURNS STRING
        RETURN CASE WHEN q < 10 THEN 'low'
                    WHEN q < 30 THEN 'mid' ELSE 'high' END""")
      withViews(s, d)(s"""
        SELECT graft_qty_band(l_quantity) AS band,
          count(*) AS n_items,
          ${Det.sqlBigToDoubleSpark(
            """CAST(sum(graft_disc_price(
              CAST(l_extendedprice AS DECIMAL(12,2)),
              CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(24,6))""")}
            AS revenue
        FROM lineitem
        GROUP BY graft_qty_band(l_quantity)
        ORDER BY band""")
    },
    Some(s"""SELECT
      CASE WHEN l_quantity < 10 THEN 'low'
           WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS band,
      count(*) AS n_items,
      ${Det.sqlBigToDouble(
        """CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        AS DECIMAL(24,6))""")} AS revenue
    FROM lineitem
    GROUP BY 1 ORDER BY band"""))

  /** EXT (r14): PARAMETERIZED SQL + the `IDENTIFIER()` clause — the
    * injection-safe templating surface (SQL text is constant; values
    * AND the table name bind as typed arguments, so a hostile string
    * can never splice syntax). Every production scheduler templates
    * queries; string concatenation is how that goes wrong. The named
    * markers (`:seg`, `:cutoff`, `:cap`) bind literals; `IDENTIFIER
    * (:tab)` binds the relation name through the parser's identifier
    * rule — `'orders; DROP …'` fails to resolve rather than executes.
    * The oracle is the same statement with the bindings inlined:
    * hash-equality proves binding ≡ inlining. */
  val sqlParams: Q = Q(
    "q_sql_params",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_mktsegment,
          count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
            AS total_value
        FROM IDENTIFIER(:tab) JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate < :cutoff AND o_totalprice < :cap
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""",
        Map("tab" -> "orders",
          "cutoff" -> java.sql.Timestamp.valueOf("2001-06-01 00:00:00"),
          "cap" -> 200000.0))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        AS total_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate < TIMESTAMP '2001-06-01 00:00:00'
      AND o_totalprice < 200000.0
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** EXT (r14): `GROUP BY ALL` + `ORDER BY ALL` — the
    * every-non-aggregate-column shorthand DuckDB introduced and Spark
    * adopted (SPARK-44186): wide report queries stop hand-maintaining
    * the grouping list as projections evolve. BOTH engines run the
    * LITERAL SAME statement text — the one declared query whose Spark
    * SQL and oracle SQL are character-identical, pinning that the
    * dialect feature resolves to the same grouping in both. Counts and
    * an exact decimal sum only (the Det float discipline applies to
    * dialect demos too). */
  val sqlGroupByAll: Q = {
    val stmt = """SELECT l_returnflag, l_linestatus,
      count(*) AS n,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL"""
    Q("q_sql_group_by_all", (s, d) => withViews(s, d)(stmt), Some(stmt))
  }

  val all: Seq[Q] = Seq(sqlQ3, sqlQ5, sqlQ10, sqlSubquery, sqlLateral,
    sqlRecursiveSpine, sqlPipe, sqlUdf, sqlParams, sqlGroupByAll)
}
