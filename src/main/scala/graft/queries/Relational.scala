package graft.queries

import graft.Q
import graft.engine.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans, joins, sorts and set operations (SURVEY.md §2B B1, B4–B12,
  * B23–B25).
  *
  * Reference analog: the pipelines' extract step is a full-table scan
  * (`pg_dump -Fc`, backup.sh:210) and its TOC/status handling is line
  * filtering; the engine generalizes to the full relational join/set
  * surface. Scale posture: dimension joins broadcast (customer⋈nation⋈
  * region); fact-fact joins shuffle on their equi keys and AQE handles
  * skew; nothing collects to the driver.
  */
object Relational {

  /** B1: projection + filter pushed into the parquet scan. */
  val scanProjectFilter: Q = Q(
    "q_scan_project_filter",
    (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_shipdate")
        .where(col("l_quantity") >= lit(48.0)
          && col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      l_shipdate
    FROM lineitem
    WHERE l_quantity >= 48.0 AND l_shipdate >= TIMESTAMP '2001-06-01'
    ORDER BY l_orderkey, l_linenumber"""))

  /** B4: fact⋈fact equi join (shuffle/SMJ at scale) + aggregate. */
  val joinInnerEqui: Q = Q(
    "q_join_inner_equi",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          Det.dsum(col("l_extendedprice"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority,
      ${Det.sqlSum("l_extendedprice", 2)} AS revenue, count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** B5: star join with explicitly broadcast dimensions — at 100 TB the
    * fact side streams while nation/region ship to every executor. */
  val joinBroadcast: Q = Q(
    "q_join_broadcast",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          Det.dsum(col("c_acctbal"), 2).as("sum_acctbal"))
        .orderBy("r_name")
    },
    Some(s"""SELECT r_name, count(*) AS n_cust,
      ${Det.sqlSum("c_acctbal", 2)} AS sum_acctbal
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name"""))

  /** B6a: left outer join — order-count histogram incl. zero-order
    * customers (count(o_orderkey) skips nulls from the outer side). */
  val joinLeftOuter: Q = Q(
    "q_join_left_outer",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("n_orders")
    },
    Some("""WITH per AS (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT n_orders, count(*) AS n_cust FROM per
    GROUP BY n_orders ORDER BY n_orders"""))

  /** B6c: right outer join — mirror of B6a with the preserved side on
    * the right: recent orders RIGHT JOIN customer keeps every customer;
    * zero-order customers surface as the null side per segment. */
  val joinRightOuter: Q = Q(
    "q_join_right_outer",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_recent_orders"),
          count(lit(1)).as("n_rows"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .as("n_inactive"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
      count(o_orderkey) AS n_recent_orders,
      count(*) AS n_rows,
      CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_inactive
    FROM (SELECT * FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-06-01') o
      RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** B6b: full outer join of per-nation customer vs supplier counts. */
  val joinFullOuter: Q = Q(
    "q_join_full_outer",
    (s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val p = Tables.supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, c("c_nationkey") === p("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          col("n_cust"), col("n_supp"))
        .orderBy("nationkey")
    },
    Some("""WITH c AS (SELECT c_nationkey, count(*) AS n_cust
        FROM customer GROUP BY c_nationkey),
      s AS (SELECT s_nationkey, count(*) AS n_supp
        FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp
    FROM c FULL JOIN s ON c_nationkey = s_nationkey
    ORDER BY nationkey"""))

  /** B7: left-semi join (EXISTS) — orders having a late-shipped item. */
  val joinSemi: Q = Q(
    "q_join_semi",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n_orders
    FROM orders WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate >= TIMESTAMP '2001-01-01')
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** B8: left-anti join (NOT EXISTS) — customers with no 2001 orders
    * (every customer has *some* order, so the unfiltered anti is empty). */
  val joinAnti: Q = Q(
    "q_join_anti",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2001-01-01')
    ORDER BY c_custkey"""))

  /** B9: theta/range join — same-brand part pairs within a $1 price
    * band. Brand equality is the shuffle key; the band is a residual
    * filter, so this stays a hash join (not a nested loop) at scale. */
  val joinThetaRange: Q = Q(
    "q_join_theta_range",
    (s, d) => {
      // BANDED range join — the generic scale shape for |a-b| < w:
      // band = floor(price / w); a qualifying pair's bands differ by at
      // most 1, so exploding ONE side to {band-1, band, band+1} and
      // equi-joining on (brand, band) finds every pair while the join
      // key stays fine-grained. Exactly one of the three exploded
      // values equals the other side's band, so no dedup is needed; the
      // exact |diff| < w predicate remains as the residual. The naive
      // form (equi on brand + residual) evaluates |brand block|² pairs —
      // brand cardinality is FIXED (25), so blocks grow linearly with
      // the table and the join quadratically: measured 42 s at sf1 vs
      // 0.8 s at sf0.1. Banded: candidates follow pair density, and the
      // r6 sf1 point lands ~10× sf0.1 — linear. Oracle unchanged: the
      // rewrite is pure plan, same result set.
      val p1 = Tables.part(s, d).select(
        col("p_partkey").as("a_key"), col("p_brand").as("a_brand"),
        col("p_retailprice").as("a_price"))
        .withColumn("band", explode(array(
          floor(col("a_price")).cast("long") - 1,
          floor(col("a_price")).cast("long"),
          floor(col("a_price")).cast("long") + 1)))
      val p2 = Tables.part(s, d).select(
        col("p_partkey").as("b_key"), col("p_brand").as("b_brand"),
        col("p_retailprice").as("b_price"))
        .withColumn("band", floor(col("b_price")).cast("long"))
      p1.join(p2, p1("band") === p2("band")
          && col("a_brand") === col("b_brand")
          && col("a_key") < col("b_key")
          && abs(col("a_price") - col("b_price")) < lit(1.0))
        .groupBy(col("a_brand").as("brand"))
        .agg(count(lit(1)).as("n_close_pairs"))
        .orderBy("brand")
    },
    Some("""SELECT p1.p_brand AS brand, count(*) AS n_close_pairs
    FROM part p1 JOIN part p2
      ON p1.p_brand = p2.p_brand AND p1.p_partkey < p2.p_partkey
      AND abs(p1.p_retailprice - p2.p_retailprice) < 1.0
    GROUP BY p1.p_brand ORDER BY brand"""))

  /** B10: as-of join — for each purchase event, the user's most recent
    * order as of the event time. Composed as equi-join on user + window
    * top-1 (Catalyst has no asof operator); at 100 TB the same plan
    * works because the join shuffles on user and the window is
    * per-event. Ties on o_orderdate break by o_orderkey. */
  val joinAsof: Q = Q(
    "q_join_asof",
    (s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type") === lit("purchase"))
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      e.join(o, e("user_id") === o("o_custkey")
          && o("o_orderdate") <= e("ts"), "left")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("asof_orderkey"),
          col("o_orderdate").as("asof_orderdate"))
        .orderBy("event_id")
    },
    Some("""WITH j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        ROW_NUMBER() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
      o_orderdate AS asof_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** B10 native form: the SAME as-of semantics through the custom
    * planner operator (graft.plans.AsofJoin — logical node, strategy,
    * streaming two-pointer exec). The composed form above buffers
    * every (event, earlier-order) candidate into its window sort; this
    * one sorts each side once and streams, O(L+R) per partition.
    * Same oracle SQL as q_join_asof: DuckDB hash-checks the custom
    * operator's output bit-for-bit against the relational definition,
    * and PlanSpec asserts AsofJoinExec actually planned (no
    * WindowExec). */
  val joinAsofNative: Q = Q(
    "q_join_asof_native",
    (s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type") === lit("purchase"))
        .select(col("event_id"), col("user_id"), col("ts"))
      // parquet timestamp[ms] surfaces as TIMESTAMP_NTZ while ts is
      // LTZ; session TZ is pinned UTC, so the cast is value-identical
      // (the composed form relies on the same implicit coercion).
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
      graft.plans.Asof.join(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("asof_orderkey"),
          col("o_orderdate").as("asof_orderdate"))
        .orderBy("event_id")
    },
    Some("""WITH j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        ROW_NUMBER() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
      o_orderdate AS asof_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** Native as-of, FORWARD direction (pandas merge_asof
    * direction='forward'): for each purchase event, the user's FIRST
    * order on or after the event — the "next action after a trigger"
    * join (next restock after a stockout, next order after a
    * complaint). Same streaming exec, no buffering at all in forward
    * mode (the cursor itself is the candidate). Oracle: the composed
    * window form with ascending order — DuckDB hash-checks the
    * direction logic. */
  val joinAsofForward: Q = Q(
    "q_join_asof_forward",
    (s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type") === lit("purchase"))
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
      graft.plans.Asof.join(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = Seq("o_orderkey"),
          direction = graft.plans.Asof.Forward)
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("next_orderkey"),
          col("o_orderdate").as("next_orderdate"))
        .orderBy("event_id")
    },
    Some("""WITH j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        ROW_NUMBER() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts)
    SELECT event_id, user_id, o_orderkey AS next_orderkey,
      o_orderdate AS next_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** Native as-of, NEAREST direction: for each purchase event, the
    * user's order CLOSEST in time on either side — the
    * reconciliation join ("which order does this event belong to")
    * when the event stream and the order book have clock skew in
    * both directions. The oracle ranks every same-user order by
    * |gap| with the engine's full tie ladder declared explicitly:
    * equal gaps choose backward; within the backward side the
    * largest orderkey wins (the merge keeps the last row in sort
    * order), within the forward side the smallest. */
  val joinAsofNearest: Q = Q(
    "q_join_asof_nearest",
    (s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type") === lit("purchase"))
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
      graft.plans.Asof.join(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = Seq("o_orderkey"),
          direction = graft.plans.Asof.Nearest)
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("near_orderkey"),
          col("o_orderdate").as("near_orderdate"))
        .orderBy("event_id")
    },
    Some("""WITH j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        ROW_NUMBER() OVER (PARTITION BY e.event_id
          ORDER BY
            abs(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
              - epoch_us(e.ts)) ASC,
            (o.o_orderdate <= e.ts) DESC,
            CASE WHEN o.o_orderdate <= e.ts
              THEN -o.o_orderkey ELSE o.o_orderkey END ASC) AS rn
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') e
      LEFT JOIN orders o ON e.user_id = o.o_custkey)
    SELECT event_id, user_id, o_orderkey AS near_orderkey,
      o_orderdate AS near_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** Native as-of with TOLERANCE (pandas merge_asof tolerance): the
    * match must also be recent enough — stale history is worse than no
    * match for feature joins ("the user's most recent order" loses
    * meaning if it is years old). Same streaming exec; tolerance is an
    * O(1) per-row filter at emit. The bound (8400 days) is calibrated
    * to the fixture's order→event staleness range (8190–9789 days) so
    * BOTH outcomes occur — about half the matches survive, half null
    * out; a bound outside that range would make the oracle check
    * vacuous. Oracle: the composed form plus the residual age bound. */
  val joinAsofTolerance: Q = Q(
    "q_join_asof_tolerance",
    (s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type") === lit("purchase"))
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
      graft.plans.Asof.join(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = Seq("o_orderkey"),
          tolerance = Some(8400L * 24 * 3600 * 1000000L)) // 8400 days in µs
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("asof_orderkey"),
          col("o_orderdate").as("asof_orderdate"))
        .orderBy("event_id")
    },
    Some("""WITH j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        ROW_NUMBER() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        AND o.o_orderdate >= e.ts - INTERVAL 8400 DAY)
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
      o_orderdate AS asof_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** B10 SQL form: the native as-of join reached from PURE SQL via the
    * `asof_join` table-valued function (graft.plans.AsofTableFunction +
    * ResolveAsofJoin, injected by GraftExtensions) — r5's gap was that
    * only DataFrame users could reach AsofJoinExec while SQL text
    * planned the window shape. Same semantics, same oracle as
    * q_join_asof: DuckDB hash-checks the SQL-path operator bit-for-bit,
    * and PlanSpec asserts the TVF plans AsofJoinExec with no window. */
  val joinAsofSql: Q = Q(
    "q_join_asof_sql",
    (s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === lit("purchase"))
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView("asof_sql_events")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
        .createOrReplaceTempView("asof_sql_orders")
      s.sql("""
        SELECT event_id, user_id, o_orderkey AS asof_orderkey,
               o_orderdate AS asof_orderdate
        FROM asof_join('asof_sql_events', 'asof_sql_orders',
          'user_id', 'o_custkey', 'ts', 'o_orderdate', 'o_orderkey')
        ORDER BY event_id""")
    },
    Some("""WITH j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        ROW_NUMBER() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') e
      LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
      o_orderdate AS asof_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** B11: interval join — same-user event pairs ≤5 minutes apart.
    * Equi on user_id + time-range residual. */
  val joinInterval: Q = Q(
    "q_join_interval",
    (s, d) => {
      val ev = Tables.events(s, d)
      val e1 = ev.select(col("user_id").as("u1"), col("ts").as("ts1"),
        col("event_type").as("a_type"), col("event_id").as("id1"))
      val e2 = ev.select(col("user_id").as("u2"), col("ts").as("ts2"),
        col("event_type").as("b_type"), col("event_id").as("id2"))
      e1.join(e2, col("u1") === col("u2")
          && col("ts2") > col("ts1")
          && col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("a_type"), col("b_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("a_type", "b_type")
    },
    Some("""SELECT e1.event_type AS a_type, e2.event_type AS b_type,
      count(*) AS n_pairs
    FROM (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events) e1
    JOIN (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events) e2
      ON e1.user_id = e2.user_id AND e2.ts > e1.ts
      AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
    GROUP BY a_type, b_type ORDER BY a_type, b_type"""))

  /** B23: global top-N — Catalyst plans orderBy+limit as
    * TakeOrderedAndProject (per-partition top-N, no full sort). */
  val sortLimit: Q = Q(
    "q_sort_limit",
    (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""))

  /** B24a: UNION ALL of two tagged filtered scans. */
  val unionAll: Q = Q(
    "q_union_all",
    (s, d) => {
      val o = Tables.orders(s, d)
      val high = o.filter(col("o_totalprice") > lit(450000.0))
        .select(col("o_orderkey"), lit("high_value").as("src"))
      val late = o.filter(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
        .select(col("o_orderkey"), lit("recent").as("src"))
      high.unionByName(late).orderBy("src", "o_orderkey")
    },
    Some("""SELECT * FROM (
      SELECT o_orderkey, 'high_value' AS src FROM orders
        WHERE o_totalprice > 450000.0
      UNION ALL
      SELECT o_orderkey, 'recent' AS src FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-06-01')
    ORDER BY src, o_orderkey"""))

  /** B24b: UNION DISTINCT of the same two sets. */
  val unionDistinct: Q = Q(
    "q_union_distinct",
    (s, d) => {
      val o = Tables.orders(s, d)
      val high = o.filter(col("o_totalprice") > lit(450000.0))
        .select("o_orderkey")
      val late = o.filter(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
        .select("o_orderkey")
      high.unionByName(late).distinct().orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0
    UNION
    SELECT o_orderkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-06-01'
    ORDER BY o_orderkey"""))

  /** B25a: INTERSECT — customers ordering in both 1995 and 2001. */
  val intersectQ: Q = Q(
    "q_intersect",
    (s, d) => {
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y01 = o.filter(year(col("o_orderdate")) === 2001).select("o_custkey")
      y95.intersect(y01).orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
    ORDER BY o_custkey"""))

  /** B25b: EXCEPT — 1995 customers who did not order in 2001. Also the
    * algebra behind the round-trip verify job (A7, backup.sh:372-376). */
  val exceptQ: Q = Q(
    "q_except",
    (s, d) => {
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y01 = o.filter(year(col("o_orderdate")) === 2001).select("o_custkey")
      y95.except(y01).orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
    ORDER BY o_custkey"""))

  /** B9b: PURE non-equi join (no equi component at all) — cross-brand
    * near-price pairs among size-1 parts. Catalyst has no shuffle key
    * here, so this plans a BroadcastNestedLoopJoin: correct for small
    * filtered sides; the banded/equi-keyed q_join_theta_range is the
    * form that scales. */
  val joinNonEqui: Q = Q(
    "q_join_nonequi_bnl",
    (s, d) => {
      // This query deliberately demonstrates the no-equi-key join
      // (BroadcastNestedLoopJoin) — which is O(|left|·|right|) by
      // nature, so its INPUTS must be bounded in absolute terms, not
      // proportional ones (cliff 7 rule, SCALE.md): `p_size == 1` alone
      // is 2% of a growing table and went quadratic at the r6 sf5 run
      // (16 s). The id ceiling (= the whole table at the driver
      // fixtures, so oracle output is unchanged) pins the demo's cost
      // at any scale; a real no-key join over two growing tables has no
      // sub-quadratic plan and belongs behind a banded rewrite instead
      // (see q_join_theta_range).
      val p1 = Tables.part(s, d)
        .filter(col("p_size") === 1 && col("p_partkey") < 20000)
        .select(col("p_partkey").as("a_key"), col("p_brand").as("a_brand"),
          col("p_retailprice").as("a_price"))
      val p2 = Tables.part(s, d)
        .filter(col("p_size") === 1 && col("p_partkey") < 20000)
        .select(col("p_partkey").as("b_key"), col("p_brand").as("b_brand"),
          col("p_retailprice").as("b_price"))
      p1.join(p2, col("a_key") < col("b_key")
          && col("a_brand") =!= col("b_brand")
          && abs(col("a_price") - col("b_price")) < lit(5.0))
        .select("a_key", "b_key", "a_brand", "b_brand", "a_price", "b_price")
        .orderBy("a_key", "b_key")
    },
    Some("""SELECT p1.p_partkey AS a_key, p2.p_partkey AS b_key,
      p1.p_brand AS a_brand, p2.p_brand AS b_brand,
      p1.p_retailprice AS a_price, p2.p_retailprice AS b_price
    FROM part p1 JOIN part p2
      ON p1.p_partkey < p2.p_partkey AND p1.p_brand != p2.p_brand
      AND abs(p1.p_retailprice - p2.p_retailprice) < 5.0
    WHERE p1.p_size = 1 AND p2.p_size = 1
      AND p1.p_partkey < 20000 AND p2.p_partkey < 20000
    ORDER BY a_key, b_key"""))

  /** Generator/range source: a day spine over Q1-2001 left-joined to
    * per-day order counts — the time-series gap-filling shape (explicit
    * zero rows for empty days). */
  val dateSpine: Q = Q(
    "q_gen_date_spine",
    (s, d) => {
      val spine = s.range(1)
        .select(explode(sequence(
          lit("2001-01-01").cast("timestamp"),
          lit("2001-03-31").cast("timestamp"),
          expr("INTERVAL 1 DAY"))).as("day"))
      val perDay = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_orders"))
      spine.join(perDay, Seq("day"), "left")
        .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("day")
    },
    Some("""WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2001-01-01',
        TIMESTAMP '2001-03-31', INTERVAL 1 DAY)) AS day),
    per_day AS (
      SELECT o_orderdate AS day, count(*) AS n_orders
      FROM orders GROUP BY o_orderdate)
    SELECT day, coalesce(n_orders, 0) AS n_orders
    FROM spine LEFT JOIN per_day USING (day)
    ORDER BY day"""))

  /** EXT (re-scoped r15): salted skew join in its MEASURED niche — the
    * batch-parity form of the stream-static enrichment join, the one
    * shape where manual salting is the only mitigation left. The r14
    * A/B (`graft.Diag skew`, SCALE.md) settled the batch question: against a
    * fact-sized "dim", ×8 whole-side replication was WORSE than no
    * mitigation (9.1 vs 7.1 s sf5) and AQE's runtime skew split beat
    * both 2.5–2.7× — so no batch query here salts, and PlanSpec pins
    * AQE skew=true as the batch default. But a stream-static join's
    * plan is FROZEN at start: AQE never re-plans inside a micro-batch,
    * so a hot user lands on one reducer every batch forever, and when
    * the dim is too large or too frequently refreshed to broadcast,
    * spreading fact rows over (key, salt) reducers is the one lever
    * left. This declared query is that twin's oracle-checkable half:
    * events (fact — where the skew lives, never replicated) salted
    * ×8 against a genuinely DIM-SIZED side (customer: 1% of events'
    * rows, so replication is cheap — the boundary the r14 A/B drew),
    * shuffle_hash-hinted to pin the non-broadcast form the streaming
    * premise implies. Result ≡ the plain equi join — which IS the
    * oracle; the live readStream form is
    * [[graft.streaming.StreamingJobs.saltedEnrichment]] (StreamingSpec
    * pins streaming↔batch parity and the no-broadcast plan). */
  val joinSkewSalt: Q = Q(
    "q_join_skew_salt",
    (s, d) => {
      val ev = Tables.events(s, d)
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        .hint("shuffle_hash")
      graft.engine.Skew.saltedJoin(ev, dim, Seq("user_id"), numSalts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_events"),
          Det.dsum(col("value"), 4).as("sum_value"))
        .orderBy("c_mktsegment")
    },
    Some(s"""SELECT c_mktsegment, count(*) AS n_events,
      ${Det.sqlSum("value", 4)} AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** EXT: null-safe equi join (`<=>` / IS NOT DISTINCT FROM) — the join
    * form where NULL keys MATCH each other instead of silently dropping
    * (dirty-key reconciliation: two feeds that both use NULL for
    * "unknown" must pair those rows, not lose them). Keys are made
    * nullable deterministically (`nullif(custkey % 50, 0)`); the probe
    * side is bounded so the declared result stays small. Catalyst
    * plans `<=>` as a hash join on the null-safe key wrapper — still an
    * equi shuffle, NOT a nested loop, which is the scale point. */
  val joinNullSafe: Q = Q(
    "q_join_null_safe",
    (s, d) => {
      val key = nullif(col("o_custkey") % 50, lit(0))
      val a = Tables.orders(s, d)
        .select(key.as("k"), col("o_orderkey").as("a_order"))
      val b = Tables.orders(s, d)
        .where(col("o_orderkey") < 200)
        .select(key.as("k"), col("o_orderkey").as("b_order"))
      b.join(a, b("k") <=> a("k"))
        .groupBy(col("b_order"), b("k").isNull.as("key_is_null"))
        .agg(count(lit(1)).as("n_matches"))
        .orderBy("b_order")
    },
    Some("""WITH a AS (
      SELECT nullif(o_custkey % 50, 0) AS k, o_orderkey AS a_order
      FROM orders),
    b AS (
      SELECT nullif(o_custkey % 50, 0) AS k, o_orderkey AS b_order
      FROM orders WHERE o_orderkey < 200)
    SELECT b_order, b.k IS NULL AS key_is_null, count(*) AS n_matches
    FROM b JOIN a ON b.k IS NOT DISTINCT FROM a.k
    GROUP BY b_order, b.k IS NULL
    ORDER BY b_order"""))

  /** EXT (r11): the co-located ZERO-EXCHANGE fact⋈fact join over the
    * publish-once bucketed layout (engine/Bucketed — design doc
    * there). Same join as q_join_inner_equi, but both inputs read from
    * copies hash-clustered and pre-sorted on the join key, so the join
    * plans with NO shuffle exchange and NO per-task sort under it (BucketedSpec pins the plan and the
    * 1/n bucket pruning on key-equality filters): the repeated-join
    * shuffle is paid once at layout time, not per run. The aggregate
    * groups by o_orderstatus — a different output surface than
    * q_join_inner_equi's priority rollup, so the two queries also
    * cross-check the join content two ways. Oracle reads the RAW
    * parquet: content equality proves the bucketed copy is faithful. */
  val joinBucketed: Q = Q(
    "q_join_bucketed",
    (s, d) => {
      val l = graft.engine.Bucketed.table(
        s, d, "lineitem", Tables.lineitem(s, d), "l_orderkey")
      val o = graft.engine.Bucketed.table(
        s, d, "orders", Tables.orders(s, d), "o_orderkey")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          Det.dsum(col("l_extendedprice"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus,
      ${Det.sqlSum("l_extendedprice", 2)} AS revenue, count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** EXT (r11): DYNAMIC PARTITION PRUNING over the publish-once
    * date-partitioned layout (engine/Partitioned — design doc there).
    * The fact is the events table laid out one directory per
    * `event_day`; the dim is the top-8 "hot" days by exact-decimal
    * daily value (rank with a day tiebreak, so the set is
    * deterministic at every scale). Joining on the partition column
    * lets Spark prune fact directories at RUN time with the dim's
    * broadcast results — the scan carries a `dynamicpruning` filter
    * and reads 8 of the 30 day directories (PartitionedSpec pins
    * both, plus static literal pruning to exactly one directory).
    * At 100 TB this is the difference between scanning the corpus
    * and scanning the qualifying days; the dim is not known until
    * its own aggregate runs, so STATIC pruning can't express it.
    * Oracle reads the RAW parquet: content equality proves the
    * partitioned copy faithful. */
  val joinPartitionPruned: Q = Q(
    "q_join_partition_pruned",
    (s, d) => {
      val ev = graft.engine.Partitioned.table(
        s, d, "events_by_day",
        Tables.events(s, d).withColumn("event_day", to_date(col("ts"))),
        "event_day")
      // the daily rollup publishes once (Partitioned.artifact — see
      // its doc for why the dim must be a plain scan+filter for the
      // runtime prune to survive adaptive re-planning); the query's
      // dim is then a rank filter over the artifact
      val stats = graft.engine.Partitioned.artifact(
        s, d, "day_stats",
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(Det.dsum(col("value"), 2).as("day_value"))
          .withColumn("rn", row_number().over(
            // constant-valued partition key (non-foldable, so it
            // survives the optimizer): the aggregate is ≤ |days|
            // rows, single-partition ranking is deliberate — see the
            // q_search_hybrid note on silencing WindowExec's warning
            Window.partitionBy(dayofmonth(col("day")) % 1)
              .orderBy(col("day_value").desc, col("day")))))
      val hot = stats.filter(col("rn") <= 8).select("day")
      // ≤ |days| rows — broadcast so the join is BHJ and DPP reuses
      // its broadcast for the runtime prune
      ev.join(broadcast(hot), ev("event_day") === hot("day"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          Det.dsum(col("value"), 2).as("sum_value"),
          countDistinct(col("event_day")).as("n_days"))
        .orderBy("event_type")
    },
    Some(s"""WITH daily AS (
      SELECT cast(ts AS date) AS day,
             ${Det.sqlSum("value", 2)} AS day_value
      FROM events GROUP BY 1),
    hot AS (
      SELECT day FROM (
        SELECT day, row_number() OVER (ORDER BY day_value DESC, day) AS rn
        FROM daily) WHERE rn <= 8)
    SELECT event_type, count(*) AS n_events,
           ${Det.sqlSum("value", 2)} AS sum_value,
           count(DISTINCT cast(ts AS date)) AS n_days
    FROM events JOIN hot ON cast(ts AS date) = hot.day
    GROUP BY event_type ORDER BY event_type"""))

  /** EXT (r14): join-STRATEGY hints — the user-facing knob for
    * overriding Catalyst's physical join choice when the operator
    * knows something the stats don't. `hint("shuffle_hash")` on the
    * build side plans a ShuffledHashJoin instead of the default
    * sort-merge: same one shuffle on the key, but the build side
    * hash-maps per partition and NEITHER side sorts — a win when one
    * side is much smaller per key range yet too big to broadcast
    * (PlanSpec pins both the ShuffledHashJoin node and the absence of
    * a sort below it). The result is hint-invariant — the oracle is
    * the plain join, so hash-equality proves the hint changed only
    * the physical strategy. At 100 TB this is the join form for
    * medium×large where sort spill, not hash memory, is the
    * bottleneck; the hint's risk (build side must fit per-partition
    * memory) is exactly why it is opt-in per query, not a default. */
  val joinShuffleHash: Q = Q(
    "q_join_shuffle_hash",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        .hint("shuffle_hash")
      li.join(ord, Seq("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          Det.dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n_items,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** EXT (r14): deterministic dense surrogate-key assignment — the
    * global ordinal every dimension-table build needs, WITHOUT the
    * global sort that makes the naive form a scale-killer. The oracle
    * states the spec in its natural (and single-partition) form,
    * `row_number() OVER (ORDER BY source, doc_id)`; the engine
    * computes the identical ids distributed: per-source counts → each
    * source's starting offset via a broadcast self-join over the
    * k-row count table (k = #sources, so the O(k²) inequality join is
    * noise and stays off the big table) → per-source `row_number` in
    * a KEYED window (parallel across sources; the only sort, and it's
    * distributed) → id = offset + rank. Rejected alternatives:
    * `monotonically_increasing_id` (nondeterministic, gappy — re-runs
    * mint different keys, which corrupts an idempotent dimension
    * load); a single unpartitioned window (the oracle's own form —
    * one task sorts the corpus). Skew note: one giant source bounds
    * the window's parallelism; if ids need no source-major order, the
    * same two-phase shape over `repartitionByRange` buckets (bucket
    * counts → offsets → per-bucket rank) spreads arbitrarily. */
  val genSurrogateId: Q = Q(
    "q_gen_surrogate_id",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("source"), col("doc_id"))
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val offs = counts.as("a")
        .join(broadcast(counts.as("b")),
          col("b.source") < col("a.source"), "left")
        .groupBy(col("a.source").as("source"))
        .agg(coalesce(sum(col("b.n")), lit(0L)).as("off"))
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      docs.join(broadcast(offs), "source")
        .select(col("doc_id"), col("source"),
          (col("off") + row_number().over(w)).as("sid"))
        .orderBy("sid")
    },
    Some("""SELECT doc_id, source,
      CAST(row_number() OVER (ORDER BY source, doc_id) AS BIGINT) AS sid
    FROM documents ORDER BY sid"""))

  val all: Seq[Q] = Seq(
    scanProjectFilter, joinInnerEqui, joinBroadcast, joinLeftOuter,
    joinRightOuter, joinFullOuter, joinSemi, joinAnti, joinThetaRange,
    joinAsof, joinAsofNative, joinAsofForward, joinAsofNearest,
    joinAsofTolerance, joinAsofSql,
    joinInterval, joinNonEqui, joinSkewSalt, sortLimit, unionAll,
    unionDistinct, intersectQ, exceptQ, dateSpine, joinNullSafe,
    joinBucketed, joinPartitionPruned, joinShuffleHash, genSurrogateId)
}
