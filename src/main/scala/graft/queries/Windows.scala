package graft.queries

import graft.Q
import graft.engine.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2B B19–B22).
  *
  * Reference analog: `tail -1` last-status selection (backup.sh:143) is
  * a degenerate row_number()=1 window; the engine exposes the full
  * ranking/analytic/frame surface. Windows shuffle once on their
  * partition key and sort within partitions — at 100 TB the partition
  * key (custkey) distributes evenly so no single executor sees a
  * pathological partition.
  */
object Windows {

  /** B19: rank / dense_rank / row_number of orders per customer.
    * row_number's ordering carries a unique tiebreak (o_orderkey) —
    * without it the value is nondeterministic under ties. */
  val windowRank: Q = Q(
    "q_window_rank",
    (s, d) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      val byPriceKey = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        // cast("long"): DuckDB rank/row_number are BIGINT; keep schemas
        // identical so the driver's hash compare can't trip on width.
        .withColumn("price_rank", rank().over(byPrice).cast("long"))
        .withColumn("price_dense_rank", dense_rank().over(byPrice).cast("long"))
        .withColumn("rn", row_number().over(byPriceKey).cast("long"))
        .where(col("rn") <= 5)
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        rank() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC) AS price_rank,
        dense_rank() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC) AS price_dense_rank,
        row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
    WHERE rn <= 5 ORDER BY o_custkey, rn"""))

  /** B20: lag/lead/first/last order dates per customer. Frames are
    * explicit: DuckDB's default frame for first/last differs from
    * Spark's. */
  val windowAnalytic: Q = Q(
    "q_window_analytic",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
        .withColumn("first_date", first(col("o_orderdate")).over(wFull))
        .withColumn("last_date", last(col("o_orderdate")).over(wFull))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
      lag(o_orderdate, 1) OVER w AS prev_date,
      lead(o_orderdate, 1) OVER w AS next_date,
      first_value(o_orderdate) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS first_date,
      last_value(o_orderdate) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS last_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
      ORDER BY o_orderdate ASC, o_orderkey ASC)
    ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** B21: frame specs — running total (unbounded→current) and a 3-row
    * moving average per customer. Sums stay in the decimal domain so the
    * running values are exact in both engines. */
  val windowFrame: Q = Q(
    "q_window_frame",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = w.rowsBetween(-2, Window.currentRow)
      val xd = Det.dec(col("o_totalprice"), 2)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("running_total", sum(xd).over(run).cast("double"))
        .withColumn("moving_avg",
          sum(xd).over(mov).cast("double") / count(lit(1)).over(mov))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some(s"""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      CAST(sum(${Det.sqlDec("o_totalprice", 2)}) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_total,
      CAST(sum(${Det.sqlDec("o_totalprice", 2)}) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        / count(*) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** B22: top-3 parts by revenue within each brand (aggregate → window
    * row_number ≤ 3; revenue exact-decimal so ranking ties are stable,
    * with p_partkey as final tiebreak). */
  val topkPerGroup: Q = Q(
    "q_topk_per_group",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      // Aggregate BEFORE the join (r19, guide §2.3): p_brand is
      // functionally determined by p_partkey (part's key), so revenue
      // per (brand, partkey) ≡ revenue per partkey joined to brand —
      // the join now carries one partial-aggregated row per partkey
      // instead of every lineitem row (sf20 qprofile: the joined-then-
      // aggregated shape shuffled 1.53 GB of raw lineitem into the SMJ,
      // 233 s summed exec; decimal sums are associative-exact, so the
      // re-grouped sum is bit-identical).
      val rev = l.groupBy(col("l_partkey"))
        .agg(Det.dsum(col("l_extendedprice"), 2).as("revenue"))
        .join(p, col("l_partkey") === p("p_partkey"))
        .select(col("p_brand"), col("p_partkey"), col("revenue"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("revenue").desc, col("p_partkey").asc)
      rev.withColumn("brand_rank", row_number().over(w).cast("long"))
        .where(col("brand_rank") <= 3)
        .orderBy("p_brand", "brand_rank")
    },
    Some(s"""SELECT * FROM (
      SELECT p_brand, p_partkey, revenue,
        row_number() OVER (PARTITION BY p_brand
          ORDER BY revenue DESC, p_partkey ASC) AS brand_rank
      FROM (
        SELECT p_brand, p_partkey,
          ${Det.sqlSum("l_extendedprice", 2)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey))
    WHERE brand_rank <= 3 ORDER BY p_brand, brand_rank"""))

  /** B19b: distribution functions — ntile/percent_rank/cume_dist per
    * customer. percent_rank=(rank-1)/(n-1) and cume_dist are exact
    * rational arithmetic on identical inputs → bit-equal doubles. */
  val windowDistribution: Q = Q(
    "q_window_distribution",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .orderBy("o_custkey", "o_totalprice", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
      ntile(4) OVER w AS quartile,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
      ORDER BY o_totalprice ASC, o_orderkey ASC)
    ORDER BY o_custkey, o_totalprice, o_orderkey"""))

  /** B21b: RANGE frame over event time — per-user trailing 10-minute
    * count and sum, the sliding-metric shape that ROWS frames can't
    * express (frame membership follows the VALUE of the ordering key).
    * Ordering on epoch millis (unique per user in the fixture, but the
    * frame is tie-insensitive by construction: a RANGE frame includes
    * every row in the value interval regardless of tie order). The sum
    * runs in the exact decimal domain — a windowed double sum would be
    * accumulation-order-dependent. */
  val windowRange: Q = Q(
    "q_window_range",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
        .rangeBetween(-600000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
        .withColumn("trailing_n", count(lit(1)).over(w))
        .withColumn("trailing_sum",
          sum(Det.dec(col("value"), 2, 28)).over(w).cast("double"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
      epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value,
      count(*) OVER w AS trailing_n,
      CAST(sum(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)
        AS trailing_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP))
      RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id"""))

  /** EXT: skew-proof running aggregation — the chunked two-phase form
    * of a per-key running count/sum (engine.Skew.chunkedRunning),
    * closing SCALE.md cliff 3: a single pathological key no longer
    * serializes its whole stream through one reducer; each (key,
    * hour-chunk) sorts independently and only chunk TOTALS take a
    * per-key prefix pass. The oracle is the PLAIN running window in
    * DuckDB, so the rewrite is verified equivalent end-to-end, not
    * against its own formulation. Integer domain (count + sum of
    * event_id) keeps the check hash-exact. */
  val windowChunkedRunning: Q = Q(
    "q_window_chunked_running",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.engine.Skew.chunkedRunning(
          ev, "user_id",
          expr("unix_seconds(ts) DIV 3600"),
          Seq("ts", "event_id"), col("event_id"))
        .select(col("event_id"), col("user_id"),
          col("running_n"), col("running_sum"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
      count(*) OVER w AS running_n,
      CAST(sum(event_id) OVER w AS BIGINT) AS running_sum
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING)
    ORDER BY event_id"""))

  val all: Seq[Q] = Seq(
    windowRank, windowAnalytic, windowFrame, topkPerGroup,
    windowDistribution, windowRange, windowChunkedRunning)
}
