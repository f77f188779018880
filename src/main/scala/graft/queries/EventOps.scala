package graft.queries

import graft.Q
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events table — the funnel /
  * retention layer a product pipeline runs on top of the windowing
  * primitives (SURVEY.md §2B streaming family; these are the batch
  * investigative forms).
  *
  * Both are two-shuffle plans (per-user aggregation, then the result
  * aggregation) on the user key — no self-joins over raw events, no
  * window over the whole table, so they scale with users, not events².
  */
object EventOps {

  /** Ordered-stage funnel: signup → first click after signup → first
    * purchase after that click, counted per user bucket. Stage
    * timestamps are conditional MIN aggregates per user (one shuffle),
    * never an events×events join. */
  val eventFunnel: Q = Q(
    "q_event_funnel",
    (s, d) => {
      val ev = Tables.events(s, d)
      val stages = ev
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts")))
          .as("t_signup"))
        .join(ev.select(col("user_id"), col("event_type"), col("ts")),
          Seq("user_id"))
        .groupBy(col("user_id"), col("t_signup"))
        .agg(min(when(col("event_type") === "click"
            && col("ts") > col("t_signup"), col("ts"))).as("t_click"))
        .join(ev.select(col("user_id"), col("event_type"), col("ts")),
          Seq("user_id"))
        .groupBy(col("user_id"), col("t_signup"), col("t_click"))
        .agg(min(when(col("event_type") === "purchase"
            && col("ts") > col("t_click"), col("ts"))).as("t_purchase"))
      stages
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("t_signup")).as("n_signup"),
          count(col("t_click")).as("n_click_after_signup"),
          count(col("t_purchase")).as("n_purchase_after_click"))
        .orderBy("user_bucket")
    },
    Some("""WITH s1 AS (
      SELECT user_id,
        min(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)
          AS t_signup
      FROM events GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, s1.t_signup,
        min(CASE WHEN e.event_type = 'click'
          AND CAST(e.ts AS TIMESTAMP) > s1.t_signup
          THEN CAST(e.ts AS TIMESTAMP) END) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      GROUP BY e.user_id, s1.t_signup),
    s3 AS (
      SELECT e.user_id, s2.t_signup, s2.t_click,
        min(CASE WHEN e.event_type = 'purchase'
          AND CAST(e.ts AS TIMESTAMP) > s2.t_click
          THEN CAST(e.ts AS TIMESTAMP) END) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      GROUP BY e.user_id, s2.t_signup, s2.t_click)
    SELECT user_id % 10 AS user_bucket,
      count(*) AS n_users,
      CAST(count(t_signup) AS BIGINT) AS n_signup,
      CAST(count(t_click) AS BIGINT) AS n_click_after_signup,
      CAST(count(t_purchase) AS BIGINT) AS n_purchase_after_click
    FROM s3 GROUP BY user_bucket ORDER BY user_bucket"""))

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; n distinct users active per (cohort week, week
    * offset). Integer week arithmetic — exact in both engines. */
  val eventRetention: Q = Q(
    "q_event_retention",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      ev.join(cohort, Seq("user_id"))
        .select(col("user_id"), col("cohort_week"),
          expr("CAST(datediff(week, cohort_week) div 7 AS BIGINT)")
            .as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH ev AS (
      SELECT user_id,
        CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      FROM events),
    cohort AS (
      SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id)
    SELECT c.cohort_week,
      CAST((e.week - c.cohort_week) // 7 AS BIGINT) AS week_offset,
      count(DISTINCT e.user_id) AS n_users
    FROM ev e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY c.cohort_week, week_offset
    ORDER BY c.cohort_week, week_offset"""))

  /** EXT: SCD Type-2 history build — collapse each user's event-type
    * stream into validity intervals [valid_from, valid_to) with an
    * is_current flag: the gaps-and-islands shape (change flag via lag,
    * running sum = segment id, one group per island) every warehouse
    * dimension-history job runs. Two window passes + one aggregation,
    * all keyed on user_id — scales with users' own streams, never a
    * self-join over events. Ties inside a user's stream break on
    * event_id, so segment numbering is total-order deterministic. */
  val eventScd2: Q = Q(
    "q_event_scd2",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      // seg tie-break: two segments of one user can share valid_from
      // (equal-ts events split into segments by the event_id
      // tie-break), so ordering by valid_from alone leaves the lead()
      // assignment nondeterministic — seg alone is already a total
      // order (it numbers segments in (ts, event_id) order).
      val wSeg = Window.partitionBy(col("user_id"))
        .orderBy(col("seg"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(wOrd).isNull
            || col("event_type") =!= lag(col("event_type"), 1).over(wOrd),
            1L).otherwise(0L))
        .withColumn("seg", sum(col("chg")).over(wRun))
        .groupBy(col("user_id"), col("seg"), col("event_type"))
        .agg(min(col("ts")).as("valid_from"),
          count(lit(1)).as("n_events"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeg))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("user_id", "seg")
    },
    Some("""WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events),
    flagged AS (
      SELECT *,
        CASE WHEN lag(event_type) OVER w IS NULL
          OR event_type != lag(event_type) OVER w
          THEN 1 ELSE 0 END AS chg
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    segged AS (
      SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
      FROM flagged),
    hist AS (
      SELECT user_id, seg, event_type,
        min(ts) AS valid_from, count(*) AS n_events
      FROM segged GROUP BY user_id, seg, event_type)
    SELECT user_id, seg, event_type, valid_from,
      lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
        AS valid_to,
      n_events,
      lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
        IS NULL AS is_current
    FROM hist ORDER BY user_id, seg"""))

  /** EXT: OHLC bar aggregation — open/high/low/close of `value` per
    * (event_type, day), the time-series downsampling shape (market
    * bars, metric rollups). Open/close are ORDER-FREE aggregates:
    * min/max of struct(ts, event_id, value) — struct comparison is
    * field-lexicographic, so the min struct is exactly the row the old
    * row_number-over-(ts, event_id) form flagged, with the same tie
    * rule, and `value` rides along as payload (copied, never
    * accumulated — floats stay bit-exact under any partitioning,
    * Det.scala rule). High/low are plain MIN/MAX.
    *
    * r11 de-cliff (VERDICT r10 #3): the previous two row_number windows
    * partitioned by (event_type, day) — key cardinality grows with the
    * time span, but partition SIZE grows with per-day traffic, so one
    * hot day × one hot type serialized its whole slice through a single
    * task at 100×. Now the query is ONE partial-aggregating groupBy:
    * map-side combine shrinks each partition to one row per bar before
    * the shuffle. Struct-ordered min/max plans as SortAggregate (struct
    * buffers aren't hash-agg compatible) — the sort is a LOCAL per-map-
    * split sort by the group key, parallel everywhere, nothing like the
    * window's one-task slice sort (PlanSpec pins window-free +
    * partial/final; the DuckDB oracle keeps the plain row_number form,
    * so the rewrite is verified end-to-end). */
  val eventOhlc: Q = Q(
    "q_event_ohlc",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"))
      ev.groupBy(col("event_type"), col("day"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("value"))).as("__o"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("__c"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("day"),
          col("__o.value").as("open"), col("high"), col("low"),
          col("__c.value").as("close"), col("n_events"))
        .orderBy("event_type", "day")
    },
    Some("""WITH e AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        CAST(ts AS TIMESTAMP) AS ts, event_id, value
      FROM events),
    r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, day
          ORDER BY ts, event_id) AS rn_o,
        row_number() OVER (PARTITION BY event_type, day
          ORDER BY ts DESC, event_id DESC) AS rn_c
      FROM e)
    SELECT event_type, day,
      max(CASE WHEN rn_o = 1 THEN value END) AS open,
      max(value) AS high, min(value) AS low,
      max(CASE WHEN rn_c = 1 THEN value END) AS close,
      count(*) AS n_events
    FROM r GROUP BY event_type, day ORDER BY event_type, day"""))

  /** EXT: gap-filling forward interpolation — a dense (user, day) grid
    * where each day carries the user's last observed value (LOCF, the
    * metric-dashboard / feature-store fill). The spine is users ×
    * date-range (a broadcast of the two scalar bounds, never an
    * events-sized cross join), the per-day observation is a row_number
    * top-1 (deterministic on ties), and the fill itself is
    * last(ignoreNulls) over the user-keyed window — values are COPIED,
    * never accumulated, so floats stay bit-exact. Scales with
    * users × days, keyed on user. */
  val eventFfill: Q = Q(
    "q_event_ffill",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"))
      val wLast = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = ev.withColumn("rn", row_number().over(wLast))
        .where(col("rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("obs"))
      val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val wFill = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("obs"), ignoreNulls = true).over(wFill)
            .as("value_ffill"),
          col("obs").isNotNull.as("is_observed"))
        .orderBy("user_id", "day")
    },
    Some("""WITH e AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        CAST(ts AS TIMESTAMP) AS ts, event_id, value
      FROM events),
    daily AS (
      SELECT user_id, day, value AS obs FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, day
          ORDER BY ts DESC, event_id DESC) AS rn
        FROM e) WHERE rn = 1),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
    spine AS (
      SELECT u.user_id,
        CAST(unnest(generate_series(CAST(b.d0 AS TIMESTAMP),
          CAST(b.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM e) u, bounds b)
    SELECT s.user_id, s.day,
      last_value(d.obs IGNORE NULLS) OVER (PARTITION BY s.user_id
        ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS value_ffill,
      d.obs IS NOT NULL AS is_observed
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    ORDER BY s.user_id, s.day"""))

  /** EXT: gap-based sessionization with per-session stats — the batch
    * form every product-analytics pipeline runs (q_stream_session's
    * `session_window` twin, but with session SEQUENCE numbers and
    * duration/bounce stats, which session_window does not expose).
    * Same gaps-and-islands machinery as q_event_scd2, the island
    * boundary being a >30-minute silence instead of an event-type
    * change. All integer domain (unix-second diffs), keyed per user —
    * scales with each user's own stream. */
  val eventSessions: Q = Q(
    "q_event_sessions",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap",
          when(lag(col("ts"), 1).over(wOrd).isNull
            || unix_seconds(col("ts"))
              - unix_seconds(lag(col("ts"), 1).over(wOrd)) > 1800L,
            1L).otherwise(0L))
        .withColumn("session_seq", sum(col("gap")).over(wRun))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          count(lit(1)).as("n_events"),
          (unix_seconds(max(col("ts")))
            - unix_seconds(min(col("ts")))).as("duration_sec"),
          (count(lit(1)) === 1).as("is_bounce"))
        .orderBy("user_id", "session_seq")
    },
    Some("""WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
    flagged AS (
      -- date_diff('second', a, b) counts second-boundary crossings =
      -- floor(epoch(b)) - floor(epoch(a)), matching Spark's
      -- unix_seconds subtraction (bare epoch() here is FRACTIONAL and
      -- would disagree on sub-second gaps around the threshold)
      SELECT *,
        CASE WHEN lag(ts) OVER w IS NULL
          OR date_diff('second', lag(ts) OVER w, ts) > 1800
          THEN 1 ELSE 0 END AS gap
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
      SELECT *, CAST(sum(gap) OVER (PARTITION BY user_id
        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        AS session_seq
      FROM flagged)
    SELECT user_id, session_seq, count(*) AS n_events,
      CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
        AS duration_sec,
      count(*) = 1 AS is_bounce
    FROM sessioned GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq"""))

  /** EXT: path/transition analysis — the event-type transition matrix
    * over per-user streams (user-journey analytics beside funnel /
    * retention / SCD2): one lag window per user gives consecutive
    * (from, to) steps, one keyed agg counts them, and the share is
    * derived per origin state. Same one-key scale shape as the rest of
    * the family: windows and aggs on user_id / event_type — never an
    * events×events join. Share is an exact integer ratio cast once, so
    * parity is bit-exact. */
  val eventTransitions: Q = Q(
    "q_event_transitions",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wFrom = Window.partitionBy(col("from_type"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share",
          col("n").cast("double") / sum(col("n")).over(wFrom))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH steps AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS from_type,
        event_type AS to_type
      FROM events),
    c AS (
      SELECT from_type, to_type, count(*) AS n
      FROM steps WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
      CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS share
    FROM c ORDER BY from_type, to_type"""))

  /** EXT: per-user z-score anomaly counts — monitoring's workhorse
    * (which users' purchase amounts have outliers vs their own
    * history?). Two-pass: exact decimal moments per user (value has 2
    * true decimals so Σv is exact at scale 2 and Σv² at scale 4 —
    * order-independent in both engines, the Det discipline), then the
    * events re-join their user's (n, Σv, Σv²) and |v − mean| > 2σ is a
    * per-row IEEE expression on identical doubles. Both shuffles key on
    * user_id, so the join is co-partitioned with the aggregation — one
    * exchange each side, no window over the table. Sample variance;
    * users with < 5 purchases are excluded (z-scores on tiny n are
    * noise). */
  val eventAnomaly: Q = Q(
    "q_event_anomaly",
    (s, d) => {
      val ev = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("value"))
      val st = ev.groupBy(col("user_id")).agg(
        count(lit(1)).as("n"),
        Det.dsum(col("value"), 2).as("s1"),
        Det.dsum(col("value") * col("value"), 4).as("s2"))
        .where(col("n") >= 5)
      val mean = col("s1") / col("n")
      val varS = (col("s2") - col("s1") * col("s1") / col("n")) /
        (col("n") - 1)
      ev.join(st, "user_id")
        .select(col("user_id"), col("n"), col("value"),
          mean.as("mean"), varS.as("var_s"))
        .groupBy(col("user_id"))
        .agg(
          first(col("n")).as("n_purchases"),
          count(when(col("var_s") > 0 &&
            abs(col("value") - col("mean")) / sqrt(col("var_s")) > 2.0,
            1)).as("n_outliers"),
          // NOT rounded: s1/n is the same IEEE double in both engines
          // (exact decimal sum / integer count), but rounding it can
          // land on an exact .xxxx5 (s1=563.81, n=8 → 70.47625) where
          // Spark's HALF_UP and DuckDB's double-round disagree — the
          // raw double is the deterministic form.
          first(col("mean")).as("mean_value"))
        .orderBy("user_id")
    },
    Some(s"""WITH ev AS (
      SELECT user_id, value FROM events WHERE event_type = 'purchase'),
    st AS (
      SELECT user_id, count(*) AS n,
        ${Det.sqlSum("value", 2)} AS s1,
        ${Det.sqlSum("value*value", 4)} AS s2
      FROM ev GROUP BY user_id HAVING count(*) >= 5)
    SELECT e.user_id, any_value(n) AS n_purchases,
      count(*) FILTER (WHERE (s2 - s1*s1/n)/(n-1) > 0 AND
        abs(value - s1/n) / sqrt((s2 - s1*s1/n)/(n-1)) > 2.0)
        AS n_outliers,
      any_value(s1/n) AS mean_value
    FROM ev e JOIN st USING (user_id)
    GROUP BY e.user_id ORDER BY user_id"""))

  /** EXT: last-touch attribution — marketing analytics' workhorse:
    * each purchase is credited to the user's most recent preceding
    * view within a 7-day lookback. Declared as the scalable window
    * shape (the same merge the native as-of join performs, expressed
    * over a union'd per-user stream): one shuffle on user_id, one
    * ordered pass; the last-view carry is two last(... ignoreNulls)
    * columns over (ts, event_id) order — both resolve from the SAME
    * row because they share the ordering. A purchase with no view, or
    * whose last view is older than 7 days, is unattributed (NULLs).
    * Tie rule: a view at the purchase's exact timestamp counts only if
    * its event_id is smaller (the (ts, event_id) total order). */
  val eventAttribution: Q = Q(
    "q_event_attribution",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val LookbackUs = 7L * 86400L * 1000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = Tables.events(s, d)
        .where(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"))
      ev
        .withColumn("view_id", last(
          when(col("event_type") === "view", col("event_id")), true).over(w))
        .withColumn("view_ts", last(
          when(col("event_type") === "view", col("ts")), true).over(w))
        .where(col("event_type") === "purchase")
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(col("view_ts")))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("gap_us") <= LookbackUs, col("view_id"))
            .as("attr_view_id"),
          when(col("gap_us") <= LookbackUs, col("gap_us")).as("gap_us"),
          (when(col("gap_us") <= LookbackUs, col("view_id"))
            .isNotNull).as("is_attributed"))
        .orderBy("event_id")
    },
    Some("""WITH ev AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events WHERE event_type IN ('view', 'purchase')),
    carried AS (
      SELECT *,
        last_value(CASE WHEN event_type = 'view' THEN event_id END
          IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_id,
        last_value(CASE WHEN event_type = 'view' THEN ts END
          IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_ts
      FROM ev),
    p AS (
      SELECT event_id, user_id, ts,
        epoch_us(ts) - epoch_us(view_ts) AS gap_us, view_id
      FROM carried WHERE event_type = 'purchase')
    SELECT event_id, user_id, ts,
      CASE WHEN gap_us <= 604800000000 THEN view_id END AS attr_view_id,
      CASE WHEN gap_us <= 604800000000 THEN gap_us END AS gap_us,
      CASE WHEN gap_us <= 604800000000 THEN view_id END IS NOT NULL
        AS is_attributed
    FROM p ORDER BY event_id"""))

  /** EXT: top event paths — the most frequent 3-step behavior
    * sequences across users (the path-analysis query behind "how do
    * users reach purchase?"), generalizing [[eventTransitions]]'s
    * bigrams to trigrams with a global top-k. Two lags over the same
    * per-user (ts, event_id) window share ONE user-key shuffle and one
    * sort; the trigram aggregate then collapses to ≤ |types|³ rows
    * (125 here) before the top-20, which is a TakeOrderedAndProject
    * over the tiny aggregate — the events table is never globally
    * sorted. Ties rank deterministically by the path itself. */
  val eventPaths: Q = Q(
    "q_event_paths",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("step1", lag(col("event_type"), 2).over(w))
        .withColumn("step2", lag(col("event_type"), 1).over(w))
        .where(col("step1").isNotNull)
        .groupBy(col("step1"), col("step2"),
          col("event_type").as("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(20)
    },
    Some("""WITH steps AS (
      SELECT
        lag(event_type, 2) OVER (PARTITION BY user_id
          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS step1,
        lag(event_type, 1) OVER (PARTITION BY user_id
          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS step2,
        event_type AS step3
      FROM events)
    SELECT step1, step2, step3, count(*) AS n
    FROM steps WHERE step1 IS NOT NULL
    GROUP BY step1, step2, step3
    ORDER BY n DESC, step1, step2, step3 LIMIT 20"""))

  /** EXT (r14): LINEAR interpolation on the user×day grid — the
    * metric-backfill companion to [[eventFfill]]'s LOCF: between two
    * observed days the filled value moves along the straight line
    * between the observations (the standard time-series `interpolate
    * (method='linear')`), outside them it stays null and is labeled
    * `edge`. Same scale shape as ffill (spine = users × broadcast date
    * bounds, one user-keyed window pass each direction); prev/next
    * observation values AND days carry via
    * last/first(ignoreNulls) over the asymmetric frames. Float
    * discipline: both engines evaluate the IDENTICAL IEEE sequence
    * `prev + (next − prev) · (gapPos / gapLen)` on the same doubles —
    * each op correctly rounded, same operand order — with round(6)
    * guarding the final ulp (the q_agg_corr rule). */
  val eventInterpolate: Q = Q(
    "q_event_interpolate",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .where(col("value").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"))
      val wLast = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = ev.withColumn("rn", row_number().over(wLast))
        .where(col("rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("obs"))
      val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val wBack = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val g = spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), col("obs"),
          last(col("obs"), ignoreNulls = true).over(wBack).as("prev"),
          last(when(col("obs").isNotNull, col("day")), ignoreNulls = true)
            .over(wBack).as("prev_day"),
          first(col("obs"), ignoreNulls = true).over(wFwd).as("next"),
          first(when(col("obs").isNotNull, col("day")), ignoreNulls = true)
            .over(wFwd).as("next_day"))
      g.select(col("user_id"), col("day"),
        round(
          when(col("obs").isNotNull, col("obs"))
            .when(col("prev").isNotNull && col("next").isNotNull,
              col("prev") + (col("next") - col("prev"))
                * (datediff(col("day"), col("prev_day")).cast("double")
                  / datediff(col("next_day"), col("prev_day"))
                    .cast("double"))), 6).as("value_interp"),
        when(col("obs").isNotNull, "observed")
          .when(col("prev").isNotNull && col("next").isNotNull, "interp")
          .otherwise("edge").as("kind"))
        .orderBy("user_id", "day")
    },
    Some("""WITH e AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        CAST(ts AS TIMESTAMP) AS ts, event_id, value
      FROM events WHERE value IS NOT NULL),
    daily AS (
      SELECT user_id, day, value AS obs FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, day
          ORDER BY ts DESC, event_id DESC) AS rn
        FROM e) WHERE rn = 1),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
    spine AS (
      SELECT u.user_id,
        CAST(unnest(generate_series(CAST(b.d0 AS TIMESTAMP),
          CAST(b.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM e) u, bounds b),
    g AS (
      SELECT s.user_id, s.day, d.obs,
        last_value(d.obs IGNORE NULLS) OVER (PARTITION BY s.user_id
          ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS prev,
        last_value(CASE WHEN d.obs IS NOT NULL THEN s.day END IGNORE NULLS)
          OVER (PARTITION BY s.user_id
            ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS prev_day,
        first_value(d.obs IGNORE NULLS) OVER (PARTITION BY s.user_id
          ORDER BY s.day ROWS BETWEEN CURRENT ROW
            AND UNBOUNDED FOLLOWING) AS next,
        first_value(CASE WHEN d.obs IS NOT NULL THEN s.day END IGNORE NULLS)
          OVER (PARTITION BY s.user_id
            ORDER BY s.day ROWS BETWEEN CURRENT ROW
              AND UNBOUNDED FOLLOWING) AS next_day
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day)
    SELECT user_id, day,
      round(CASE
        WHEN obs IS NOT NULL THEN obs
        WHEN prev IS NOT NULL AND next IS NOT NULL THEN
          prev + (next - prev)
            * (CAST(day - prev_day AS DOUBLE)
              / CAST(next_day - prev_day AS DOUBLE))
        END, 6) AS value_interp,
      CASE WHEN obs IS NOT NULL THEN 'observed'
           WHEN prev IS NOT NULL AND next IS NOT NULL THEN 'interp'
           ELSE 'edge' END AS kind
    FROM g ORDER BY user_id, day"""))

  /** EXT (r14): sequence-pattern matching over per-user event journeys
    * — the MATCH_RECOGNIZE shape (SQL:2016 row-pattern recognition,
    * which Spark does not ship): each user's events are ordered into a
    * one-char-per-event journey string (C=click V=view P=purchase
    * S=signup E=error) and a regex counts non-overlapping occurrences
    * of click → any views → purchase (`CV*P`). Funnels ([[eventFunnel]])
    * ask "did steps happen in order, ever"; this asks "how many times
    * did the CONTIGUOUS motif fire", which funnels and lag-windows
    * ([[eventPaths]], fixed arity) cannot express — quantifiers need a
    * state machine, and a regex over the materialized journey IS that
    * state machine.
    *
    * Scale: one user-keyed shuffle; the collect_list state is bounded
    * by the per-entity event count (the same bounded-sequence premise
    * as [[eventSessions]]/[[eventPaths]] — journeys are session-scale,
    * not corpus-scale), and partials combine map-side, so the shuffle
    * moves ≤ one journey per user per map split. The regex runs once
    * per user over a bounded string — no cross-row state survives it.
    * Determinism: order inside the journey is (ts, event_id) via a
    * struct array_sort (field-order lexicographic), unique by event_id.
    * Both engines scan non-overlapping leftmost with greedy `V*`
    * (java.util.regex find-loop ≡ RE2 FindAll on this pattern — no
    * backrefs, no lookaround, match can never be empty). */
  val eventPattern: Q = Q(
    "q_event_pattern",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "click", "C")
            .when(col("event_type") === "view", "V")
            .when(col("event_type") === "purchase", "P")
            .when(col("event_type") === "signup", "S")
            .otherwise("E").as("c"))
      ev.groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          concat_ws("",
            transform(
              array_sort(collect_list(
                struct(col("ts"), col("event_id"), col("c")))),
              x => x.getField("c"))).as("journey"))
        .select(col("user_id"), col("n_events"),
          size(regexp_extract_all(col("journey"), lit("CV*P"), lit(0)))
            .cast("long").as("n_matches"))
        .orderBy("user_id")
    },
    Some("""WITH j AS (
      SELECT user_id, count(*) AS n_events,
        string_agg(CASE event_type
            WHEN 'click' THEN 'C' WHEN 'view' THEN 'V'
            WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
            ELSE 'E' END, ''
          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS journey
      FROM events GROUP BY user_id)
    SELECT user_id, n_events,
      CAST(len(regexp_extract_all(journey, 'CV*P')) AS BIGINT) AS n_matches
    FROM j ORDER BY user_id"""))

  /** EXT (r14): trailing-7-day active users per day (WAU-by-day) — the
    * engagement staple alongside [[eventRetention]]'s cohort grid. The
    * naive form is a per-day DISTINCT over a 7-day self-join (or a
    * sliding `count(DISTINCT)` window, which no engine distributes):
    * days × active-users pair blowup. The scale form inverts it as
    * COVER EXPLOSION: each distinct (user, day) activity contributes
    * membership to the 7 report days it covers — one constant-factor
    * explode (×7), then one keyed distinct aggregate. Linear in
    * activity, keyed shuffles only, map-side partial distinct; the
    * window length is a plan constant (7× map fan-out), not a join
    * arm. Report days are clipped to the observed [min+6, max] range
    * so every emitted day has a full trailing week (partial-window
    * edge days would under-count). Counts and dates — exact in both
    * engines by construction. */
  val eventRollingActive: Q = Q(
    "q_event_rolling_active",
    (s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
      val bounds = act.agg(
        date_add(min(col("day")), 6).as("first_full"),
        max(col("day")).as("last_day"))
      act
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6)))
            .as("report_day"))
        .groupBy(col("report_day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .join(broadcast(bounds),
          col("report_day").between(col("first_full"), col("last_day")))
        .select(col("report_day"), col("wau"))
        .orderBy("report_day")
    },
    Some("""WITH act AS (
      SELECT DISTINCT user_id,
        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
      FROM events),
    bounds AS (
      SELECT min(day) + 6 AS first_full, max(day) AS last_day FROM act),
    cover AS (
      SELECT user_id,
        CAST(unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS DATE)
          AS report_day
      FROM act)
    SELECT report_day, count(DISTINCT user_id) AS wau
    FROM cover JOIN bounds
      ON report_day BETWEEN first_full AND last_day
    GROUP BY report_day ORDER BY report_day"""))

  val all: Seq[Q] = Seq(eventFunnel, eventRetention, eventScd2,
    eventTransitions, eventOhlc, eventFfill, eventSessions, eventAnomaly,
    eventAttribution, eventPaths, eventInterpolate, eventPattern,
    eventRollingActive)
}
