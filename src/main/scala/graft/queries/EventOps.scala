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

  val all: Seq[Q] = Seq(eventFunnel, eventRetention)
}
