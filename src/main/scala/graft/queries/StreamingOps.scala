package graft.queries

import graft.Q
import graft.engine.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over events (SURVEY.md §2B B38–B42).
  *
  * The same `window`/`session_window` expressions run unchanged under
  * Structured Streaming (`readStream` + watermark — see
  * graft.streaming.StreamingJobs and its MemoryStream specs); these
  * batch-parity forms are the oracle-checkable half. DuckDB mirrors use
  * time_bucket (whose 2000-01-03 origin coincides with epoch alignment
  * for sub-day widths) and gaps-and-islands for sessionization.
  */
object StreamingOps {

  /** B38: tumbling 1h windows per event type. */
  val streamTumbling: Q = Q(
    "q_stream_tumbling",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsum(col("value"), 4).as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "event_type"),
    Some(s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
        AS w_start,
      event_type, count(*) AS n, ${Det.sqlSum("value", 4)} AS sum_value
    FROM events GROUP BY w_start, event_type
    ORDER BY w_start, event_type"""))

  /** B39: sliding 1h windows every 15 min — each event lands in 4
    * windows; the oracle expands them with an explicit offset list. */
  val streamSliding: Q = Q(
    "q_stream_sliding",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value"), 4).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy("w_start"),
    Some(s"""SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        - k * INTERVAL '15 minutes' AS w_start,
      count(*) AS n, ${Det.sqlSum("value", 4)} AS sum_value
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
    GROUP BY w_start ORDER BY w_start"""))

  /** B40: session windows (30-minute gap) per user — batch
    * `session_window`, mirrored by gaps-and-islands SQL. Session end is
    * last event + gap, Spark's semantics. */
  val streamSession: Q = Q(
    "q_stream_session",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          Det.dsum(col("value"), 4).as("sum_value"))
        .select(
          col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
    Some(s"""WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    marked AS (
      SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
          THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sessions AS (
      SELECT user_id, ts, value,
        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, min(ts) AS session_start,
      max(ts) + INTERVAL 30 MINUTE AS session_end,
      count(*) AS n_events, ${Det.sqlSum("value", 4)} AS sum_value
    FROM sessions GROUP BY user_id, sid
    ORDER BY user_id, session_start"""))

  /** B42 batch parity: keyed dedup state — earliest event per
    * (user, event_type), the batch form of
    * dropDuplicatesWithinWatermark. */
  val streamDedupState: Q = Q(
    "q_stream_dedup_state",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("ts").as("first_ts"), col("event_id").as("first_event_id"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, ts AS first_ts,
      event_id AS first_event_id
    FROM (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        row_number() OVER (PARTITION BY user_id, event_type
          ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS rn
      FROM events)
    WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** B43 batch parity: the stream-stream interval join's predicate as
    * a plain batch interval join — clicks within 5 minutes before each
    * error, same user (StreamingJobs.clicksBeforeErrors runs this
    * with watermarks on both sides; StreamingSpec proves the parity).
    * The time-range equi+theta join is finite-state in streaming for
    * exactly the reason it's shuffle-bounded in batch: the equi key
    * (user) partitions, the interval bounds the pairing. */
  val streamJoin: Q = Q(
    "q_stream_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("click_ts"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("ts").as("error_ts"))
      errors.join(clicks, expr(
        """c_user = user_id
           AND click_ts >= error_ts - INTERVAL 5 MINUTES
           AND click_ts < error_ts"""))
        .select(col("user_id"), col("error_id"), col("error_ts"),
          col("click_id"), col("click_ts"))
        .orderBy("user_id", "error_id", "click_id")
    },
    Some("""SELECT e.user_id AS user_id, e.event_id AS error_id,
      CAST(e.ts AS TIMESTAMP) AS error_ts,
      c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
    FROM events e JOIN events c
      ON c.user_id = e.user_id
      AND e.event_type = 'error' AND c.event_type = 'click'
      AND CAST(c.ts AS TIMESTAMP)
        >= CAST(e.ts AS TIMESTAMP) - INTERVAL 5 MINUTE
      AND CAST(c.ts AS TIMESTAMP) < CAST(e.ts AS TIMESTAMP)
    ORDER BY user_id, error_id, click_id"""))

  /** EXT: stream-static enrichment join — the canonical streaming
    * lookup shape (event stream ⋈ broadcast dimension, then windowed
    * agg). Stateless on the join itself (only the windowed agg holds
    * state), so the dim can be arbitrarily refreshed between
    * micro-batches. Streaming twin: StreamingJobs.enrichedTumbling
    * (same expressions behind a watermark, StreamingSpec-verified). */
  val streamStaticJoin: Q = Q(
    "q_stream_static_join",
    (s, d) =>
      Tables.events(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("user_id") === col("c_custkey"))
        .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsum(col("value"), 4).as("sum_value"))
        .select(col("window.start").as("w_start"), col("c_mktsegment"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "c_mktsegment"),
    Some(s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
        AS w_start,
      c_mktsegment, count(*) AS n, ${Det.sqlSum("value", 4)} AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY w_start, c_mktsegment
    ORDER BY w_start, c_mktsegment"""))

  val all: Seq[Q] = Seq(
    streamTumbling, streamSliding, streamSession, streamDedupState,
    streamJoin, streamStaticJoin)
}
