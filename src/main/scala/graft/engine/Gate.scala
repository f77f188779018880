package graft.engine

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality GATES that free-ride the job's own pass —
  * `Dataset.observe` + `Observation` (the AccumulatorV2-backed
  * observed-metrics API).
  *
  * The naive quality gate runs a second aggregation job over the
  * input ("count the nulls, then run the pipeline") — at 100 TB that
  * is a full extra scan per rule set. `observe` attaches the metric
  * aggregates to the SAME physical plan: they are computed by the
  * tasks that already stream the rows for the real action, cost
  * ~zero, and arrive on the driver when the action finishes. The
  * check-then-act becomes act-and-check: run the write, then fail the
  * job (and quarantine the output) if the observed metrics violate
  * the contract — the same "verify then act" posture as the
  * reference's restore-check (backup.sh:264-299), paid for by zero
  * extra passes.
  *
  * Constraint worth knowing: observed metrics must be aggregates
  * without reference to non-deterministic / distinct functions, and
  * an `Observation` instance binds to ONE action — create per run.
  */
object Gate {

  /** The standard corpus-ingest rule set over a documents-shaped
    * input: row count, null keys, empty payloads, byte volume. */
  def corpusMetrics: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_rows"),
    count(when(col("doc_id").isNull, 1)).as("null_ids"),
    count(when(length(col("text")) === 0, 1)).as("empty_docs"),
    sum(col("n_chars")).cast("long").as("total_chars"))

  /** Attach `metrics` to `df` under a fresh Observation; run your
    * action on the returned frame, then [[require_]] the observation.
    * @return (instrumented frame, observation to read after the action) */
  def observed(
      df: DataFrame, name: String,
      metrics: Seq[org.apache.spark.sql.Column]): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Post-action contract check: throws with the full metric row in
    * the message when `rule` rejects it — the gate a pipeline wires
    * between "output written to staging" and "output published". */
  def require_(
      obs: Observation,
      rule: Map[String, Any] => Boolean): Map[String, Any] = {
    val row = obs.get
    if (!rule(row)) throw new IllegalStateException(
      s"data-quality gate '${obs.name}' rejected the run: $row")
    row
  }

  /** STREAMING form (r14): attach the metric aggregates by NAME — an
    * `Observation` object binds to one batch action, but a stream
    * emits one observed row PER MICRO-BATCH, surfaced in each
    * `StreamingQueryProgress.observedMetrics`. Same zero-extra-pass
    * economics: the tasks already streaming the batch compute the
    * aggregates, so a 100 TB streaming ingest gets per-batch quality
    * telemetry for free. */
  def observedStream(
      df: DataFrame, name: String,
      metrics: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.observe(name, metrics.head, metrics.tail: _*)

  /** Per-batch gate over a streaming query's progress: every batch's
    * observed row for `name` is checked against `rule`; the first
    * violating batch fails loudly with its batch id and metric row
    * (the foreachBatch publisher pairs this with quarantining that
    * batch's staging output). Returns the per-batch metric rows in
    * batch order for telemetry. */
  def requireStream(
      query: org.apache.spark.sql.streaming.StreamingQuery, name: String,
      rule: Map[String, Any] => Boolean): Seq[Map[String, Any]] =
    query.recentProgress.toSeq
      .flatMap { p =>
        Option(p.observedMetrics.get(name)).map { row =>
          val m = row.schema.fieldNames.zip(row.toSeq).toMap[String, Any]
          (p.batchId, m)
        }
      }
      .sortBy(_._1)
      .map { case (batchId, m) =>
        if (!rule(m)) throw new IllegalStateException(
          s"streaming data-quality gate '$name' rejected batch $batchId: $m")
        m
      }
}
