package graft

import org.apache.spark.sql.SparkSession

/** The one session recipe shared by every entry point (Bench, BenchOne,
  * Verify, Run, Explain, test suites). Centralized so session-scoped
  * invariants hold everywhere by construction:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: `events.parquet` is
  *    TIMESTAMP(NANOS), which Spark's vectorized reader rejects without
  *    this flag. It is set HERE, at construction, and nowhere else —
  *    r5 set it inside `Tables.events`, and that mid-session flip of a
  *    session-global was a spooky-action hazard realized: the bench
  *    warm-up's raw reads ran before any `Tables.events` call, crashed
  *    on the nanos type, and left three tables cold (VERDICT r5).
  *  - shuffle partitions sized to the local core count, not the 200
  *    default (local-mode stand-in for cluster-side AQE sizing).
  *  - UTC session tz: oracle parity depends on it.
  *  - the graft extension set (native functions, optimizer rules, the
  *    as-of join strategy, SQL parser extension).
  */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
