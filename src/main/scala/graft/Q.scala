package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query.
  *
  * @param name   stable query name (key in `SparkEntry.queries`)
  * @param fn     (session, scale-factor dir) => result DataFrame. Every
  *               declared query is deterministic: explicit ORDER BY on a
  *               unique key, UTC session time, no nondeterministic fns.
  * @param oracle equivalent DuckDB SQL over the same parquet tables
  *               (None = not SQL-expressible; driver records a weaker
  *               rows-only check and a ScalaTest spec covers semantics).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Central registry; `SparkEntry` exposes exactly this. */
object Registry {
  // duplicate names would silently drop operators in SparkEntry's
  // toMap — fail fast on every access path, not just byName
  lazy val all: Seq[Q] = {
    val qs = modules
    val names = qs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    qs
  }

  private def modules: Seq[Q] =
    queries.Aggregates.all ++
      queries.Relational.all ++
      queries.Windows.all ++
      queries.ScalarFns.all ++
      queries.RefOps.all ++
      queries.TextOps.all ++
      queries.Similarity.all ++
      queries.DedupOps.all ++
      queries.IncrementalDedup.all ++
      queries.StreamingOps.all ++
      queries.MultimodalOps.all ++
      queries.SqlQueries.all ++
      queries.PipelineOps.all ++
      queries.AnnOps.all ++
      queries.EventOps.all ++
      queries.CurationOps.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
