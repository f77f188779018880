package graft

import org.apache.spark.sql.SparkSession

/** Proves the `spark.sql.extensions` registration path end-to-end: a
  * session built WITH GraftExtensions resolves `cosine_sim` from plain
  * SQL with no manual registration, and the conf propagates to sibling
  * sessions (each sibling's OWN registry is initialized from the conf
  * at construction — the cluster behavior where every session a user
  * opens against the deployment sees the engine's functions).
  */
class ExtensionsSpec extends SparkSpec {

  test("sibling sessions inherit the conf'd extensions in their own registry") {
    // The suite session carries spark.sql.extensions=graft.GraftExtensions
    // (same shape as the Verify/Bench sessions), so a newSession() —
    // fresh function registry, shared context — must re-resolve the
    // functions from the conf, not from manual registration.
    val sibling = spark.newSession()
    assert(sibling.sql(
      "SELECT sorted_intersect_count(array(1L,2L), array(2L,3L)) AS n")
      .head.getLong(0) == 1L)
    // ...and the planner strategy too: the custom as-of node plans.
    import sibling.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("rk", "rt")
    assert(graft.plans.Asof.join(l, r, "k", "rk", "t", "rt").count() == 1L)
  }

  test("session built with GraftExtensions resolves cosine_sim from SQL") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // Reuses the suite's SparkContext; extensions apply to the new
      // session's own function registry at construction.
      val ext = SparkSession.builder()
        .withExtensions(new GraftExtensions).getOrCreate()
      val v = ext.sql(
        """SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c"""
          .stripMargin).head.getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
      assert(ext.sql("SELECT sorted_intersect_count(array(1L,2L), array(2L,3L)) AS n")
        .head.getLong(0) == 1L)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
