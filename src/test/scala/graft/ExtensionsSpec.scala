package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}

/** Proves the `spark.sql.extensions` registration path end-to-end: a
  * session built WITH GraftExtensions resolves `cosine_sim` from plain
  * SQL with no manual registration, and a plain sibling session does
  * not (per-session catalogs, no cross-leakage).
  */
class ExtensionsSpec extends SparkSpec {

  test("plain sibling session does not see the native functions") {
    val plain = spark.newSession()
    intercept[AnalysisException] {
      plain.sql("""SELECT cosine_sim(array(CAST(1.0 AS FLOAT)),
        |array(CAST(1.0 AS FLOAT)))""".stripMargin).collect()
    }
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
