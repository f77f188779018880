package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run
  * in the same forked test JVM). sf0.001 keeps specs fast; DuckDB-oracle
  * parity at sf0.01 is the driver's job, not the unit tests'. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf = "/root/testdata/sf0.001"
  def q(name: String): org.apache.spark.sql.DataFrame =
    Registry.byName(name).fn(spark, sf)
}

object SparkSpec {
  // Sessions.local = the exact recipe Verify/Bench use (extensions, UTC,
  // nanosAsLong at construction) — specs exercise the same session shape
  // the driver runs.
  lazy val session: SparkSession = Sessions.local("4", "graft-test")
}
