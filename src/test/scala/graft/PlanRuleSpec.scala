package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The ThresholdLevenshtein optimizer rule: plain `levenshtein(a,b)<=k`
  * predicates become the early-exit threshold form — checked at the
  * rule level, through SparkSessionExtensions injection, and for
  * semantic equivalence on data with pairs on both sides of the bound.
  *
  * Fixtures derive strings from `range` (not a literal Seq) because the
  * optimizer's ConvertToLocalRelation would otherwise evaluate the
  * whole filter at plan time and leave no Levenshtein to inspect.
  */
class PlanRuleSpec extends SparkSpec {

  // strings "s0".."s9" + a tail that differs at one position for even ids
  private def pairs(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    s.range(0, 10).select(
      concat(lit("name_"), col("id")).as("a"),
      concat(lit("name_"),
        when(col("id") % 2 === 0, col("id").cast("string"))
          .otherwise(lit("X"))).as("b"))
  }

  private def levThresholds(plan: LogicalPlan): Seq[Option[String]] = {
    val found = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    plan.foreach(_.expressions.foreach(_.foreach {
      case l: Levenshtein => found += l.threshold.map(_.toString)
      case _ =>
    }))
    found.toSeq
  }

  test("rule rewrites <=, <, mirrored forms; leaves negatives alone") {
    val df = pairs(spark)
    def opt(cond: String): LogicalPlan =
      graft.plans.ThresholdLevenshtein(
        df.where(cond).queryExecution.optimizedPlan)
    assert(levThresholds(opt("levenshtein(a, b) <= 3")) == Seq(Some("3")))
    assert(levThresholds(opt("3 >= levenshtein(a, b)")) == Seq(Some("3")))
    assert(levThresholds(opt("levenshtein(a, b) < 3")) == Seq(Some("2")))
    assert(levThresholds(opt("3 > levenshtein(a, b)")) == Seq(Some("2")))
    // negative bound, non-literal bound, and >= direction stay untouched
    assert(levThresholds(opt("levenshtein(a, b) <= -1")) == Seq(None))
    assert(levThresholds(opt("levenshtein(a, b) >= 2")) == Seq(None))
  }

  test("injected via extensions, the rewrite fires and preserves results") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new GraftExtensions).getOrCreate()
      val q = pairs(ext).where("levenshtein(a, b) <= 0")
      assert(levThresholds(q.queryExecution.optimizedPlan)
        == Seq(Some("0")),
        "extension-injected rule must rewrite the plain predicate")
      // ids 0,2,4,6,8 have a == b (distance 0); odd ids differ
      assert(q.count() == 5)
      // equivalence against the un-rewritten form in the plain session
      assert(pairs(spark).where("levenshtein(a, b) <= 0").count() == 5)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
