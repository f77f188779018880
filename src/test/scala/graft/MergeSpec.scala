package graft

import org.apache.spark.sql.functions._

import graft.engine.Snapshot

/** MERGE INTO semantics (Snapshot.applyChangelog) and the plan property
  * that makes it viable at 100 TB: the base table is never shuffled —
  * touched keys broadcast into an anti-join and upserts union in.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40)
  ).toDF("k", "name", "v")

  test("update, delete, insert, and untouched rows in one batch") {
    val changes = Seq(
      (2L, "b2", 21, "U"), // update existing
      (3L, "c", 30, "D"),  // delete existing
      (9L, "z", 90, "U"),  // insert new key
      (8L, "x", 80, "D")   // delete of a missing key is a no-op
    ).toDF("k", "name", "v", "op")
    val out = Snapshot.applyChangelog(base, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, String, Int)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 10), (2L, "b2", 21), (4L, "d", 40), (9L, "z", 90)))
  }

  test("empty changelog returns the base unchanged") {
    val none = Seq.empty[(Long, String, Int, String)]
      .toDF("k", "name", "v", "op")
    assert(Snapshot.applyChangelog(base, none, Seq("k"), "op")
      .count() == base.count())
  }

  test("merge plan never shuffles the base: broadcast anti-join + union") {
    val plan = Registry.byName("q_ref_merge_upsert")
      .fn(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(1200))
    // the only exchanges allowed are the broadcast of touched keys and
    // the final ORDER BY's range repartition — never a hash shuffle of
    // the base by key
    assert(!plan.contains("hashpartitioning"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }
}
