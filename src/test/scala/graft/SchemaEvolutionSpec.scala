package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshot

/** Additive schema evolution across snapshot generations
  * (Snapshot.readEvolved): generations written before a column existed
  * read back with nulls there, new-column predicates still reach the
  * scan, and the merged schema is the union in a deterministic shape.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("old generations surface added columns as null; filters push down") {
    val dir = Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "name")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("k", "name", "score")
      .write.parquet(s"$dir/gen=2")

    val merged = Snapshot.readEvolved(spark, s"$dir/gen=1", s"$dir/gen=2")
    assert(merged.columns.sorted.toSeq == Seq("k", "name", "score"))

    val rows = merged.orderBy("k")
      .select(col("k"), col("score")).collect()
    assert(rows.map(_.isNullAt(1)).toSeq ==
      Seq(true, true, false, false),
      "pre-evolution rows must read the new column as null")

    // a predicate on the evolved column must reach the parquet scan —
    // at 100 TB the old generations are skipped from the footer stats,
    // not scanned and discarded
    val plan = merged.where(col("score") > 0.7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(score), GreaterThan(score,0.7)]"),
      plan.take(800))
    assert(merged.where(col("score") > 0.7).count() == 1L)

    Snapshot.delete(spark, dir)
  }

  test("without mergeSchema the first footer wins — readEvolved is the contract") {
    val dir = Files.createTempDirectory("evolve2").toString
    Seq((1L, "a")).toDF("k", "name").write.parquet(s"$dir/g1")
    Seq((2L, "b", 1.0)).toDF("k", "name", "score").write.parquet(s"$dir/g2")
    val cols = Snapshot.readEvolved(spark, s"$dir/g1", s"$dir/g2")
      .columns.toSet
    assert(cols == Set("k", "name", "score"))
    Snapshot.delete(spark, dir)
  }
}
