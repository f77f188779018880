package graft

import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** engine/Partitioned + q_join_partition_pruned: the publish-once
  * Hive-partitioned layout. Pins the design doc's claims: the fact
  * scan carries a runtime `dynamicpruning` filter fed by the hot-days
  * dim and reads only the qualifying day directories; a literal
  * predicate prunes statically to one directory; and the published
  * layout is reused, never rewritten. */
class PartitionedSpec extends SparkSpec {

  private def partDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft-prt")
    spark.conf.set(graft.engine.Partitioned.DirConf, dir.toString)
    dir
  }
  private def cleanup(dir: java.nio.file.Path): Unit = {
    spark.conf.unset(graft.engine.Partitioned.DirConf)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  private def executed(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan
  }
  private def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case s: QueryStageExec => Seq(s.plan)
    case other => other.children
  }
  private def collectAll[T](p: SparkPlan)(
      f: PartialFunction[SparkPlan, T]): Seq[T] =
    (if (f.isDefinedAt(p)) Seq(f(p)) else Nil) ++
      unwrap(p).flatMap(collectAll(_)(f))

  /** The fact-side scan = the one whose partitionFilters reference
    * event_day (the dim subtree scans the raw un-partitioned file). */
  private def factScan(plan: SparkPlan): FileSourceScanExec =
    collectAll(plan) { case f: FileSourceScanExec => f }
      .find(_.partitionFilters.nonEmpty)
      .getOrElse(fail(s"no partitioned scan in:\n$plan"))

  test("join prunes fact partitions at runtime via dynamic partition pruning") {
    val dir = partDir
    try {
      val plan = executed(q("q_join_partition_pruned"))
      val scan = factScan(plan)
      assert(scan.partitionFilters.exists(_.exists(
        _.isInstanceOf[DynamicPruningExpression])),
        s"no dynamicpruning filter on the fact scan:\n$scan")
      // fixture has 30 event days; the hot-days dim selects exactly 8
      val read = scan.metrics("numPartitions").value
      assert(read == 8, s"expected 8 of 30 day directories read, got $read")
    } finally cleanup(dir)
  }

  test("literal day predicate prunes statically to one directory") {
    val dir = partDir
    try {
      val ev = graft.engine.Partitioned.table(
        spark, sf, "events_by_day",
        graft.engine.Tables.events(spark, sf)
          .withColumn("event_day", to_date(col("ts"))),
        "event_day")
      val day = ev.select(col("event_day")).head().getDate(0)
      val plan = executed(ev.where(col("event_day") === lit(day)))
      val scan = factScan(plan)
      assert(scan.metrics("numPartitions").value == 1,
        "static literal pruning must read exactly one day directory")
    } finally cleanup(dir)
  }

  test("an in-place source change builds a fresh copy for both table and artifact") {
    // r12 verdict wrong #2, partitioned/artifact side: source content
    // is in the identity, so mutation re-keys instead of stale-serving
    val dir = partDir
    val srcDir = java.nio.file.Files.createTempDirectory("graft-prt-src")
    try {
      val srcPath = s"$srcDir/t"
      spark.range(0, 300).selectExpr("id AS k", "id % 3 AS day")
        .write.parquet(srcPath)
      def src = spark.read.parquet(srcPath)
      val t1 = graft.engine.Partitioned
        .table(spark, srcDir.toString, "mut", src, "day").count()
      val a1 = graft.engine.Partitioned
        .artifact(spark, srcDir.toString, "mutart", src).count()
      assert(t1 == 300 && a1 == 300)
      spark.range(0, 500).selectExpr("id AS k", "id % 3 AS day")
        .write.mode("overwrite").parquet(srcPath)
      assert(graft.engine.Partitioned
        .table(spark, srcDir.toString, "mut", src, "day").count() == 500,
        "stale partitioned layout served after source mutation")
      assert(graft.engine.Partitioned
        .artifact(spark, srcDir.toString, "mutart", src).count() == 500,
        "stale artifact served after source mutation")
      // retention reclaims the abandoned generation per logical name
      val root = new java.io.File(spark.conf.get(
        graft.engine.Partitioned.DirConf))
      assert(root.listFiles.count(_.getName.startsWith("graft_prt_mut_"))
        == 2)
      // default idle grace protects recently-used layouts (ADVICE r14:
      // coexisting active identities of one name must not thrash)
      assert(graft.engine.Partitioned.expire(spark, keep = 1).isEmpty,
        "default idle grace must protect recently-used layouts")
      val deleted = graft.engine.Partitioned.expire(spark, keep = 1,
        minIdleMs = 0)
      assert(deleted.size == 2, // one prt + one art abandoned
        s"expire must reclaim the two abandoned layouts: $deleted")
      assert(graft.engine.Partitioned
        .table(spark, srcDir.toString, "mut", src, "day").count() == 500)
    } finally {
      cleanup(dir)
      org.apache.commons.io.FileUtils.deleteDirectory(srcDir.toFile)
    }
  }

  test("publish-once: reuse never rewrites; result equals the raw-parquet join") {
    val dir = partDir
    try {
      val first = q("q_join_partition_pruned").collect().toSeq
      val files = java.nio.file.Files.walk(dir)
        .filter(_.toString.endsWith(".parquet"))
        .toArray.map(_.toString).sorted
      assert(files.nonEmpty)
      // one file per day directory (the small-file discipline)
      val dirs = files.map(f =>
        java.nio.file.Paths.get(f).getParent.toString).toSeq
      assert(dirs.distinct.size == dirs.size,
        "expected exactly one file per partition directory")
      val sizes = files.map(f =>
        java.nio.file.Files.size(java.nio.file.Paths.get(f)))
      assert(q("q_join_partition_pruned").collect().toSeq == first)
      val filesAfter = java.nio.file.Files.walk(dir)
        .filter(_.toString.endsWith(".parquet"))
        .toArray.map(_.toString).sorted
      assert(filesAfter.toSeq == files.toSeq &&
        filesAfter.map(f => java.nio.file.Files.size(
          java.nio.file.Paths.get(f))).toSeq == sizes.toSeq,
        "reuse must not rewrite the published layout")
      // faithful-copy check against the raw parquet, DPP-free
      val raw = graft.engine.Tables.events(spark, sf)
      val daily = raw.groupBy(to_date(col("ts")).as("day"))
        .agg(graft.queries.Det.dsum(col("value"), 2).as("day_value"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("day_value").desc, col("day"))))
        .filter(col("rn") <= 8).select("day")
      val plain = raw.withColumn("event_day", to_date(col("ts")))
        .join(daily, col("event_day") === col("day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          graft.queries.Det.dsum(col("value"), 2).as("sum_value"),
          countDistinct(col("event_day")).as("n_days"))
        .orderBy("event_type").collect().toSeq
      assert(first == plain, "partitioned-layout result diverges from raw")
    } finally cleanup(dir)
  }
}
