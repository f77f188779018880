package graft

/** Child-process half of the cross-process atomic-publish proof
  * (VERDICT r16 missing #3): SnapshotSpec races publishAtomic across
  * THREADS in one JVM, but the 100 TB shape is two separate DRIVERS —
  * different processes, no shared locks, only the filesystem's rename
  * semantics between them. CrossProcessPublishSpec forks two of these
  * JVMs against the same generation path; this main stages its
  * payload, waits at a file barrier so both processes hit the
  * create-if-absent commit rename together, publishes, and reports the
  * outcome in its exit code:
  *
  *   0  — this process WON the rename (its rows are the generation)
  *   42 — lost the race: [[graft.engine.Snapshot.SnapshotExistsException]]
  *        with the winner's generation intact
  *
  * Any other exit (nonzero JVM failure, exception) fails the spec.
  *
  * Usage: RacePublish <dest> <tag> <readyFile> <goFile>
  */
object RacePublish {
  def main(args: Array[String]): Unit = {
    val Array(dest, tag, readyFile, goFile) = args.take(4)
    // Deliberately NOT Sessions.local: the parent spec may run under
    // SPARK_GRAFT_MASTER=local-cluster, and the racers must stay
    // lightweight single-JVM drivers — the race under test is between
    // PROCESSES at the filesystem, not between executors.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-racepublish-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(0, 500).selectExpr(
      "id", s"'$tag' AS publisher")
    val code =
      try {
        // barrier: tell the parent this racer is staged and session-warm,
        // then spin until the parent releases both racers at once
        java.nio.file.Files.createFile(java.nio.file.Paths.get(readyFile))
        while (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(goFile))) Thread.sleep(5L)
        graft.engine.Snapshot.publishAtomic(spark, df, dest)
        println(s"[racepublish] $tag WON $dest")
        0
      } catch {
        case e: graft.engine.Snapshot.SnapshotExistsException =>
          println(s"[racepublish] $tag LOST: ${e.getMessage}")
          42
      }
    spark.stop()
    sys.exit(code)
  }
}
