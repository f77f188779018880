package graft

import java.nio.file.{Files, Paths}

/** Cross-process atomic publish (VERDICT r16 missing #3): the
  * single-JVM racing-publishers spec proves thread-level atomicity,
  * but production contention is two separate DRIVER PROCESSES — no
  * shared JVM locks, only `FileContext.rename(Rename.NONE)` semantics
  * on the shared filesystem between them. This spec forks two real
  * JVMs ([[RacePublish]]) against the same generation path, releases
  * them through a file barrier so both hit the commit rename
  * together, and checks the contract:
  *
  *  - exactly one exits 0 (won) and one exits 42 (lost with
  *    SnapshotExistsException) — never two winners, never two losers;
  *  - the published generation holds EXACTLY the winner's payload
  *    (uniform publisher tag matching the winning process);
  *  - the generation's manifest is present and row-accurate (data +
  *    manifest commit as one rename);
  *  - the loser's staging directory is cleaned up — no
  *    `.__staging__` residue under the publish root.
  */
class CrossProcessPublishSpec extends SparkSpec {

  private def forkRacer(
      dest: String, tag: String, ready: String, go: String): Process = {
    val javaBin = Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    // inherit the parent's --add-opens set (Spark 4 on JDK 17 needs it
    // when SparkSession starts outside spark-submit)
    val inherited = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val opens = scala.jdk.CollectionConverters
      .ListHasAsScala(inherited).asScala.toSeq
      .sliding(2).collect {
        case Seq("--add-opens", v) => Seq("--add-opens", v)
      }.flatten.toSeq
    val cmd = Seq(javaBin, "-Xmx1g", "-Dspark.ui.enabled=false") ++ opens ++
      Seq("-cp", System.getProperty("java.class.path"),
        "graft.RacePublish", dest, tag, ready, go)
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  test("two separate JVMs racing publishAtomic: one wins, one loses, " +
      "winner's data + manifest intact, loser's staging cleaned") {
    val work = Files.createTempDirectory("graft_xproc_publish_")
    try {
      val dest = s"$work/gen_42"
      val ready1 = s"$work/ready_a"
      val ready2 = s"$work/ready_b"
      val go = s"$work/go"
      val p1 = forkRacer(dest, "racer_a", ready1, go)
      val p2 = forkRacer(dest, "racer_b", ready2, go)
      // both racers staged and session-warm -> release them together
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while ((!Files.exists(Paths.get(ready1)) ||
          !Files.exists(Paths.get(ready2)))
          && System.nanoTime() < deadline) Thread.sleep(50L)
      assert(Files.exists(Paths.get(ready1)) && Files.exists(Paths.get(ready2)),
        "racer JVMs did not reach the barrier in 180 s")
      Files.createFile(Paths.get(go))
      val c1 = p1.waitFor()
      val c2 = p2.waitFor()
      assert(Set(c1, c2) == Set(0, 42),
        s"expected exactly one winner (0) and one loser (42), got $c1/$c2")
      val winnerTag = if (c1 == 0) "racer_a" else "racer_b"
      // winner's payload, whole and uniform
      val pub = spark.read.parquet(dest)
      assert(pub.count() == 500)
      val tags = pub.select("publisher").distinct()
        .collect().map(_.getString(0)).toSeq
      assert(tags == Seq(winnerTag),
        s"generation must hold exactly the winner's rows, got $tags")
      // manifest committed atomically with the data
      val mf = graft.engine.Snapshot.readManifest(spark, dest)
      assert(mf.exists(_.rowCount == 500L),
        s"manifest missing or wrong after cross-process publish: $mf")
      // loser's staging is gone
      val residue = Files.list(work).toArray.map(_.toString)
        .filter(_.contains(".__staging__"))
      assert(residue.isEmpty, s"staging residue: ${residue.toSeq}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(work.toFile)
    }
  }
}
