package graft

import org.apache.spark.sql.DataFrame

/** Ad-hoc diagnostic main (not part of the driver contract): per-stage
  * row counts for the ngram candidate machinery across scale points, to
  * attribute q_dedup_ngram_jaccard's sf5→sf20 superlinear steady-state
  * (VERDICT r7 item 1). Each stage is counted in its own job so the
  * numbers are volumes, not wall-clock artifacts.
  *
  * `runMain graft.Diag3 <sfDir> [t] [sym|con|both]`
  */
object Diag3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val t = if (args.length > 1) args(1).toDouble else 0.8
    val mode = if (args.length > 2) args(2) else "both"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-diag3")
    val grams = queries.DedupOps.ngramGrams(spark, sfDir).cache()
    println(s"docs: ${grams.count()}  sf=$sfDir  t=$t")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val probe: (String, DataFrame) => Unit = (stage, df) =>
      counts(stage) = timed(s"count $stage")(df.count())
    if (mode == "sym" || mode == "both") {
      counts.clear()
      timed("SYMMETRIC end-to-end (probed)") {
        val n = queries.DedupOps
          .ngramRawPairs(spark, grams, 512, t, symmetric = true, probe)
          .count()
        counts("raw_pairs_out") = n
      }
      counts.foreach { case (k, v) => println(f"  sym  $k%-16s $v%12d") }
      timed("SYMMETRIC steady (no probe)") {
        queries.DedupOps
          .ngramRawPairs(spark, grams, 512, t, symmetric = true).count()
      }
    }
    if (mode == "con" || mode == "both") {
      counts.clear()
      timed("CONTAINMENT end-to-end (probed)") {
        val n = queries.DedupOps
          .ngramRawPairs(spark, grams, 512, t, symmetric = false, probe)
          .count()
        counts("raw_pairs_out") = n
      }
      counts.foreach { case (k, v) => println(f"  con  $k%-16s $v%12d") }
    }
    spark.stop()
  }
}
