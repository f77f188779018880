package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupOps, IncrementalDedup}

/** Compaction-under-load probe (r11 verdict task #6):
  * `runMain graft.DiagCompact <sfDir> [nBatches] [indexDir]`.
  *
  * Simulates the index's real operating regime: build the base gram
  * index, fold `nBatches` "daily" batches as delta generations
  * (disjoint slices of the batch population), and measure STEADY probe
  * latency (2nd of two runs) as the generation count grows; then
  * `compactIndex` + `pruneIndex` and re-measure. The printed curve —
  * probe seconds vs live generation count, before/after compaction —
  * is what SCALE.md records and what sizes the compaction cadence on a
  * cluster (reader fan-in cost per generation vs the weekly compact's
  * one-time union).
  *
  * Folding the probed batch's own docs is deliberate: the probe treats
  * the batch as authoritative (anti-joins index copies out), so
  * RESULTS are invariant across every fold/compact/prune step — any
  * drift is a correctness bug — while the probe's postings-scan cost
  * tracks the generation layout, which is exactly the variable under
  * measurement.
  */
object DiagCompact {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val idxDir =
      if (args.length > 2) args(2)
      else java.nio.file.Files
        .createTempDirectory("graft_diagcompact_").toString
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-diagcompact")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(IncrementalDedup.IndexDirConf, idxDir)

    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      Bench.materialize(
        SparkEntry.queries("q_dedup_incremental_near")(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    def gensLive: Int = {
      val p = new java.io.File(s"$idxDir/ngram_postings")
      // committed live gens only — mirror the reader
      IncrementalDedup.liveGens(spark, p.toString).size
    }
    def steady(label: String): Unit = {
      val warm = probeOnce()
      val t = probeOnce()
      println(f"[diagcompact] $label gens=$gensLive probe=$t%.2f s " +
        f"(warm pass $warm%.2f)")
    }

    val batchAll = DedupOps.ngramGrams(spark, sfDir)
      .where(col("doc_id") % IncrementalDedup.BatchMod === 0)
      .where(size(col("bg")) > 0)
      .select(col("doc_id"), size(col("bg")).cast("long").as("n"),
        col("bg"))

    steady("base-only") // first pass publishes gen_base
    (1 to nBatches).foreach { i =>
      val slice = batchAll.where(
        expr(s"(doc_id div ${IncrementalDedup.BatchMod}) % $nBatches")
          === (i - 1))
      val tf = System.nanoTime()
      IncrementalDedup.advanceIndex(spark, idxDir, f"day$i%02d", slice)
      println(f"[diagcompact] fold day$i%02d: ${
        (System.nanoTime() - tf) / 1e9}%.1f s")
      if (i == 1 || i % 5 == 0) steady(s"after-fold-$i")
    }
    val tc = System.nanoTime()
    IncrementalDedup.compactIndex(spark, idxDir)
    println(f"[diagcompact] compact: ${(System.nanoTime() - tc) / 1e9}%.1f s")
    steady("post-compact")
    IncrementalDedup.pruneIndex(spark, idxDir)
    steady("post-prune")
    spark.stop()
  }
}
