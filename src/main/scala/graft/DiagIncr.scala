package graft
import org.apache.spark.sql.functions._
import graft.queries.{DedupOps, IncrementalDedup}

/** Diagnostic stage profiler for q_dedup_incremental_near:
  * `runMain graft.DiagIncr <sfDir> <indexDir> [nosemi]` — times batch
  * gram extraction, the candidate probe (semi-filtered and unified
  * variants), re-score, and the batch-only machinery separately, so a
  * scale regression attributes to a stage. `nosemi` drops the
  * broadcast key semi-filter to measure its contribution. */
object DiagIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val idxDir = args(1)
    val spark = Sessions.local("32", "graft-diagincr")
    spark.conf.set(IncrementalDedup.IndexDirConf, idxDir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[diagincr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val jt = 0.8
    val batch = DedupOps.ngramGrams(spark, sfDir)
      .where(col("doc_id") % 10 === 0)
      .where(size(col("bg")) > 0)
      .select(col("doc_id"), size(col("bg")).cast("long").as("n"), col("bg"))
    time("batch_grams")(batch.count())
    // read through the index API: the index is log-structured
    // (gen_* subdirs, replaces-lists) — a flat parquet read of the
    // roots would miss all of that
    val (idxDocsAll, idxPostingsAll) = IncrementalDedup.indexFor(spark, sfDir)
    // mirror the query's disjointness rule: the batch is authoritative
    // for its doc_ids
    val idxPostings = idxPostingsAll
      .join(broadcast(batch.select("doc_id")), Seq("doc_id"), "left_anti")
      .select("g", "doc_id", "n")
    val idxDocs = idxDocsAll
      .join(broadcast(batch.select("doc_id")), Seq("doc_id"), "left_anti")
      .select("doc_id", "n", "bg")
    val prefixG = batch
      .select(col("doc_id").as("new_id"), col("n").as("new_n"),
        posexplode(col("bg")).as(Seq("pos", "g")))
      .where(col("pos") + 1 <= col("new_n") - ceil(lit(jt) * col("new_n") - lit(1e-9)) + 1)

    // A: semi-broadcast gram keys, then join
    val keys = prefixG.select(col("g")).distinct()
    val postFiltered = idxPostings.join(broadcast(keys), Seq("g"), "leftsemi")
    val candA = prefixG
      .join(postFiltered.select(col("g"), col("doc_id").as("old_id"), col("n").as("old_n")), Seq("g"))
      .where(least(col("new_n"), col("old_n")).cast("double") / greatest(col("new_n"), col("old_n")) >= jt)
      .select(col("new_id"), col("old_id")).distinct()
    time("candidates_semibcast")(candA.count())

    // B: unified probe — batch + index postings in one join
    val batchPostings = batch.select(explode(col("bg")).as("g"), col("doc_id"), col("n"))
    val postAll = idxPostings.unionByName(batchPostings)
    val postAllF =
      if (args.length > 2 && args(2) == "nosemi") postAll
      else postAll.join(broadcast(keys), Seq("g"), "leftsemi")
    val candB = prefixG
      .join(postAllF.select(col("g"), col("doc_id").as("o_id"), col("n").as("o_n")), Seq("g"))
      .where(col("o_id") =!= col("new_id"))
      .where(least(col("new_n"), col("o_n")).cast("double") / greatest(col("new_n"), col("o_n")) >= jt)
      .select(least(col("new_id"), col("o_id")).as("a_id"),
        greatest(col("new_id"), col("o_id")).as("b_id")).distinct()
    time("candidates_unified")(candB.count())

    val allDocs = idxDocs.unionByName(batch)
    val scored = candB
      .join(allDocs.select(col("doc_id").as("a_id"), col("bg").as("a_bg")), Seq("a_id"))
      .join(allDocs.select(col("doc_id").as("b_id"), col("bg").as("b_bg")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.SortedIntersectCount(spark, col("a_bg"), col("b_bg")).as("n_common"),
        size(col("a_bg")).cast("long").as("na"), size(col("b_bg")).cast("long").as("nb"))
      .withColumn("jaccard", col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")))
      .where(col("jaccard") >= jt)
    time("unified_scored")(scored.count())
    time("unified_e2e_again")(scored.count())
    spark.stop()
  }
}
