package graft

import org.apache.spark.sql.functions._

/** Per-stage timing for the text-scan superlinearity seen at sf20
  * (r9): bare scan vs regex projection vs +global sort, to attribute
  * the q_text_tokencount / q_text_bpe_tokens growth.
  * Usage: runMain graft.Diag4 <sfDir> [iters]
  */
object Diag4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata-sf5")
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-diag4")
    def timed(tag: String)(df: org.apache.spark.sql.DataFrame): Unit =
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        Bench.materialize(df)
        println(f"[diag4] $tag iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val docs = graft.engine.Tables.documents(spark, sfDir)
    timed("scan_text_only")(docs.select(length(col("text")).as("l")))
    val proj = docs.select(
      col("doc_id"),
      size(filter(split(lower(col("text")), " "), t => t =!= ""))
        .cast("long").as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
        .cast("long").as("bpe_tokens"))
    timed("regex_proj_no_sort")(proj)
    timed("regex_proj_sorted")(proj.orderBy("doc_id"))
    timed("bpe_kernel_no_sort")(docs.select(col("doc_id"),
      graft.functions.BpeTokenCount(spark, col("text")).as("n")))
    // sort FIRST (samples only the cheap scan), project after — the
    // projection is order-preserving, so output order is identical
    val sortedFirst = docs.select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(
        col("doc_id"),
        size(filter(split(lower(col("text")), " "), t => t =!= ""))
          .cast("long").as("ws_tokens"),
        size(expr(
          "regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
          .cast("long").as("bpe_tokens"))
    timed("regex_sort_first")(sortedFirst)
    sortedFirst.explain("formatted")
    spark.stop()
  }
}
