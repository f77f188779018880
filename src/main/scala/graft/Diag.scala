package graft

import org.apache.spark.sql.functions._

/** Ad-hoc diagnostic main (not part of the driver contract): counts the
  * candidate-pair volume each stage of the ngram prefix filter emits,
  * to attribute sf1 wall-clock between candidate generation and the
  * exact re-score. `runMain graft.Diag [sfDir] [t]`.
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/testdata-sf1"
    val t = if (args.length > 1) args(1).toDouble else 0.4
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-diag")
    val grams = queries.DedupOps.ngramGrams(spark, sfDir).cache()
    println(s"docs: ${grams.count()}")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // Count the candidate STREAM (no cache — the arrays it carries OOM
    // the block store at sf1/t=0.4), then the scored pipeline.
    timed(s"rawPairs(t=$t) count") {
      println("candidates: " + queries.DedupOps
        .ngramRawPairs(spark, grams, 512, t, symmetric = true)
        .select("a_id").count())
    }
    timed("score+filter") {
      println("pairs: " + queries.DedupOps.ngramPairs(spark, grams, 512, t)
        .count())
    }
    // Overlap distribution of a 1/64 hash-sample of the surviving
    // candidates: how close does the candidate mass come to the
    // threshold?  Decides whether a cheap exact upper bound (bucketed
    // histogram min-sum) would prune it before arrays ship.
    timed("sampled candidate jaccard deciles") {
      val scored = queries.DedupOps
        .ngramRawPairs(spark, grams, 512, t, symmetric = true)
        .where(pmod(xxhash64(col("a_id"), col("b_id")), lit(64)) === 0)
        .select(
          graft.functions.SortedIntersectCount(spark,
            col("a_bg"), col("b_bg")).cast("double").as("c"),
          size(col("a_bg")).cast("double").as("na"),
          size(col("b_bg")).cast("double").as("nb"))
        .select((col("c") / (col("na") + col("nb") - col("c"))).as("j"),
          col("na"), col("nb"))
      scored.select(
        count(lit(1)).as("n"),
        avg(col("na")).as("avg_n"),
        expr("percentile_approx(j, array(0.1,0.25,0.5,0.75,0.9,0.99), 10000)")
          .as("j_deciles")).show(false)
    }
    grams.unpersist()
    spark.stop()
  }
}
