package graft

/** Partition-count invariance: the correctness gate hashes results
  * against DuckDB, so every declared query must produce bit-identical
  * values regardless of how Spark parallelizes it. Floating-point SUM
  * is order-dependent; the Det.scala decimal-domain discipline exists
  * precisely to kill that — this spec pins it by running the
  * float-bearing aggregate/window queries under different
  * `spark.sql.shuffle.partitions` and comparing collected rows exactly
  * (same values, same order — the declared ORDER BY must also hold).
  */
class DeterminismSpec extends SparkSpec {

  private val queriesUnderTest = Seq(
    "q_agg_stats",      // decimal-exact sums + derived stddev
    "q_agg_corr",       // exact co-moments + closed-form corr
    "q_text_tfidf",     // rounded-log scoring over two aggs
    "q_stream_tumbling", // windowed decimal sums
    "q_agg_hash_group", // the flagship
    "q_sim_pq_topk",    // driver codebooks + ADC doubles + re-rank ties
    "q_window_chunked_running", // two-phase window rewrite
    "q_graph_pagerank",        // integer-semiring iteration (r14)
    "q_agg_weighted_median",   // decimal cumulative-mass argmin (r14)
    "q_agg_moments")           // integer power sums -> IEEE closed form (r14)

  test("float-bearing queries are bit-identical across partition counts") {
    val conf = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(conf)
    try {
      queriesUnderTest.foreach { name =>
        val results = Seq("3", "32").map { parts =>
          spark.conf.set(conf, parts)
          q(name).collect().map(_.toSeq).toSeq
        }
        assert(results(0) == results(1),
          s"$name differs between 3 and 32 shuffle partitions")
        assert(results(0).nonEmpty, s"$name returned no rows")
      }
    } finally spark.conf.set(conf, orig)
  }
}
