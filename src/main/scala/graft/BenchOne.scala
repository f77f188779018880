package graft

/** Time one named query (repeatable): `runMain graft.BenchOne <name> [n]`.
  * Uses the same session shape as Bench; prints per-iteration seconds.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-benchone")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      // Same full-materialization metric as Bench (noop sink): count()
      // would let Catalyst prune the projections and drop the sort.
      Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
      println(f"[benchone] $name iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
