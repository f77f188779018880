package graft

/** Time one named query (repeatable):
  * `runMain graft.BenchOne <name> [n] [key=value ...]`.
  * Uses the same session shape as Bench; prints per-iteration seconds.
  * Trailing key=value args become session conf (e.g.
  * `spark.graft.dedup.indexDir=/tmp/idx` to bench the index-probe path
  * — its iter1 then includes the one-time build+publish, iter2+ the
  * steady-state load+probe).
  *
  * `<name>` may be a comma-separated LIST: each iteration runs the
  * queries in the given order, timing each. This is the interference
  * reproducer for in-bench-only anomalies — a query that reads N× its
  * idle time only inside the full `Bench` schedule (r18:
  * q_text_quality_classifier, 32 s in-bench vs 8.5 s solo at sf20) can
  * be bisected by replaying prefixes of the schedule in one JVM.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val (confArgs, posArgs) = args.drop(1).partition(_.contains("="))
    val iters = posArgs.headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-benchone")
    confArgs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[benchone] conf $k=$v")
    }
    // Same host-speed probes as Bench, re-measured before EVERY
    // iteration (see [[Calib]]): the single-thread probe tracks
    // per-core speed, the `cpus`-thread probe tracks the parallel-
    // capacity steal that r14 showed dominates this host's drift. An
    // iteration whose calib_par is inflated is contaminated — read the
    // /calib_par column for cross-host-day comparisons.
    (1 to iters).foreach { i =>
      val cs = Calib.seconds()
      val cp = Calib.parallelSeconds(cpus.toIntOption.getOrElse(4))
      names.foreach { name =>
        val t0 = System.nanoTime()
        // Same full-materialization metric as Bench (noop sink): count()
        // would let Catalyst prune the projections and drop the sort.
        Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[benchone] $name iter$i: $sec%.2f s" +
          f" (calib $cs%.3f par $cp%.3f; /calib ${sec / cs}%.2f" +
          f" /calib_par ${sec / cp}%.2f)")
      }
    }
    spark.stop()
  }
}
