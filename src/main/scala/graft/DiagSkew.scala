package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AQE-skew-join vs manual-salt A/B (r14, VERDICT r13 next #7).
  *
  * q_join_skew_salt ships the manual mitigation (`Skew.saltedJoin`) and
  * its docstring claims the niche — "for when AQE's runtime skew split
  * isn't available". This probe MEASURES that claim at scale instead of
  * asserting it: a synthetic hot key (a fraction of fact rows remapped
  * onto ONE orderkey — the power-law shape of a viral item / bot user)
  * joins the orders dim three ways on the same session:
  *
  *   off  — plain SMJ, AQE skew split disabled (the naive baseline; its
  *          wall time is one straggler task processing the hot key);
  *   aqe  — plain SMJ, `spark.sql.adaptive.skewJoin` ON with the
  *          thresholds scaled to the local fixture (defaults are tuned
  *          for 256 MB cluster partitions); the runtime splits the
  *          oversized partition into N reads of the matching dim range;
  *   salt — `Skew.saltedJoin` (fact side salted ×8, dim replicated ×8),
  *          AQE skew split off, the static mitigation.
  *
  * Prints iter-2 steady-state wall per variant, whether the AQE run's
  * FINAL plan actually carries a `skew=true` SMJ (a too-high threshold
  * silently measures the baseline twice — the honesty flag), and result
  * equality across all three. Usage:
  *   runMain graft.DiagSkew [sfDir] [hotPct] [iters]
  */
object DiagSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata-sf5")
    val hotPct = if (args.length > 1) args(1).toInt else 30
    val iters = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-diagskew")
    val calib = Calib.seconds()
    println(f"[diagskew] calib_sec: $calib%.3f sf=$sfDir hotPct=$hotPct")

    // Hot key: hotPct% of fact rows collapse onto orderkey 1 — the dim
    // row for key 1 matches ~hotPct% of the fact. Deterministic remap.
    def fact: DataFrame = graft.engine.Tables.lineitem(spark, sfDir)
      .withColumn("l_orderkey",
        when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(100))
          < hotPct, lit(1L)).otherwise(col("l_orderkey")))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def dim: DataFrame = graft.engine.Tables.orders(spark, sfDir)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_orderpriority")

    def agg(joined: DataFrame): DataFrame = joined
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"))

    def withConf[A](kvs: (String, String)*)(body: => A): A = {
      val prev = kvs.map { case (k, _) =>
        k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // Force the shuffle-join path: the orders dim broadcasts at small
    // SFs, which would measure a broadcast join three times instead of
    // the skew question.
    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    // Thresholds scaled to the local fixture (defaults assume ~256 MB
    // cluster partitions): split anything 2x the median and > 16 MB,
    // advising ~16 MB splits. The advisory size is set in BOTH variants
    // so off-vs-aqe isolates the skew split itself, not AQE's
    // small-partition coalescing.
    val common = noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m")
    val skewOff = common :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "false")
    val skewOn = common :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "true")

    def time(label: String, confs: Seq[(String, String)])(
        mk: => DataFrame): (Double, DataFrame) = {
      var last: DataFrame = null
      var sec = 0.0
      (1 to iters).foreach { i =>
        withConf(confs: _*) {
          val df = mk
          val t0 = System.nanoTime()
          Bench.materialize(df)
          sec = (System.nanoTime() - t0) / 1e9
          last = df
          println(f"[diagskew] $label iter$i: $sec%.2f s (/calib ${
            sec / calib}%.2f)")
        }
      }
      (sec, last)
    }

    val (tOff, dfOff) = time("off ", skewOff)(agg(fact.join(dim, "l_orderkey")))
    val (tAqe, dfAqe) = time("aqe ", skewOn)(agg(fact.join(dim, "l_orderkey")))
    // Honesty flag: did the AQE run actually split the hot partition?
    // NOTE the capture path: Bench.materialize goes through df.write,
    // which executes a SEPARATE QueryExecution — the DataFrame's own
    // executedPlan would still be the un-executed AdaptiveSparkPlan
    // (isFinalPlan=false, no AQEShuffleRead nodes). collect() executes
    // the DataFrame's own QE (output here is a 5-row aggregate), so
    // the final adaptive plan is inspectable afterwards.
    val aqePlan = withConf(skewOn: _*) {
      val df = agg(fact.join(dim, "l_orderkey"))
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    aqePlan.linesIterator
      .filter(l => l.contains("AQEShuffleRead") || l.contains("SortMergeJoin"))
      .foreach(l => println(s"[diagskew] plan: ${l.trim.take(120)}"))
    val skewFired =
      aqePlan.contains("skew=true") || aqePlan.contains("skewed")
    val (tSalt, dfSalt) = time("salt", skewOff)(
      agg(graft.engine.Skew.saltedJoin(fact, dim, Seq("l_orderkey"), 8)))

    val rOff = dfOff.collect().sortBy(_.getString(0)).toSeq
    def eq(r: Seq[org.apache.spark.sql.Row]) =
      r.map(x => (x.getString(0), x.getLong(1))) ==
        rOff.map(x => (x.getString(0), x.getLong(1)))
    println(s"[diagskew] results equal: aqe=${
      eq(dfAqe.collect().sortBy(_.getString(0)).toSeq)} salt=${
      eq(dfSalt.collect().sortBy(_.getString(0)).toSeq)}")
    println(f"[diagskew] SUMMARY sf=$sfDir hotPct=$hotPct " +
      f"off=$tOff%.2f aqe=$tAqe%.2f (skewFired=$skewFired) " +
      f"salt=$tSalt%.2f calib=$calib%.3f")
    spark.stop()
  }
}
