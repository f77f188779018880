package graft

import org.apache.spark.sql.functions._

/** Hot-block scaling probe for the FastSS fuzzy-name path (r11,
  * VERDICT r10 #7 / r9 #8): `runMain graft.DiagFuzzy [sizes...]`.
  *
  * Builds synthetic name tables where ONE 16-char prefix block holds
  * `n` names (far past FuzzyBlockCap = 1000, so the deletion-
  * neighborhood path engages — the pairwise path would be |n|² pairs)
  * and times `fuzzyNamePairs` end-to-end at each n. Names are the hot
  * prefix + a distinct 8-digit suffix, with every ~50th name a 1-edit
  * twin of its predecessor, so true pairs grow LINEARLY in n and a
  * sub-quadratic wall-clock trend is attributable to the machinery,
  * not an empty output. Prints seconds + pair counts per size; the
  * doubling ratio across consecutive sizes is the evidence row for
  * SCALE.md (quadratic would read 4× per doubling, FastSS should hold
  * near 2×).
  */
object DiagFuzzy {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(4000, 8000, 16000, 32000)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-diagfuzzy")
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- sizes) {
      // hot prefix fills the whole 16-char blk; ~2% of names are 1-sub
      // twins of the previous name (same length, last digit bumped)
      val named = spark.range(0, n).select(
        col("id"),
        concat(lit("hotprefix_block_"),
          when(col("id") % 50 === 1,
            format_string("%08d", col("id") - 1))
            .otherwise(format_string("%08d", col("id"))),
          when(col("id") % 50 === 1, lit("x")).otherwise(lit("y")))
          .as("name"))
        .withColumn("blk", substring(col("name"), 1, 16))
      (1 to 2).foreach { iter =>
        val t0 = System.nanoTime()
        val pairs = queries.DedupOps.fuzzyNamePairs(named, cap = 1000).count()
        println(f"[diagfuzzy] n=$n iter$iter: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ($pairs pairs)")
      }
    }
    spark.stop()
  }
}
