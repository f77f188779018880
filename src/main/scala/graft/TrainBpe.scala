package graft

import org.apache.spark.sql.functions._

/** Offline BPE vocabulary trainer — writes the committed merge table
  * `src/main/resources/graft_bpe_merges.txt` that functions.Bpe loads.
  *
  * The corpus pass is ONE explode + keyed count (map-side combined);
  * only the word-frequency TABLE reaches the driver, capped at the
  * `maxVocab` most frequent words (frequency DESC, word ASC — a
  * deterministic bounded model fit, the same discipline as the ANN
  * codebook sample). Merge learning itself is driver-side
  * (functions.Bpe.train) and deterministic, so re-running over the
  * same corpus reproduces the file byte-for-byte.
  *
  * Usage: runMain graft.TrainBpe [sfDir] [numMerges] [outPath]
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = if (args.length > 1) args(1).toInt else 512
    val out = if (args.length > 2) args(2)
      else "src/main/resources/graft_bpe_merges.txt"
    val maxVocab = 65536
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-trainbpe")
    val freq = graft.engine.Tables.documents(spark, sfDir)
      .select(explode(expr(
        "regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    println(s"[trainbpe] vocab words: ${freq.size}")
    val merges = graft.functions.Bpe.train(freq, numMerges)
    println(s"[trainbpe] learned merges: ${merges.size}")
    val body = "# BPE merge table learned from the documents fixture by graft.TrainBpe\n" +
      "# (rank = line order; loader skips '#' lines)\n" +
      merges.map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[trainbpe] wrote $out")
    spark.stop()
  }
}
