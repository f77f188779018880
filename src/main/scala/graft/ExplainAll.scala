package graft

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for a list of declared queries to files
  * (one JVM, so a 10-query capture doesn't pay 10 sbt/session boots):
  *
  *   runMain graft.ExplainAll <outDir> <suffix> <name1,name2,...> [sfDir]
  *
  * Writes `<outDir>/<name>_<suffix>.txt` per query. The round's
  * optimization deliverable (`plans/r18/<query>_{before,after}.txt`)
  * is produced with suffix `before` on the round-start binary and
  * `after` on the final one.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir =
      if (args.length > 3) args(3)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-explainall")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      Files.write(outDir.resolve(s"${name}_$suffix.txt"), buf.toByteArray)
      System.err.println(s"[explainall] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
