package graft

/** Run one named query and print its first rows — the interactive
  * entry point: `runMain graft.Run <name> [sfDir] [numRows]`.
  * `runMain graft.Run list` prints every declared query name.
  */
object Run {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || args(0) == "list") {
      Registry.all.map(_.name).sorted.foreach(println)
      if (args.isEmpty)
        System.err.println("usage: graft.Run <name|list> [sfDir] [numRows]")
      return
    }
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val numRows = if (args.length > 2) args(2).toInt else 20
    val q = Registry.byName.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name' — see `graft.Run list`"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-run")
    q.fn(spark, sfDir).show(numRows, truncate = 40)
    spark.stop()
  }
}
