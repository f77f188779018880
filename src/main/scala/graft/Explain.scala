package graft

/** Print the formatted physical plan of one named query:
  * `runMain graft.Explain <name> [sfDir] [key=value ...]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val (confArgs, posArgs) = args.drop(1).partition(_.contains("="))
    val sfDir = posArgs.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    confArgs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
