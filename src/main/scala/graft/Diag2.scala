package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage profile of q_dedup_semantic (not part of the driver
  * contract): attributes wall-clock between the (count,dim) agg, the
  * bounded centroid fit, the corpus assignment pass, and the
  * within-cell dup join. `runMain graft.Diag2 [sfDir]`.
  */
object Diag2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/testdata-sf5"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-diag2")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    emb.write.format("noop").mode("overwrite").save() // warm cache
    val head = timed("count+dim agg") {
      emb.agg(count(lit(1)), first(size(col("embedding")))).head()
    }
    val (n, dim) = (head.getLong(0), head.getInt(1))
    val semK = math.min(math.max(8L, n / 256L), 4096L).toInt
    println(s"[diag2] n=$n dim=$dim K=$semK")
    val fitTarget = math.min(math.max(64L * semK, 8192L), 262144L)
    val fit =
      if (n <= fitTarget) emb
      else emb.where(pmod(xxhash64(col("vec_id"), lit(31L)),
        lit(math.max(1L, n / fitTarget))) === 0L)
    timed("fit sample count") { println("fit rows: " + fit.count()) }
    // trainCentroids phases, replicated with timers
    var cents: Seq[Seq[Double]] = timed("init collect") {
      fit.orderBy(col("vec_id")).limit(semK).select(col("embedding"))
        .collect().map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    }
    for (it <- 1 to 2) {
      val stats = timed(s"lloyd iter $it stats collect") {
        fit.select(element_at(graft.functions.NearestCells(
              spark, col("embedding"), cents, 1), 1).as("cell"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(col("x").cast(
            org.apache.spark.sql.types.DecimalType(28, 10))).as("sx"),
            count(lit(1)).as("n"))
          // already bounded by construction (groups = K×dim ≤ 4096×64);
          // the explicit limit makes "every collect is limit-bounded"
          // grep-enforceable across src/main (r8 advice)
          .limit(semK * dim + 16)
          .collect()
      }
      timed(s"lloyd iter $it driver update") {
        val byCell = stats.groupBy(_.getInt(0))
        cents = cents.zipWithIndex.map { case (old, ci) =>
          byCell.get(ci) match {
            case None => old
            case Some(rows) =>
              val mean = Array.fill(dim)(0.0)
              rows.foreach { r =>
                mean(r.getInt(1)) = r.getDecimal(2)
                  .divide(java.math.BigDecimal.valueOf(r.getLong(3)),
                    12, java.math.RoundingMode.HALF_UP)
                  .doubleValue()
              }
              mean.toSeq
          }
        }
      }
    }
    val (coarse, groups) = timed("coarsen") { queries.AnnOps.coarsen(cents) }
    val corpus2l = emb.select(col("vec_id"), col("embedding"),
      graft.functions.NearestCellTwoLevel(spark, col("embedding"),
        coarse, cents, groups, 4).as("cell"))
    timed("assignment pass (two-level, noop sink)") {
      corpus2l.write.format("noop").mode("overwrite").save()
    }
    val corpusFlat = emb.select(col("vec_id"), col("embedding"),
      element_at(graft.functions.NearestCells(
        spark, col("embedding"), cents, 1), 1).as("cell"))
    timed("assignment pass (flat, noop sink)") {
      corpusFlat.write.format("noop").mode("overwrite").save()
    }
    // variant experiments: what makes the Lloyd stats pass slow?
    timed("variant A: explode+decimal agg with FAKE cell (no kernel)") {
      fit.select(pmod(col("vec_id"), lit(390)).cast("int").as("cell"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast(
          org.apache.spark.sql.types.DecimalType(28, 10))).as("sx"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("variant B: kernel cell + explode, DOUBLE sum") {
      fit.select(element_at(graft.functions.NearestCells(
            spark, col("embedding"), cents, 1), 1).as("cell"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("variant C: kernel cell in SEPARATE select, then explode+decimal") {
      fit.select(element_at(graft.functions.NearestCells(
            spark, col("embedding"), cents, 1), 1).as("cell"),
          col("embedding"))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast(
          org.apache.spark.sql.types.DecimalType(28, 10))).as("sx"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("cell histogram") {
      corpus2l.groupBy(col("cell")).count()
        .agg(count(lit(1)), max(col("count")), avg(col("count"))).show()
    }
    val dups = corpus2l.select(col("cell"), col("vec_id").as("a_id"),
        col("embedding").as("av"))
      .join(corpus2l.select(col("cell"), col("vec_id").as("b_id"),
        col("embedding").as("bv")), Seq("cell"))
      .where(col("b_id") < col("a_id"))
      .where(graft.functions.CosineSimilarity(
        spark, col("av"), col("bv")) >= 0.35)
      .groupBy(col("a_id").as("vec_id"))
      .agg(min(col("b_id")).as("dup_of"))
    timed("within-cell dup join (noop sink)") {
      dups.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
