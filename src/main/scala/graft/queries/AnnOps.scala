package graft.queries

import graft.Q
import graft.engine.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** IVF (inverted-file) approximate nearest neighbors — the coarse-
  * quantizer scale path for similarity search, complementing the
  * random-hyperplane LSH variant (DedupOps.simLshTopk).
  *
  * Shape (IVF-Flat, after Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", PAMI'11 §IV — public method, original
  * implementation): k-means partitions the corpus into K cells; a
  * probe scans only its `NProbe` nearest cells and exact-re-ranks the
  * candidates. At 100 TB the corpus is written partitioned/bucketed BY
  * CELL, so a query touches NProbe/K of the data — the join below
  * shuffles on the cell key, never crossing the corpus.
  *
  * Determinism: centroid init is the first K vectors by vec_id; Lloyd
  * updates sum per-dimension in exact decimals (order-independent) and
  * divide once on the driver; assignment ties break on cell index via
  * struct ordering. Every run yields bit-identical centroids, cells,
  * and neighbor lists.
  */
object AnnOps {
  private val K = 16
  private val LloydIters = 2
  private val NProbe = 4
  private val TopK = 5

  /** Nearest-centroid id, via the native one-pass kernel
    * (functions.NearestCells — the composed HOF fold form hit the
    * Generate-inlining re-evaluation cliff: 34 s at sf0.1). */
  private def cellOf(s: SparkSession, v: Column, cents: Seq[Seq[Double]])
      : Column =
    element_at(graft.functions.NearestCells(s, v, cents, 1), 1)

  /** Train the coarse quantizer: init = first K vectors by vec_id,
    * then `iters` Lloyd rounds. Per round: one narrow assignment pass
    * + one (cell, dim) aggregation; the only driver collect is the
    * K×dim centroid MODEL (fixed size, independent of corpus size —
    * at scale it trains on a bounded sample and broadcasts, exactly
    * as here). Sums are decimal-exact so centroid floats never depend
    * on partitioning/accumulation order. */
  def trainCentroids(
      emb: DataFrame, k: Int = K, iters: Int = LloydIters)
      : Seq[Seq[Double]] = {
    val s = emb.sparkSession
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    var cents: Seq[Seq[Double]] = emb
      .orderBy(col("vec_id")).limit(k)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
      .toSeq
    for (_ <- 1 to iters) {
      val stats = emb
        .select(cellOf(s, col("embedding"), cents).as("cell"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast(DecimalType(28, 10))).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = stats.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCell.get(ci) match {
          case None => old // empty cell keeps its centroid
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
    cents
  }

  /** Mandated EXT: IVF top-k neighbors for a FIXED probe set (first 10
    * vec_ids — O(1) in corpus size). Corpus assigns to its single
    * nearest cell; each probe explodes to its NProbe nearest cells;
    * the equi join on `cell` is the only pair-generating step, so the
    * candidate count follows cell occupancy, not |corpus|². Exact
    * cosine re-rank on candidates only. Approximate by construction →
    * no SQL oracle; AnnSpec checks recall against the brute-force
    * ranking. */
  val simIvfTopk: Q = Q(
    "q_sim_ivf_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val cents = trainCentroids(emb)
      val corpus = emb.select(
        col("vec_id"), col("embedding"),
        cellOf(s, col("embedding"), cents).as("cell"))
      val probes = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          explode(graft.functions.NearestCells(
            s, col("embedding"), cents, NProbe)).as("cell"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      probes.join(corpus, Seq("cell"))
        .where(col("vec_id") =!= col("probe_id"))
        .withColumn("cos", graft.functions.CosineSimilarity(
          s, col("pv"), col("embedding")))
        .withColumn("k", row_number().over(w).cast("long"))
        .where(col("k") <= TopK)
        .select("probe_id", "k", "vec_id", "cos", "cell")
        .orderBy("probe_id", "k")
    },
    None)

  val all: Seq[Q] = Seq(simIvfTopk)
}
