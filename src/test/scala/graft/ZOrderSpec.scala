package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Snapshot
import graft.functions.ZOrder64

/** Z-order layout: the Morton kernel itself, its SQL registration, and
  * the property that actually matters at 100 TB — a z-ordered snapshot's
  * files each cover a bounded (min,max) box in BOTH dimensions, so
  * parquet footer stats can prune 2-D range predicates. A single-column
  * sort provably cannot give this (every file spans the other dim's full
  * range); that contrast is asserted too.
  */
class ZOrderSpec extends SparkSpec {

  test("kernel interleaves bits: a even, b odd") {
    assert(ZOrder64.kernel(0L, 0L) == 0L)
    assert(ZOrder64.kernel(1L, 0L) == 1L)
    assert(ZOrder64.kernel(0L, 1L) == 2L)
    assert(ZOrder64.kernel(3L, 3L) == 15L)
    assert(ZOrder64.kernel(2L, 3L) == 14L)
    assert(ZOrder64.kernel(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrder64.kernel(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // bits above 32 are ignored by contract
    assert(ZOrder64.kernel(1L << 40, 0L) == 0L)
  }

  test("kernel preserves 2-D locality ordering inside a quadrant") {
    // within the 2x2 block at origin, all keys precede any key of the
    // next block diagonal — the property row-major order lacks
    val block0 = for (x <- 0 to 1; y <- 0 to 1)
      yield ZOrder64.kernel(x.toLong, y.toLong)
    val block1 = for (x <- 2 to 3; y <- 2 to 3)
      yield ZOrder64.kernel(x.toLong, y.toLong)
    assert(block0.max < block1.min)
  }

  test("registered SQL function matches the kernel") {
    ZOrder64.register(spark)
    val rows = spark.sql(
      "SELECT zorder64(CAST(id AS BIGINT), CAST(id * 3 AS BIGINT)) AS z, id " +
        "FROM range(0, 100) ORDER BY id").collect()
    rows.foreach { r =>
      assert(r.getLong(0) == ZOrder64.kernel(r.getLong(1), r.getLong(1) * 3))
    }
  }

  test("z-ordered write bounds every file's box in both dimensions") {
    import spark.implicits._
    val n = 64
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"),
      expr(s"id DIV $n").as("y"))
    val dir = Files.createTempDirectory("zorder").toString

    val zDest = s"$dir/z"
    assert(Snapshot.writeZOrdered(grid, zDest, "x", "y", numFiles = 16) ==
      n.toLong * n)

    def fileBoxes(dest: String): Seq[(Long, Long, Long, Long)] = {
      val files = new java.io.File(dest).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
      assert(files.size > 1, s"expected a multi-file layout at $dest")
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }

    // 4096 points in 16 files = 256/file; perfect z-blocks span 16 per
    // dim, range-boundary straddle at most doubles that. A file spanning
    // more than half the domain in either dim means the layout failed.
    for ((xMin, xMax, yMin, yMax) <- fileBoxes(zDest)) {
      assert(xMax - xMin <= 32, s"x span ${xMax - xMin} too wide")
      assert(yMax - yMin <= 32, s"y span ${yMax - yMin} too wide")
    }

    // contrast: a linear sort on x leaves y unclustered — every file
    // spans (almost) the full y range
    val linDest = s"$dir/linear"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDest)
    val ySpans = fileBoxes(linDest).map { case (_, _, yMin, yMax) => yMax - yMin }
    assert(ySpans.max >= n - 1,
      "linear sort unexpectedly clustered the second dimension")

    Snapshot.delete(spark, dir)
  }

  test("rank-normalized z-order balances files under heavy skew") {
    import spark.implicits._
    // x is quadratically skewed (long tail), y uniform — raw Morton
    // keys would concentrate most rows into a few key ranges
    val n = 4096L
    val skewed = spark.range(0, n).select(
      (col("id") * col("id")).as("x"),
      (col("id") % 64).as("y"))
    val dir = Files.createTempDirectory("zorder_rank").toString
    assert(Snapshot.writeZOrderedByRank(
      skewed, s"$dir/z", "x", "y", numFiles = 16, buckets = 256) == n)

    val files = new java.io.File(s"$dir/z").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size > 1)
    val counts = files.map(f => spark.read.parquet(f).count())
    // quantile bucketing → every file carries ~n/16 rows even though
    // the raw x domain is wildly uneven
    assert(counts.max <= 2 * n / 16,
      s"unbalanced files under skew: ${counts.sorted.mkString(",")}")
    // and the y dimension is still clustered (bounded span per file)
    val ySpans = files.map { f =>
      val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
      r.getLong(1) - r.getLong(0)
    }
    assert(ySpans.count(_ <= 32) >= files.size / 2,
      s"y spans not clustered: ${ySpans.sorted.mkString(",")}")
    Snapshot.delete(spark, dir)
  }
}
