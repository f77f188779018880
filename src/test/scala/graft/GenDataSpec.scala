package graft

import org.apache.spark.sql.functions._

/** Pins the properties that make [[GenData]] fixtures faithful to the
  * driver fixture (profiled at sf0.1) — the scale points in BASELINE.md
  * are only meaningful while these hold.
  */
class GenDataSpec extends SparkSpec {

  test("embeddings are near-orthogonal within label (no cluster artifact)") {
    // r6 regression source: the first generator made labels 0.99-cosine
    // clusters and the sf1 dedup benchmark exploded quadratically. The
    // driver profile is within-label median cosine ~0.0 (p10/p90
    // ±0.17); assert the generated geometry matches it.
    val e = GenData.embeddings(spark, 300)
    val pairs = e.select(col("vec_id").as("a_id"), col("label"),
        col("embedding").as("av"))
      .join(e.select(col("vec_id").as("b_id"), col("label"),
        col("embedding").as("bv")), Seq("label"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cos",
        graft.functions.CosineSimilarity(spark, col("av"), col("bv")))
    val stats = pairs.agg(
      avg(col("cos")).as("mean"),
      max(abs(col("cos"))).as("maxAbs"),
      avg(when(col("cos") >= 0.35, 1.0).otherwise(0.0)).as("fracNear"))
      .head()
    assert(math.abs(stats.getDouble(0)) < 0.05,
      s"within-label mean cosine must be ~0, got ${stats.getDouble(0)}")
    assert(stats.getDouble(2) < 0.05,
      s"near-dup fraction must stay rare (driver: ~0.002), got ${stats.getDouble(2)}")
  }

  test("documents keep the n_chars invariant and contain planted dups") {
    val d = GenData.documents(spark, 2000)
    assert(d.where(col("n_chars") =!= length(col("text"))).isEmpty,
      "n_chars == length(text) must hold for every row")
    val nDup = d.groupBy(col("text")).count().where(col("count") > 1)
      .count()
    assert(nDup > 0, "exact-duplicate groups must exist for the dedup family")
  }

  test("lineitem populates all six flag-status combos, date-independent") {
    // Driver profile (sf0.01): every A/N/R × F/O combo present with
    // near-equal counts AND identical shipdate ranges — flag/status are
    // hash-uniform, NOT TPC-H cutoff-correlated (r6 caught the earlier
    // correlated form: the flagship query returned 2 groups instead of
    // 6 at GenData scale points).
    val li = GenData.lineitem(spark, GenData.orders(spark, 2000, 500),
      1000, 100).cache()
    val combos = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(combos.keySet ==
      (for (f <- Set("A", "N", "R"); st <- Set("F", "O")) yield (f, st)),
      s"all six combos must be present, got ${combos.keySet}")
    assert(combos.values.max < 2L * combos.values.min,
      s"combo counts must be near-uniform, got $combos")
    // flag/status independent of the flagship query's date filter:
    // both sides of the 1998-09-02 cutoff contain every combo
    val cutoff = lit("1998-09-02").cast("timestamp")
    assert(li.where(col("l_shipdate") <= cutoff)
      .select("l_returnflag", "l_linestatus").distinct().count() == 6)
    assert(li.where(col("l_shipdate") > cutoff)
      .select("l_returnflag", "l_linestatus").distinct().count() == 6)
    li.unpersist()
  }

  test("generation is deterministic and partitioning-invariant") {
    val a = GenData.customer(spark, 500).collect().toSet
    val b = GenData.customer(spark, 500).repartition(7).collect().toSet
    assert(a == b, "hash-derived values must not depend on partitioning")
  }
}
