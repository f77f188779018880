package graft

/** VARIANT storage pins (r14): q_fn_variant/q_fn_variant_explode cover
  * the expression surface; this pins the STORAGE story — the binary
  * variant type survives a parquet write/read (the Parquet variant
  * logical type), so a parse-once ingest can persist the parsed form
  * and every later job skips the string re-parse entirely. */
class VariantSpec extends SparkSpec {
  test("VARIANT round-trips through parquet with typed extraction intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_variant_")
    try {
      spark.sql(
        """SELECT id, parse_json(concat('{"a":', id, ',"b":"x', id, '"}'))
          AS v FROM range(500)""")
        .write.parquet(s"$dir/v")
      val back = spark.read.parquet(s"$dir/v")
      // the column comes back as the variant TYPE, not a string
      assert(back.schema("v").dataType.typeName == "variant",
        back.schema.treeString)
      back.createOrReplaceTempView("variant_rt")
      // typed path extraction over the reloaded binary form
      val r = spark.sql(
        """SELECT sum(variant_get(v, '$.a', 'long')) AS s,
          count(DISTINCT variant_get(v, '$.b', 'string')) AS d
        FROM variant_rt""").head()
      assert(r.getLong(0) == 499L * 500 / 2 && r.getLong(1) == 500L)
      // round-trip text form is stable (minified)
      val j = spark.sql(
        """SELECT to_json(v) AS js FROM variant_rt
          WHERE variant_get(v, '$.a', 'long') = 7""").head().getString(0)
      assert(j == """{"a":7,"b":"x7"}""", j)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
