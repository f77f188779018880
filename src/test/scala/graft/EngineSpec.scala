package graft

import graft.engine.{JobConfig, Retry, Snapshot, Tables}
import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {
  test("retry succeeds after k failures with doubling backoff") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val out = Retry.retry(attempts = 9, baseDelayMs = 2000, sleeps += _) { () =>
      calls += 1
      if (calls < 4) sys.error(s"boom $calls") else "ok"
    }
    assert(out == "ok" && calls == 4)
    assert(sleeps.toSeq == Seq(2000L, 4000L, 8000L))
  }

  test("retry exhausts attempts and rethrows the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.retry(attempts = 3, baseDelayMs = 1, _ => ()) { () =>
        calls += 1; sys.error(s"fail $calls")
      }
    }
    assert(calls == 3 && e.getMessage == "fail 3")
  }

  test("pollUntil logs transitions only and stops at terminal state") {
    val states = Iterator("CREATED", "CREATED", "IN_PROGRESS", "IN_PROGRESS",
      "SUCCESS")
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val end = Retry.pollUntil[String](intervalMs = 1, maxPolls = 10,
      sleep = _ => (), onTransition = seen += _)(() => states.next()) {
      s => s == "SUCCESS" || s == "ERROR"
    }
    assert(end == "SUCCESS")
    assert(seen.toSeq == Seq("CREATED", "IN_PROGRESS", "SUCCESS"))
  }

  test("pollUntil without terminal state throws") {
    intercept[IllegalStateException] {
      Retry.pollUntil[String](intervalMs = 1, maxPolls = 3, sleep = _ => ())(
        () => "creating")(_ == "available")
    }
  }

  test("withCleanup always runs cleanup and keeps the primary failure") {
    var cleaned = 0
    assert(Retry.withCleanup(() => cleaned += 1)(42) == 42 && cleaned == 1)
    val e = intercept[RuntimeException] {
      Retry.withCleanup(() => { cleaned += 1; sys.error("cleanup boom") }) {
        sys.error("body boom")
      }
    }
    assert(e.getMessage == "body boom" && cleaned == 2)
    assert(e.getSuppressed.exists(_.getMessage == "cleanup boom"))
  }

  test("randomCredential is alphanumeric and unique") {
    val a = Retry.randomCredential()
    val b = Retry.randomCredential()
    assert(a.forall(_.isLetterOrDigit) && a.length >= 32 && a != b)
  }
}

class JobConfigSpec extends AnyFunSuite {
  private val base = Map(
    "DB_ENGINE" -> "postgres", "DB_ENGINE_VERSION" -> "12.8",
    "SERVICE_NAME" -> "orders-service", "BACKUP_DIR" -> "/tmp/snap")

  test("parses with defaults (ATTEMPTS=9, TIMEOUT=2s)") {
    val c = JobConfig(base)
    assert(c.attempts == 9 && c.timeoutMs == 2000L && !c.useBackupsAccount)
    assert(c.majorVersion == 12)
  }

  test("missing required key fails") {
    intercept[IllegalArgumentException] { JobConfig(base - "DB_ENGINE") }
  }

  test("service names >=30 chars trim to 29 for the 63-char id limit") {
    val long = "a" * 35
    val c = JobConfig(base + ("SERVICE_NAME" -> long))
    assert(c.trimmedServiceName.length == 29)
    assert(c.restoreInstanceName == s"postgres-${"a" * 29}-auto-restore")
    assert(JobConfig(base).trimmedServiceName == "orders-service")
  }
}

class SnapshotSpec extends SparkSpec {
  test("round trip write->read is content-equal both directions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_test_").toString
    val rt = Snapshot.roundTripVerify(
      spark, Tables.nation(spark, sf), s"$dir/nation")
    assert(rt.verified && rt.originalRows == 25)
  }

  test("incremental diff classifies inserts, deletes, unchanged") {
    import org.apache.spark.sql.functions._
    val prev = Tables.nation(spark, sf)
    val cur = Tables.nation(spark, sf)
      .where(col("n_nationkey") =!= 3 && col("n_nationkey") =!= 7)
      .unionByName(Tables.nation(spark, sf).where(col("n_nationkey") === 7)
        .withColumn("n_name", lit("RENAMED")))
    val inc = Snapshot.incremental(prev, cur)
    assert(inc.deleted == 2)   // key 3 removed + key 7's old row
    assert(inc.inserted == 1)  // key 7's renamed row
    assert(inc.unchanged == 23)
  }

  test("metadata snapshot writes schema + row count without copying data") {
    val dest = java.nio.file.Files.createTempDirectory("graft_meta_")
      .resolve("nation.meta.json").toString
    Snapshot.writeMeta(Tables.nation(spark, sf), dest)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(dest))
    assert(txt.contains("\"rowCount\": 25"))
    assert(txt.contains("n_nationkey") && txt.contains("ddl"))
  }

  test("snapshot delete removes the sink (A5 cleanup analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_")
      .resolve("t").toString
    Snapshot.write(Tables.region(spark, sf), dir)
    assert(spark.read.parquet(dir).count() == 5)
    assert(Snapshot.delete(spark, dir))
    assert(!new java.io.File(dir).exists())
  }

  test("log lines carry the UTC ISO prefix and coded failures rethrow") {
    val at = java.time.Instant.parse("2024-01-05T10:47:33Z")
    assert(graft.engine.Log.line("starting backup", at)
      == "2024-01-05T10:47:33Z : starting backup")
    val e = intercept[graft.engine.Log.CodedException] {
      graft.engine.Log.fail("Error dump file has no data", 2)
    }
    assert(e.code == 2)
  }

  test("empty snapshot fails with the exit-code-2 analog") {
    import org.apache.spark.sql.functions.lit
    val empty = Tables.nation(spark, sf).where(lit(false))
    val dir = java.nio.file.Files.createTempDirectory("graft_test_").toString
    intercept[Snapshot.EmptySnapshotException] {
      Snapshot.write(empty, s"$dir/empty")
    }
  }
}
