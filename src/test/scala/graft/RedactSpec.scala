package graft

import org.apache.spark.sql.functions._

/** Literal-row pins for the PII redaction cascade (q_text_redact,
  * queries.TextOps.redactCascade): each pattern class gets a
  * true-positive and a near-miss negative, plus the cascade-order
  * guarantees (email eats its local-part digits before the digit-run
  * catch-all can split them). The sf0.01 oracle checks the query
  * end-to-end; this pins WHAT each pattern matches.
  */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def redact(rows: Seq[String]): Map[String, String] =
    rows.toDF("t")
      .select(col("t"), queries.TextOps.redactCascade(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("email: masked including local-part digits; no-TLD near-miss kept") {
    val r = redact(Seq(
      "reach a.b%c_d-e@sub.domain.co today",
      "mail user123@example.com now",
      "not-an-email user@localhost here"))
    assert(r("reach a.b%c_d-e@sub.domain.co today")
      == "reach <EMAIL> today")
    // cascade order: the email pattern consumes 'user123@...' whole —
    // the digit-run pass never sees the 123
    assert(r("mail user123@example.com now") == "mail <EMAIL> now")
    assert(r("not-an-email user@localhost here")
      == "not-an-email user@localhost here")
  }

  test("ipv4: dotted quad masked; 3-octet and embedded near-misses kept") {
    val r = redact(Seq(
      "src 10.1.2.3 dst 192.168.255.254 done",
      "semver v1.2.3.4 is not an ip",
      "three 1.2.3 octets"))
    assert(r("src 10.1.2.3 dst 192.168.255.254 done")
      == "src <IP> dst <IP> done")
    assert(r("semver v1.2.3.4 is not an ip") == "semver v1.2.3.4 is not an ip")
    assert(r("three 1.2.3 octets") == "three 1.2.3 octets")
  }

  test("phone: 2-3-3-4 masked; US 3-3-4 falls through to digit runs") {
    val r = redact(Seq(
      "call 33-123-456-7890 now",
      "call 123-456-7890 now"))
    assert(r("call 33-123-456-7890 now") == "call <PHONE> now")
    // not phone-shaped for this pattern: the catch-all masks each run
    assert(r("call 123-456-7890 now") == "call <ID>-<ID>-<ID> now")
  }

  test("digit runs: 3+ masked, 1-2 kept") {
    val r = redact(Seq("acct 4711 pin 42"))
    assert(r("acct 4711 pin 42") == "acct <ID> pin 42")
  }

  test("all three synthetic classes occur and flags vary at sf0.001") {
    val out = q("q_text_redact")
    val agg = out.agg(
      sum(when(col("had_email"), 1L).otherwise(0L)),
      sum(when(col("had_ip"), 1L).otherwise(0L)),
      sum(when(col("had_phone"), 1L).otherwise(0L)),
      count(lit(1))).head()
    val (e, i, p, n) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    assert(e > 0 && e < n, s"email flag degenerate: $e/$n")
    assert(i > 0 && i < n, s"ip flag degenerate: $i/$n")
    assert(p > 0 && p < n, s"phone flag degenerate: $p/$n")
    // nothing PII-shaped survives redaction
    val leaked = out.where(
      col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
        || col("redacted").rlike("\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b")
        || col("redacted").rlike("[0-9]{3,}")).count()
    assert(leaked == 0L, s"$leaked rows leaked PII-shaped text")
  }
}
