package graft.engine

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** Structured log line emission — the `_log()` UTC-ISO prefix
  * (A29, backup.sh:10-12) and the coded-failure channel (A30,
  * backup.sh:14-17). Production deployments route through log4j; this
  * mirrors the reference's exact line shape for job-level events.
  */
object Log {
  private val iso = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssX")
    .withZone(ZoneOffset.UTC)

  /** `2024-01-05T10:47:33Z : message` — the reference's `_log` format. */
  def line(msg: String, at: Instant = Instant.now()): String =
    s"${iso.format(at)} : $msg"

  def info(msg: String): Unit = Console.out.println(line(msg))

  /** `fail()` analog: stderr line + coded exception (exit code 2 =
    * empty snapshot, per backup.sh:215). */
  final class CodedException(val code: Int, msg: String)
      extends RuntimeException(s"$msg (exit code $code)")

  def fail(msg: String, code: Int): Nothing = {
    Console.err.println(line(msg))
    throw new CodedException(code, msg)
  }
}
