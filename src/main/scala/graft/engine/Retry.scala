package graft.engine

/** Driver-side resilience utilities.
  *
  * Reference semantics: `sqlcmd_with_backoff` retries a flaky command up
  * to ATTEMPTS (default 9) times sleeping TIMEOUT (default 2s) doubled
  * after each failure (backup.sh:39-72); status loops poll every 30s/60s
  * until a terminal state, logging only on transitions
  * (backup.sh:140-156,281-291). In Spark these wrap driver-side actions
  * (JDBC extracts, sink commits); task-level retry stays with
  * `spark.task.maxFailures`.
  */
object Retry {

  /** Run `f`, retrying up to `attempts` times with exponential backoff
    * starting at `baseDelayMs` and doubling per failure. `sleep` is
    * injectable for tests. */
  def retry[T](
      attempts: Int = 9,
      baseDelayMs: Long = 2000L,
      sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    var delay = baseDelayMs
    var lastErr: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f()
      catch {
        // NonFatal only: OOM/interrupt/etc. must propagate immediately,
        // not burn the ~17-minute backoff budget on a doomed action.
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          i += 1
          if (i < attempts) { sleep(delay); delay *= 2 }
      }
    }
    throw lastErr
  }

  /** Poll `poll` every `intervalMs` until `isTerminal` or `maxPolls`
    * exhausted; invokes `onTransition` only when the observed state
    * changes (transition-only logging, backup.sh:146-152). Returns the
    * final state; throws if no terminal state within budget. */
  def pollUntil[S](
      intervalMs: Long = 30000L,
      maxPolls: Int = 120,
      sleep: Long => Unit = Thread.sleep,
      onTransition: S => Unit = (_: S) => ())(
      poll: () => S)(isTerminal: S => Boolean): S = {
    var last: Option[S] = None
    var i = 0
    while (i < maxPolls) {
      val s = poll()
      if (!last.contains(s)) { onTransition(s); last = Some(s) }
      if (isTerminal(s)) return s
      i += 1
      if (i < maxPolls) sleep(intervalMs)
    }
    throw new IllegalStateException(
      s"no terminal state after $maxPolls polls; last=${last.getOrElse("<none>")}")
  }

  /** Guaranteed finalization (`trap cleanup_on_exit EXIT`,
    * backup.sh:20-36): run `body`, always run `cleanup`, and preserve
    * the body's failure over any cleanup failure — the trap's
    * propagate-original-status semantics. */
  def withCleanup[T](cleanup: () => Unit)(body: => T): T = {
    var primary: Throwable = null
    try body
    catch { case e: Throwable => primary = e; throw e }
    finally {
      try cleanup()
      catch { case c: Throwable => if (primary != null) primary.addSuppressed(c) else throw c }
    }
  }

  /** Throwaway credential generation (`openssl rand -base64 32 |
    * tr -cd '[:alnum:]'`, psql-backups-iam-auth.sh:175-178):
    * SecureRandom base64, non-alphanumerics stripped. Driver-side only —
    * never inside a declared (deterministic) query. */
  def randomCredential(bytes: Int = 32): String = {
    val buf = new Array[Byte](bytes)
    new java.security.SecureRandom().nextBytes(buf)
    java.util.Base64.getEncoder.encodeToString(buf).filter(_.isLetterOrDigit)
  }
}
