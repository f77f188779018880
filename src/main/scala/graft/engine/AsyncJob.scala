package graft.engine

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession

/** Server-side async job submission + status polling (A3): the
  * reference submits a SQL Server native backup with
  * `rds_backup_database`, parses the returned task id, then polls
  * `rds_task_status` until the lifecycle reaches SUCCESS
  * (backup.sh:118-156). The Spark analog: run the action on a driver
  * thread under a Spark job group named by the task id (so the cluster
  * can attribute and cancel its jobs), expose the same
  * CREATED → IN_PROGRESS → SUCCESS|ERROR|CANCELLED lifecycle, and poll
  * it with [[Retry.pollUntil]]'s transition-only logging.
  *
  * Duplicate submission under a live task id is rejected, mirroring the
  * reference's "A task has already been issued for database" abort
  * (backup.sh:123-126).
  */
object AsyncJob {
  sealed trait Lifecycle
  case object Created extends Lifecycle
  case object InProgress extends Lifecycle
  case object Success extends Lifecycle
  final case class Error(cause: Throwable) extends Lifecycle
  case object Cancelled extends Lifecycle

  def isTerminal(s: Lifecycle): Boolean = s match {
    case Success | Cancelled | Error(_) => true
    case _                              => false
  }

  final class DuplicateTaskException(taskId: String)
      extends IllegalStateException(
        s"A task has already been issued for task id $taskId")

  private val live = new ConcurrentHashMap[String, Handle[_]]()

  final class Handle[T] private[AsyncJob] (
      val taskId: String,
      spark: SparkSession,
      body: () => T) {
    private val state = new AtomicReference[Lifecycle](Created)
    private val result = new AtomicReference[Option[T]](None)

    private[graft] val thread: Thread = new Thread(() => {
      // Register the job group BEFORE the lifecycle CAS: a cancel()
      // landing between CAS(Created→InProgress) and setJobGroup would
      // otherwise cancel a group that does not exist yet, letting the
      // body's Spark jobs run to completion uncancelled.
      spark.sparkContext.setJobGroup(taskId,
        s"graft async job $taskId", interruptOnCancel = true)
      // CAS, not set: a cancel() that lands before this thread is
      // scheduled has already moved Created → Cancelled, and the body
      // must never start (previously the set() overwrote Cancelled and
      // the job ran to completion as Success).
      if (state.compareAndSet(Created, InProgress)) {
        try {
          val r = body()
          result.set(Some(r))
          state.compareAndSet(InProgress, Success)
        } catch {
          case e: Throwable => state.compareAndSet(InProgress, Error(e))
        } finally {
          spark.sparkContext.clearJobGroup()
          live.remove(taskId)
        }
      } else live.remove(taskId)
    }, s"graft-async-$taskId")

    /** Current lifecycle state (the `rds_task_status` poll). */
    def status(): Lifecycle = state.get()

    /** Cancel the job group on the cluster and mark the task. Only a
      * non-terminal task can be cancelled — a completed Success/Error
      * must keep its outcome (the reference's poll loop reads the final
      * lifecycle exactly once, backup.sh:139-156). */
    def cancel(): Unit = {
      @annotation.tailrec
      def toCancelled(): Boolean = state.get() match {
        case s if isTerminal(s) => false
        case s => state.compareAndSet(s, Cancelled) || toCancelled()
      }
      if (toCancelled()) {
        // AndFutureJobs: even if the cancel raced ahead of the body's
        // first job submission, later jobs tagged with this group id are
        // rejected too — no cluster work is wasted on a cancelled task.
        spark.sparkContext.cancelJobGroupAndFutureJobs(taskId)
        live.remove(taskId)
      }
    }

    /** Poll to a terminal state (transition-only logging via
      * [[Retry.pollUntil]]), then return the result or rethrow the
      * job's failure — the reference's wait-for-SUCCESS loop
      * (backup.sh:139-156). */
    def await(
        intervalMs: Long = 100L,
        maxPolls: Int = 600,
        sleep: Long => Unit = Thread.sleep,
        onTransition: Lifecycle => Unit =
          s => Log.info(s"task status: $s")): T = {
      val terminal = Retry.pollUntil[Lifecycle](
        intervalMs, maxPolls, sleep, onTransition)(() => status())(isTerminal)
      terminal match {
        case Success   => result.get().get
        case Error(e)  => throw e
        case other     => throw new IllegalStateException(s"task $taskId: $other")
      }
    }
  }

  /** Submit `body` as an async task. Returns the handle carrying the
    * task id; throws [[DuplicateTaskException]] if the id is live. */
  def submit[T](spark: SparkSession, taskId: String)(body: () => T): Handle[T] = {
    val h = new Handle[T](taskId, spark, body)
    if (live.putIfAbsent(taskId, h) != null)
      throw new DuplicateTaskException(taskId)
    h.thread.setDaemon(true)
    h.thread.start()
    h
  }
}
