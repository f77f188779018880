package graft

/** Host-speed calibration probe (r14, VERDICT r13 next #2).
  *
  * Cross-day bench totals on this repo have swung ±40% on byte-identical
  * code (r11 78.7 s → r13 119.8 s canonical; the r12/r13 judges resolved
  * it as ambient host drift only via manual per-query forensics across
  * three rounds). The missing instrument was a FIXED unit of work
  * measured in the same JVM as the bench: a deterministic, Spark-free,
  * allocation-bounded CPU loop whose wall time moves with CPU frequency,
  * scheduler steal and ambient load — exactly the factors that inflate
  * every query uniformly — and with nothing else. Bench/BenchOne run it
  * once per process and publish `calib_sec` beside the raw totals plus
  * `total_over_calib = total / calib_sec`, a dimensionless host-
  * normalized figure: identical plans on a 1.4× slower host-day keep
  * `total_over_calib` flat while the raw total inflates 1.4×, so a real
  * plan regression is a moving ratio, not a moving total. (BASELINE.md
  * documents how to read it; single-threaded by design — drift is
  * per-core frequency/steal, and a multi-threaded probe would measure
  * the bench's own parallel phases' contention instead.)
  */
object Calib {
  /** One deterministic work pass: xorshift-fill 4M longs, sort, fold.
    * The fold result is fixed (seeded), so callers can check it across
    * passes and the JIT cannot elide the work. */
  private def pass(): Long = {
    val n = 1 << 22
    val a = new Array[Long](n)
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      a(i) = x; i += 1
    }
    java.util.Arrays.sort(a)
    var h = 0L
    i = 0
    while (i < n) { h = h * 0x100000001B3L ^ a(i); i += 1 }
    h
  }

  /** Fixed work unit: two timed passes after one untimed JIT warm
    * pass. ~1 s on this class of host. */
  def seconds(): Double = {
    val warm = pass() // untimed: JIT compile both loops + the sort
    val t0 = System.nanoTime()
    val h1 = pass()
    val h2 = pass()
    require(h1 == warm && h2 == warm, "calibration probe is deterministic")
    (System.nanoTime() - t0) / 1e9
  }

  /** The same two-pass unit run on `threads` threads CONCURRENTLY,
    * reported as wall seconds from start-latch release to last join.
    *
    * Why a second probe (r14): back-to-back runs of identical code on
    * identical data measured 319 s then 134 s while the single-thread
    * probe sat flat (0.98 vs 0.93 s) — the ambient contention on this
    * host steals PARALLEL capacity (competing multi-core loads), which
    * a one-core probe cannot see because a single runnable thread still
    * gets a whole core. On an idle host `parallelSeconds(k) ≈
    * seconds()` for k well under the core count (the unit is
    * CPU-bound; ~32 MB of sort working set per thread adds a little
    * memory-bandwidth inflation); under core steal it inflates with
    * exactly the factor the bench's parallel phases feel. Read
    * `calib_par_sec / calib_sec`: flat-and-small ⇒ totals are
    * comparable; inflated ⇒ the raw total is contaminated and
    * `total_over_calib_par` is the comparable figure. */
  def parallelSeconds(threads: Int): Double = {
    val expected = pass() // untimed JIT warm on the calling thread
    val start = new java.util.concurrent.CountDownLatch(1)
    val ok = new java.util.concurrent.atomic.AtomicBoolean(true)
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => {
        start.await()
        if (pass() != expected || pass() != expected) ok.set(false)
      })
      t.setDaemon(true); t.start(); t
    }
    val t0 = System.nanoTime()
    start.countDown()
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    require(ok.get(), "calibration probe is deterministic")
    sec
  }
}
