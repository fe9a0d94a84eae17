package graft.engine

import java.util.concurrent.{CountDownLatch, Executor, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Resident interval scheduler — the reference's APScheduler job loop
  * (reference src/main.py:70-77: `IntervalTrigger(minutes=N)`,
  * `coalesce=True`, `max_instances=1`). Semantics reproduced:
  *
  *  - at most ONE instance of the job body runs at any time;
  *  - a tick that fires while the previous run is still going is SKIPPED
  *    (suppressed, not queued) — a slow sync never piles up behind
  *    itself;
  *  - ticks fire on the wall-clock interval regardless of body duration
  *    (the timer thread never executes the body itself).
  *
  * Driver-side control plane only — the body launches distributed work;
  * this class holds no Spark state.
  */
final class ScheduledLoop(body: () => Unit) {

  private val running = new AtomicBoolean(false)
  private val runs = new AtomicLong(0)
  private val failures = new AtomicLong(0)
  private val skips = new AtomicLong(0)

  def runCount: Long = runs.get
  def failureCount: Long = failures.get
  def skipCount: Long = skips.get

  // A failing tick is a RUN (APScheduler logs the job error and keeps the
  // schedule): the exception must not escape to the executor's default
  // handler — it would silently skew the run accounting and, in a
  // resident driver, hide every-tick failures entirely.
  private def runBody(): Unit = {
    try body()
    catch {
      case e: Exception =>
        failures.incrementAndGet()
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"scheduled job body failed (tick continues): ${e.getMessage}", e)
    }
    runs.incrementAndGet()
  }

  /** One synchronous scheduler tick: runs the body in the calling thread
    * unless another tick's body is still running (then records a skip).
    * Returns true iff the body ran (failed runs count as run — see
    * [[failureCount]]).
    */
  def tick(): Boolean =
    if (running.compareAndSet(false, true)) {
      try { runBody(); true }
      finally running.set(false)
    } else { skips.incrementAndGet(); false }

  /** Non-blocking tick: claims the run slot and hands the body to `exec`,
    * releasing the slot when the body finishes. Returns true iff the body
    * was started (false = suppressed by an in-flight run).
    */
  def tryStart(exec: Executor): Boolean =
    if (running.compareAndSet(false, true)) {
      // If the executor refuses the task (shut down, bounded queue), the
      // body's finally never runs — release the slot here or every
      // future tick would be suppressed forever.
      try exec.execute { () =>
        try runBody()
        finally running.set(false)
      } catch {
        case e: Throwable => running.set(false); throw e
      }
      true
    } else { skips.incrementAndGet(); false }

  /** Blocking fixed-rate loop: fire `maxTicks` ticks `intervalMs` apart
    * (first tick immediately), suppressing overlaps, then drain the last
    * body and return. `maxTicks = Long.MaxValue` = run forever (the
    * resident-driver deployment; bounded values serve CLI drives and
    * specs).
    */
  def run(intervalMs: Long, maxTicks: Long = Long.MaxValue): Unit =
    run(intervalMs, maxTicks, Executors.newSingleThreadExecutor())

  /** Test seam: inject the worker (e.g. an already-rejected executor) to
    * exercise the timer-failure path.
    */
  private[engine] def run(intervalMs: Long, maxTicks: Long,
                          worker: java.util.concurrent.ExecutorService): Unit = {
    val timer = Executors.newSingleThreadScheduledExecutor()
    val fired = new AtomicLong(0)
    val done = new CountDownLatch(1)
    // If the timer task throws (tryStart rethrows an executor rejection),
    // ScheduledThreadPoolExecutor silently CANCELS the periodic task — a
    // bounded run() would then wait on the latch forever. Catch, record,
    // release the latch, and rethrow after cleanup so the caller gets a
    // diagnosable error instead of a hang.
    val timerFailure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    timer.scheduleAtFixedRate(() => {
      try {
        if (fired.incrementAndGet() <= maxTicks) tryStart(worker)
        if (fired.get >= maxTicks) done.countDown()
      } catch {
        case t: Throwable =>
          timerFailure.set(t)
          done.countDown()
          throw t // let the executor cancel the (now-broken) schedule
      }
    }, 0, intervalMs, TimeUnit.MILLISECONDS)
    done.await()
    timer.shutdownNow()
    worker.shutdown() // lets an in-flight body finish
    worker.awaitTermination(Long.MaxValue, TimeUnit.MILLISECONDS)
    Option(timerFailure.get).foreach(t =>
      throw new IllegalStateException(s"scheduled loop timer failed after ${fired.get} ticks", t))
  }
}
