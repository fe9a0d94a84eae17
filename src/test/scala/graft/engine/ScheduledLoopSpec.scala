package graft.engine

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

class ScheduledLoopSpec extends AnyFunSuite {

  test("tick runs the body and counts runs") {
    var n = 0
    val loop = new ScheduledLoop(() => n += 1)
    assert(loop.tick())
    assert(loop.tick())
    assert(n == 2 && loop.runCount == 2 && loop.skipCount == 0)
  }

  test("a slow run suppresses the next tick (max_instances=1 semantics)") {
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val loop = new ScheduledLoop(() => { started.countDown(); release.await() })
    val t = new Thread(() => loop.tick())
    t.start()
    assert(started.await(5, TimeUnit.SECONDS))
    // Body of the first tick is still running: this tick must be skipped,
    // not queued.
    assert(!loop.tick())
    assert(loop.skipCount == 1)
    release.countDown()
    t.join(5000)
    assert(loop.runCount == 1)
    // Slot released → ticks run again.
    assert(loop.tick())
    assert(loop.runCount == 2)
  }

  test("a failing body counts as a run, not a vanished tick") {
    var n = 0
    val loop = new ScheduledLoop(() => { n += 1; sys.error("boom") })
    assert(loop.tick(), "failed runs still return true (the tick ran)")
    assert(loop.runCount == 1 && loop.failureCount == 1 && loop.skipCount == 0)
    // The slot was released despite the exception.
    assert(loop.tick() && n == 2)
  }

  test("a rejecting executor releases the run slot (no permanent suppression)") {
    val loop = new ScheduledLoop(() => ())
    val dead = java.util.concurrent.Executors.newSingleThreadExecutor()
    dead.shutdown()
    intercept[java.util.concurrent.RejectedExecutionException] { loop.tryStart(dead) }
    // Slot must be free again: a plain tick still runs.
    assert(loop.tick())
  }

  test("a timer-task failure surfaces as an error instead of hanging run()") {
    // The documented hazard: the worker rejects (shut down), tryStart
    // rethrows inside the timer task, and ScheduledThreadPoolExecutor
    // cancels the schedule — before the fix a bounded run() hung forever.
    val loop = new ScheduledLoop(() => ())
    val dead = java.util.concurrent.Executors.newSingleThreadExecutor()
    dead.shutdown()
    val err = intercept[IllegalStateException] {
      loop.run(intervalMs = 10, maxTicks = 3, worker = dead)
    }
    assert(err.getMessage.contains("timer failed"))
    assert(err.getCause.isInstanceOf[java.util.concurrent.RejectedExecutionException])
  }

  test("fixed-rate loop coalesces overlapping ticks and drains the last body") {
    var n = 0
    // Body takes ~3 intervals: of 6 ticks, most must be suppressed and
    // every fired tick must be accounted as either run or skip.
    val loop = new ScheduledLoop(() => { n += 1; Thread.sleep(150) })
    loop.run(intervalMs = 50, maxTicks = 6)
    assert(loop.runCount + loop.skipCount == 6)
    assert(loop.runCount >= 1 && loop.runCount <= 3, s"ran ${loop.runCount}")
    assert(loop.skipCount >= 3, s"skipped ${loop.skipCount}")
    assert(n == loop.runCount)
  }
}
