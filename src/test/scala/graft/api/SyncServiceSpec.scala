package graft.api

import scala.concurrent.ExecutionContext

import graft.SparkSpec
import graft.core.Settings
import graft.engine.SyncRunner

class SyncServiceSpec extends SparkSpec {

  implicit private val ec: ExecutionContext = ExecutionContext.global

  test("task status entries expire after the TTL (Redis-expire parity)") {
    val wh = tmpDir("svc-wh")
    var now = 1704067200000L
    val svc = new SyncService(
      new SyncRunner(spark, Settings(wh)), Settings(wh),
      taskTtlSeconds = 3600, clock = () => now)

    val id = svc.triggerSync("employees")
    assert(svc.status(id).isDefined)
    // 59 minutes later: still visible.
    now += 59 * 60 * 1000L
    assert(svc.status(id).isDefined)
    // Past the hour: read as absent, like a lapsed Redis key.
    now += 2 * 60 * 1000L
    assert(svc.status(id).isEmpty)
    // And the entry is actually gone, not just hidden: a new trigger
    // sweeps the map, so long-lived drivers don't accumulate task state.
    val id2 = svc.triggerSync("employees")
    assert(svc.status(id2).isDefined && svc.status(id).isEmpty)
  }

  test("health reports ok on a fresh warehouse") {
    val wh = tmpDir("svc-wh")
    val svc = new SyncService(new SyncRunner(spark, Settings(wh)), Settings(wh))
    assert(svc.health()("status") == "ok")
  }
}
