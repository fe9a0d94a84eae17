package graft.warehouse

import graft.SparkSpec

class LeaseLockSpec extends SparkSpec {

  test("lease is exclusive, expires for crashed holders, and guards merge") {
    import spark.implicits._
    val table = tmpDir("lease") + "/tbl"

    // Exclusive: while held, a second contender (zero wait) is refused.
    val l1 = LeaseLock.acquire(spark, table)
    assert(l1.isDefined, "first acquire must win")
    assert(LeaseLock.acquire(spark, table).isEmpty, "held lease must refuse")

    // Release frees it for the next holder.
    LeaseLock.release(spark, l1.get)
    val l2 = LeaseLock.acquire(spark, table)
    assert(l2.isDefined, "released lease must be re-acquirable")

    // A crashed holder's expired lease is taken over; the stale holder's
    // release must then NOT remove the new holder's lease.
    LeaseLock.release(spark, l2.get)
    val crashed = LeaseLock.acquire(spark, table, ttlMs = 1L)
    assert(crashed.isDefined)
    Thread.sleep(5)
    val taker = LeaseLock.acquire(spark, table, waitMs = 2000L)
    assert(taker.isDefined, "expired lease must be taken over")
    LeaseLock.release(spark, crashed.get) // stale holder comes back — no-op
    assert(LeaseLock.acquire(spark, table).isEmpty,
      "a stale holder's release must not free the new holder's lease")
    LeaseLock.release(spark, taker.get)

    // A leased merge round-trips (the lease wraps the same merge path).
    val batch = Seq(("a", 1), ("b", 2)).toDF("_id", "v")
    assert(MergeWriter.merge(spark, table, batch, lease = true) == 2L)
    assert(MergeWriter.read(spark, table).count() == 2L)
    // And the lease was released on the way out.
    assert(LeaseLock.acquire(spark, table).isDefined)
  }

  test("contending acquirers are mutually exclusive under load") {
    val table = tmpDir("lease-race") + "/tbl"
    val inside = new java.util.concurrent.atomic.AtomicBoolean(false)
    val overlaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val held = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 24).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit =
            // Tiny TTL exercises the expiry-takeover path concurrently
            // with live holds — the exact regime of the takeover race.
            LeaseLock.acquire(spark, table, ttlMs = 5000L, waitMs = 30000L,
              pollMs = 5L).foreach { l =>
              if (!inside.compareAndSet(false, true)) overlaps.incrementAndGet()
              held.incrementAndGet()
              Thread.sleep(3)
              inside.set(false)
              LeaseLock.release(spark, l)
            }
        })
      }
      tasks.foreach(_.get())
      assert(overlaps.get == 0, s"${overlaps.get} overlapping holds")
      assert(held.get == 24, s"only ${held.get}/24 contenders ever acquired")
    } finally pool.shutdownNow()
  }
}
