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
}
