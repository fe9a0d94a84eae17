package graft.meta

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.warehouse.LeaseLock

/** Cross-driver lease opt-in on the METADATA writers — the JVM path lock
  * serializes writers within one driver only; with `lease = true` the
  * checkpoint table, the audit-log compaction, and the sketch state all
  * take the same [[LeaseLock]] exclusion merge/compaction already use.
  */
class MetaLeaseSpec extends SparkSpec {

  private def leaseGone(tablePath: String): Boolean = {
    val lp = LeaseLock.leasePath(tablePath)
    !lp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(lp)
  }

  test("Checkpoints.advance under lease: works, releases, and is excludable") {
    val dir = tmpDir("ckpt-lease")
    val ck = new Checkpoints(spark, dir)
    ck.advance("s1", "c1", new Timestamp(1000L), lease = true)
    assert(ck.lastSynced("s1", "c1").contains(new Timestamp(1000L)))
    assert(leaseGone(s"$dir/sync_metadata"), "lease must be released")
    // A foreign holder excludes the gate advance(lease=true) goes through.
    val foreign = LeaseLock.acquire(spark, s"$dir/sync_metadata").get
    assert(LeaseLock.acquire(spark, s"$dir/sync_metadata").isEmpty)
    LeaseLock.release(spark, foreign)
  }

  test("History.compact under lease: folds, releases, and is excludable") {
    val dir = tmpDir("hist-lease")
    val h = new History(spark, dir)
    val t = new Timestamp(1704067200000L)
    h.logStart("r1", "s", "c", t)
    h.logEnd("r1", "s", "c", "SUCCESS", t, new Timestamp(t.getTime + 1000), 5L, "ok")
    assert(h.compact(lease = true) == 1L)
    assert(leaseGone(s"$dir/sync_history"), "lease must be released")
    val foreign = LeaseLock.acquire(spark, s"$dir/sync_history").get
    assert(LeaseLock.acquire(spark, s"$dir/sync_history").isEmpty)
    LeaseLock.release(spark, foreign)
  }

  test("SketchState.update under lease: merges, releases, and is excludable") {
    val path = tmpDir("hll-lease") + "/state"
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"))
    val est = graft.warehouse.SketchState.update(
      spark, path, events, Seq("event_type"), "user_id", lease = true)
    assert(est.count() > 0)
    assert(leaseGone(path), "lease must be released")
    val foreign = LeaseLock.acquire(spark, path).get
    assert(LeaseLock.acquire(spark, path).isEmpty)
    LeaseLock.release(spark, foreign)
  }
}
