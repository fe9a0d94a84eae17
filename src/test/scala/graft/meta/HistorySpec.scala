package graft.meta

import java.sql.Timestamp

import graft.SparkSpec

class HistorySpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(1704067200000L + ms)

  test("compact folds the event log to latest-per-run and preserves reads") {
    val dir = tmpDir("hist")
    val h = new History(spark, dir)
    (1 to 5).foreach { i =>
      h.logStart(s"run-$i", "src", "coll", ts(i * 1000))
      h.logEnd(s"run-$i", "src", "coll", "SUCCESS", ts(i * 1000), ts(i * 1000 + 500), i, s"m$i")
    }
    h.logStart("run-6", "src", "coll", ts(99000)) // still in flight

    val before = h.runs().collect().map(r =>
      (r.getAs[String]("id"), r.getAs[String]("status"), r.getAs[Long]("records_synced")))
      .sortBy(_._1)
    val nFilesBefore = new java.io.File(s"$dir/sync_history")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFilesBefore >= 11) // one file per append

    assert(h.compact() == 6L) // 5 finished + 1 in-flight survive

    val after = h.runs().collect().map(r =>
      (r.getAs[String]("id"), r.getAs[String]("status"), r.getAs[Long]("records_synced")))
      .sortBy(_._1)
    assert(after.sameElements(before), "compaction must not change the runs() view")
    val nFilesAfter = new java.io.File(s"$dir/sync_history")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFilesAfter == 1, s"expected one folded file, got $nFilesAfter")

    // Appends keep working post-compaction and fold with the survivors.
    h.logEnd("run-6", "src", "coll", "FAILED", ts(99000), ts(99500), 0, "boom")
    assert(h.runs().collect()
      .exists(r => r.getAs[String]("id") == "run-6" && r.getAs[String]("status") == "FAILED"))
  }

  test("reads during compaction never observe the mid-swap window") {
    val dir = tmpDir("hist")
    val h = new History(spark, dir)
    (1 to 4).foreach { i =>
      h.logStart(s"run-$i", "src", "coll", ts(i * 1000))
      h.logEnd(s"run-$i", "src", "coll", "SUCCESS", ts(i * 1000), ts(i * 1000 + 1), i, "")
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val reader = new Thread(() => {
      try while (!stop.get()) assert(h.recentRuns(10).count() == 4)
      catch { case t: Throwable => failure.set(t) }
    })
    reader.start()
    (1 to 5).foreach(_ => h.compact())
    stop.set(true)
    reader.join(60000)
    assert(failure.get() == null, s"reader failed mid-compaction: ${failure.get()}")
  }

  test("a crash between compaction renames is recovered from the backup") {
    val dir = tmpDir("hist")
    val h = new History(spark, dir)
    h.logStart("run-1", "src", "coll", ts(1000))
    h.logEnd("run-1", "src", "coll", "SUCCESS", ts(1000), ts(1500), 1, "")
    // Simulate dying after rename(live → bak) but before the staging
    // rename: the live dir is gone, the backup holds the whole log.
    val live = new java.io.File(s"$dir/sync_history")
    val bak = new java.io.File(s"$dir/.bak_sync_history")
    assert(live.renameTo(bak))
    // Reads recover the backup instead of reporting an empty fresh log.
    assert(h.runs().count() == 1)
    assert(live.exists() && !bak.exists())
  }

  test("concurrent appends to one history path all land (serialized writers)") {
    val dir = tmpDir("hist")
    val h = new History(spark, dir)
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        h.logStart(s"run-$i", s"src-$i", "coll", ts(i * 1000))
        h.logEnd(s"run-$i", s"src-$i", "coll", "SUCCESS", ts(i * 1000), ts(i * 1000 + 1), i, "")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    val runs = h.runs().collect()
    assert(runs.length == 8, s"lost audit rows: ${runs.length} of 8")
    assert(runs.forall(_.getAs[String]("status") == "SUCCESS"))
  }
}
