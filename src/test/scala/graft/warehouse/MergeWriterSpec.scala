package graft.warehouse

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class MergeWriterSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, Timestamp)*): DataFrame =
    rows.toDF("_id", "payload", "_synced_at")

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-01-02 00:00:00")

  test("first merge auto-creates the table") {
    val path = tmpDir("mw") + "/tbl"
    val n = MergeWriter.merge(spark, path, batch(("1", "a", t1), ("2", "b", t1)))
    assert(n == 2)
    assert(MergeWriter.read(spark, path).count() == 2)
  }

  test("merge is last-write-wins by _synced_at") {
    val path = tmpDir("mw") + "/tbl"
    MergeWriter.merge(spark, path, batch(("1", "old", t1), ("2", "keep", t1)))
    MergeWriter.merge(spark, path, batch(("1", "new", t2)))
    val rows = MergeWriter.read(spark, path).orderBy("_id")
      .collect().map(r => (r.getAs[String]("_id"), r.getAs[String]("payload")))
    assert(rows.toSeq == Seq(("1", "new"), ("2", "keep")))
  }

  test("merge is idempotent — same batch twice leaves same state") {
    val path = tmpDir("mw") + "/tbl"
    val b = batch(("1", "a", t1), ("2", "b", t1), ("3", "c", t1))
    MergeWriter.merge(spark, path, b)
    MergeWriter.merge(spark, path, b)
    assert(MergeWriter.read(spark, path).count() == 3)
  }

  test("empty batch is a no-op") {
    val path = tmpDir("mw") + "/tbl"
    MergeWriter.merge(spark, path, batch(("1", "a", t1)))
    val n = MergeWriter.merge(spark, path, batch().limit(0))
    assert(n == 0)
    assert(MergeWriter.read(spark, path).count() == 1)
  }

  test("schema evolution: new column in later batch, old rows null") {
    val path = tmpDir("mw") + "/tbl"
    MergeWriter.merge(spark, path, batch(("1", "a", t1)))
    val wider = Seq(("2", "b", t2, "extra"))
      .toDF("_id", "payload", "_synced_at", "note")
    MergeWriter.merge(spark, path, wider)
    val out = MergeWriter.read(spark, path).orderBy("_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("note") == null)
    assert(out(1).getAs[String]("note") == "extra")
  }

  test("untouched buckets are not rewritten (partition-pruned merge)") {
    val path = tmpDir("mw") + "/tbl"
    // Many keys spread over buckets.
    val big = (1 to 200).map(i => (i.toString, s"v$i", t1)).toDF("_id", "payload", "_synced_at")
    MergeWriter.merge(spark, path, big)
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes: Map[String, Long] =
      hfs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.startsWith(MergeWriter.BucketCol))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = mtimes
    Thread.sleep(1100)
    // One-key batch touches exactly one bucket.
    MergeWriter.merge(spark, path, batch(("1", "v1b", t2)))
    val after = mtimes
    val changed = after.filter { case (k, v) => before.get(k).exists(_ != v) }.keys.toSet
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")
    // Data still complete and updated.
    val tbl = MergeWriter.read(spark, path)
    assert(tbl.count() == 200)
    assert(tbl.filter($"_id" === "1").head().getAs[String]("payload") == "v1b")
  }

  test("within-batch duplicate keys collapse to one row") {
    // The reference's PG upsert would ERROR on intra-batch dup keys
    // ("cannot affect row a second time"); we resolve deterministically by
    // _synced_at instead — a documented improvement (SURVEY.md §7.4 item 5).
    val path = tmpDir("mw") + "/tbl"
    MergeWriter.merge(spark, path, batch(("1", "first", t1), ("1", "second", t2)))
    val out = MergeWriter.read(spark, path).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("payload") == "second")
  }

  test("overwrite replaces table contents") {
    val path = tmpDir("mw") + "/tbl"
    MergeWriter.merge(spark, path, batch(("1", "a", t1), ("2", "b", t1)))
    MergeWriter.overwrite(spark, path, batch(("9", "z", t2)))
    val out = MergeWriter.read(spark, path).collect()
    assert(out.map(_.getAs[String]("_id")).toSeq == Seq("9"))
  }
}
