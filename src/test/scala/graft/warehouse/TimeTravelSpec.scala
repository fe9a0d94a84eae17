package graft.warehouse

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, Timestamp)*): DataFrame =
    rows.toDF("_id", "payload", "_synced_at")

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
  private val t3 = Timestamp.valueOf("2024-01-03 00:00:00")

  private def snapshot(df: DataFrame): Set[(String, String)] =
    df.select("_id", "payload").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("every retained version reconstructs exactly, including updates and inserts") {
    val path = tmpDir("tt") + "/tbl"
    // Few buckets so versions share and churn bucket dirs aggressively.
    val (n1, v1) = TimeTravel.mergeVersioned(spark, path,
      batch(("1", "a", t1), ("2", "b", t1)), numBuckets = 4)
    assert(n1 == 2 && v1 == 1)
    val s1 = snapshot(MergeWriter.read(spark, path))

    val (_, v2) = TimeTravel.mergeVersioned(spark, path,
      batch(("1", "a2", t2), ("3", "c", t2)), numBuckets = 4)
    assert(v2 == 2)
    val s2 = snapshot(MergeWriter.read(spark, path))

    val (_, v3) = TimeTravel.mergeVersioned(spark, path,
      batch(("2", "b3", t3), ("9", "i", t3)), numBuckets = 4)
    assert(v3 == 3 && TimeTravel.currentVersion(spark, path) == 3)
    val s3 = snapshot(MergeWriter.read(spark, path))

    assert(snapshot(TimeTravel.readAsOf(spark, path, 1)) == s1)
    assert(snapshot(TimeTravel.readAsOf(spark, path, 2)) == s2)
    assert(snapshot(TimeTravel.readAsOf(spark, path, 3)) == s3)
    assert(s1 == Set("1" -> "a", "2" -> "b"))
    assert(s2 == Set("1" -> "a2", "2" -> "b", "3" -> "c"))
    assert(s3 == Set("1" -> "a2", "2" -> "b3", "3" -> "c", "9" -> "i"))
  }

  test("a bucket born in a later version is absent from earlier reads") {
    val path = tmpDir("tt") + "/tbl"
    // One key per bucket (numBuckets=64 default spreads them): key "only"
    // lands alone; later keys open fresh bucket dirs whose birth must not
    // leak into version 1.
    TimeTravel.mergeVersioned(spark, path, batch(("only", "x", t1)))
    (1 to 20).foreach { i =>
      TimeTravel.mergeVersioned(spark, path, batch((s"k$i", s"v$i", t2)))
    }
    val v1 = snapshot(TimeTravel.readAsOf(spark, path, 1))
    assert(v1 == Set("only" -> "x"),
      s"later-born buckets leaked into version 1: $v1")
    assert(TimeTravel.currentVersion(spark, path) == 21)
    assert(snapshot(TimeTravel.readAsOf(spark, path, 21)) ==
      snapshot(MergeWriter.read(spark, path)))
  }

  test("vacuum drops old versions loudly and keeps recent ones exact") {
    val path = tmpDir("tt") + "/tbl"
    TimeTravel.mergeVersioned(spark, path, batch(("1", "a", t1)), numBuckets = 2)
    TimeTravel.mergeVersioned(spark, path, batch(("1", "b", t2)), numBuckets = 2)
    val s2 = snapshot(MergeWriter.read(spark, path))
    TimeTravel.mergeVersioned(spark, path, batch(("1", "c", t3)), numBuckets = 2)

    val removed = TimeTravel.vacuum(spark, path, keepLast = 2)
    assert(removed >= 1, "version-1 archive should be vacuumed")
    assert(TimeTravel.oldestReadable(spark, path) == 2)
    intercept[IllegalArgumentException](TimeTravel.readAsOf(spark, path, 1))
    assert(snapshot(TimeTravel.readAsOf(spark, path, 2)) == s2)
    assert(snapshot(TimeTravel.readAsOf(spark, path, 3)) ==
      snapshot(MergeWriter.read(spark, path)))
  }

  test("out-of-range versions fail; a fresh table is version 0") {
    val path = tmpDir("tt") + "/tbl"
    assert(TimeTravel.currentVersion(spark, path) == 0)
    TimeTravel.mergeVersioned(spark, path, batch(("1", "a", t1)))
    intercept[IllegalArgumentException](TimeTravel.readAsOf(spark, path, 0))
    intercept[IllegalArgumentException](TimeTravel.readAsOf(spark, path, 2))
  }

  test("versioned and plain merges interleave: history stays readable") {
    val path = tmpDir("tt") + "/tbl"
    TimeTravel.mergeVersioned(spark, path, batch(("1", "a", t1)), numBuckets = 2)
    // A plain merge mutates live state WITHOUT a version bump — the
    // documented adoption contract: the next versioned read of `current`
    // simply sees the latest live state.
    MergeWriter.merge(spark, path, batch(("2", "b", t2)), numBuckets = 2)
    val (_, v) = TimeTravel.mergeVersioned(spark, path, batch(("1", "c", t3)), numBuckets = 2)
    assert(v == 2)
    // Version 1 reconstructs the state at the last versioned boundary
    // BEFORE the unversioned write for buckets it archived; key "1" must
    // show its version-1 payload.
    val v1 = snapshot(TimeTravel.readAsOf(spark, path, 1))
    assert(v1.contains("1" -> "a"))
    assert(snapshot(TimeTravel.readAsOf(spark, path, 2)) ==
      snapshot(MergeWriter.read(spark, path)))
  }

  test("rebucket preserves rows, routes merges correctly, and versions the rewrite") {
    val path = tmpDir("tt") + "/tbl"
    TimeTravel.mergeVersioned(spark, path,
      batch(("1", "a", t1), ("2", "b", t1), ("3", "c", t1)), numBuckets = 32)
    val s1 = snapshot(MergeWriter.read(spark, path))

    val (rows, v) = MergeWriter.rebucket(spark, path, "_id", newBuckets = 4)
    assert(rows == 3 && v == 2)
    assert(snapshot(MergeWriter.read(spark, path)) == s1,
      "rebucket must not change table content")
    // Pre-rebucket version still reconstructs from archives alone.
    assert(snapshot(TimeTravel.readAsOf(spark, path, 1)) == s1)

    // A merge AFTER rebucket must use the stored new modulus (a stale
    // modulus would route existing keys to fresh buckets and duplicate
    // them) — upsert key "1" and assert no duplicate appears.
    TimeTravel.mergeVersioned(spark, path, batch(("1", "a2", t2)), numBuckets = 32)
    val after = MergeWriter.read(spark, path)
    assert(after.count() == 3, "rebucketed table must not duplicate keys on merge")
    assert(snapshot(after) == Set("1" -> "a2", "2" -> "b", "3" -> "c"))
  }

  test("rebucket on an unversioned table stays unversioned and exact") {
    val path = tmpDir("tt") + "/tbl"
    MergeWriter.merge(spark, path, batch(("1", "a", t1), ("2", "b", t1)), numBuckets = 16)
    val s = snapshot(MergeWriter.read(spark, path))
    val (rows, v) = MergeWriter.rebucket(spark, path, "_id", newBuckets = 2)
    assert(rows == 2 && v == 0)
    assert(snapshot(MergeWriter.read(spark, path)) == s)
    MergeWriter.merge(spark, path, batch(("2", "b2", t2)))
    assert(snapshot(MergeWriter.read(spark, path)) == Set("1" -> "a", "2" -> "b2"))
  }
}
