package graft.engine

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Settings

/** End-to-end engine scenarios ported from the reference's integration test
  * (reference tests/test_sync.py:11-46): 3 docs covering null scalars and a
  * nested struct, checkpoint creation, incremental resume syncing only
  * newer rows, idempotent re-run, failure not advancing the checkpoint,
  * and multi-source union with `_source` attribution.
  */
class SyncRunnerSpec extends SparkSpec {

  private def writeNdjson(dir: String, name: String, lines: Seq[String]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  // Explicit per-collection StructType — the engine's fixed-schema stance
  // vs the reference's per-batch inference (SURVEY.md §1.3).
  private val employeesSchema = StructType(Seq(
    StructField("_id", StringType),
    StructField("name", StringType),
    StructField("role", StringType),
    StructField("meta", StructType(Seq(StructField("foo", StringType)))),
    StructField("updated_at", TimestampType)))

  private val doc1 = """{"_id": "1", "name": "Alice", "role": "engineer", "meta": null, "updated_at": "2024-01-01T10:00:00.000Z"}"""
  private val doc2 = """{"_id": "2", "name": "Bob", "role": "manager", "meta": null, "updated_at": "2024-01-01T11:00:00.000Z"}"""
  private val doc3 = """{"_id": "3", "name": "Charlie", "role": null, "meta": {"foo": "bar"}, "updated_at": "2024-01-01T12:00:00.000Z"}"""
  private val doc4 = """{"_id": "4", "name": "Dana", "role": "analyst", "meta": null, "updated_at": "2024-01-02T09:00:00.000Z"}"""
  private val doc1v2 = """{"_id": "1", "name": "Alice2", "role": "principal", "meta": null, "updated_at": "2024-01-02T10:00:00.000Z"}"""

  private def newRunner(warehouse: String): SyncRunner = {
    var tick = 0L
    new SyncRunner(
      spark,
      Settings(warehouseDir = warehouse),
      clock = () => { tick += 1000; new Timestamp(1704067200000L + tick) },
      runIdGen = {
        var n = 0
        () => { n += 1; s"run-$n" }
      })
  }

  test("reference e2e: 3 docs with nulls + nested struct sync correctly") {
    val src = tmpDir("sync-src")
    val wh = tmpDir("sync-wh")
    val f = writeNdjson(src, "employees.ndjson", Seq(doc1, doc2, doc3))
    val runner = newRunner(wh)

    val res = runner.syncCollection("source_a", f, "employees", Some(employeesSchema))
    assert(res.status == "SUCCESS", res.message)
    assert(res.recordsSynced == 3)
    assert(res.message.startsWith("Synced 3 rows"))

    val tbl = runner.readTable("employees").orderBy("_id").collect()
    assert(tbl.length == 3)
    assert(tbl(0).getAs[String]("name") == "Alice")
    assert(tbl(2).getAs[String]("role") == null)
    assert(tbl(2).getAs[String]("meta") == """{"foo":"bar"}""")
    assert(tbl.forall(_.getAs[String]("_source") == "source_a"))
    assert(tbl.forall(_.getAs[Timestamp]("_synced_at") != null))

    // Checkpoint row exists with the max updated_at.
    val hwm = runner.checkpoints.lastSynced("source_a", "employees")
    assert(hwm.contains(Timestamp.valueOf("2024-01-01 12:00:00")))
  }

  test("incremental resume syncs only rows past the watermark") {
    val src = tmpDir("sync-src")
    val wh = tmpDir("sync-wh")
    val f = writeNdjson(src, "employees.ndjson", Seq(doc1, doc2, doc3))
    val runner = newRunner(wh)
    runner.syncCollection("source_a", f, "employees", Some(employeesSchema))

    // Append newer docs (one new, one update of _id=1).
    writeNdjson(src, "employees.ndjson", Seq(doc1, doc2, doc3, doc4, doc1v2))
    val res2 = runner.syncCollection("source_a", f, "employees", Some(employeesSchema))
    assert(res2.recordsSynced == 2, res2.message) // only the two newer rows

    val tbl = runner.readTable("employees").orderBy("_id").collect()
    assert(tbl.length == 4)
    assert(tbl(0).getAs[String]("name") == "Alice2") // last write won
    assert(runner.checkpoints.lastSynced("source_a", "employees")
      .contains(Timestamp.valueOf("2024-01-02 10:00:00")))
  }

  test("re-running with no new data is a zero-record no-op") {
    val src = tmpDir("sync-src")
    val wh = tmpDir("sync-wh")
    val f = writeNdjson(src, "employees.ndjson", Seq(doc1, doc2))
    val runner = newRunner(wh)
    runner.syncCollection("source_a", f, "employees", Some(employeesSchema))
    val res2 = runner.syncCollection("source_a", f, "employees", Some(employeesSchema))
    assert(res2.status == "SUCCESS")
    assert(res2.recordsSynced == 0)
    assert(runner.readTable("employees").count() == 2)
  }

  test("failed sync logs FAILED and does not advance the checkpoint") {
    val src = tmpDir("sync-src")
    val wh = tmpDir("sync-wh")
    val f = writeNdjson(src, "employees.ndjson", Seq(doc1))
    val runner = newRunner(wh)
    runner.syncCollection("source_a", f, "employees", Some(employeesSchema))
    val before = runner.checkpoints.lastSynced("source_a", "employees")

    val res = runner.syncCollection("source_a", s"$src/missing.ndjson", "employees", Some(employeesSchema))
    assert(res.status == "FAILED")
    assert(runner.checkpoints.lastSynced("source_a", "employees") == before)

    val runs = runner.history.recentRuns(10).collect()
    assert(runs.exists(_.getAs[String]("status") == "FAILED"))
    assert(runs.exists(_.getAs[String]("status") == "SUCCESS"))
  }

  test("multi-source sync unions with _source attribution") {
    val srcA = tmpDir("sync-a")
    val srcB = tmpDir("sync-b")
    val wh = tmpDir("sync-wh")
    writeNdjson(srcA, "employees.ndjson", Seq(doc1, doc2))
    writeNdjson(srcB, "employees.ndjson", Seq(doc3))
    var tick = 0L
    val runner = new SyncRunner(
      spark,
      Settings(
        warehouseDir = wh,
        sources = Map("alpha" -> srcA, "beta" -> srcB),
        targetCollections = Seq("employees")),
      clock = () => { tick += 1000; new Timestamp(1704067200000L + tick) })

    val results = runner.scheduledRun(Map("employees" -> employeesSchema))
    assert(results.forall(_.status == "SUCCESS"), results.map(_.message))

    val tbl = runner.readTable("employees")
    assert(tbl.count() == 3)
    val bySource = tbl.groupBy("_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == Map("alpha" -> 2L, "beta" -> 1L))
  }

  test("invalid collection name is rejected") {
    val runner = newRunner(tmpDir("sync-wh"))
    intercept[IllegalArgumentException] {
      runner.syncCollection("s", "/tmp/x", "bad name; drop table")
    }
  }
}
