package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private def snapA = Seq(
    (1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L), (4L, null.asInstanceOf[String], 40L))
    .toDF("k", "s", "v")

  private def snapB = Seq(
    (1L, "x", 10L),   // same
    (2L, "y", 21L),   // changed: v
    (4L, "w", 40L),   // changed: s (null -> value)
    (5L, "new", 50L)) // added; 3 removed
    .toDF("k", "s", "v")

  test("diff: added/removed/changed/same with null-safe column attribution") {
    val d = TableDiff.diff(snapA, snapB, Seq("k")).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("status"), r.getAs[String]("changed_cols")))).toMap
    assert(d(1L) == (("same", "")))
    assert(d(2L) == (("changed", "v")))
    assert(d(3L) == (("removed", "")))
    assert(d(4L) == (("changed", "s")), "null -> value must count as a change")
    assert(d(5L) == (("added", "")))
  }

  test("diffSummary: counts roll up exactly, per column") {
    val s = TableDiff.diffSummary(snapA, snapB, Seq("k")).collect().head
    assert(s.getAs[Long]("n_added") == 1 && s.getAs[Long]("n_removed") == 1)
    assert(s.getAs[Long]("n_changed") == 2 && s.getAs[Long]("n_same") == 1)
    assert(s.getAs[Long]("chg_s") == 1 && s.getAs[Long]("chg_v") == 1)
  }

  test("diff: identical snapshots are all-same; key-only tables work") {
    val same = TableDiff.diffSummary(snapA, snapA, Seq("k")).collect().head
    assert(same.getAs[Long]("n_same") == 4 &&
      same.getAs[Long]("n_changed") == 0 &&
      same.getAs[Long]("n_added") == 0 && same.getAs[Long]("n_removed") == 0)
  }

  test("fkAudit: clean star schema reports zero orphans on every edge") {
    val out = TableDiff.fkAudit(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0L,
        s"unexpected orphans on ${r.getAs[String]("edge")}")
      assert(r.getAs[Long]("n_child_rows") > 0L)
    }
  }

  test("fkAudit-style edge detects injected orphans and childless parents") {
    val child = Seq((1L, 100L), (2L, 100L), (3L, 999L)).toDF("id", "fk")
    val parent = Seq((100L, "a"), (200L, "b")).toDF("pk", "name")
    // Reuse diff's building block semantics through a minimal local audit.
    val orphans = child.join(parent, col("fk") === col("pk"), "left_anti").count()
    val childless = parent.join(child, col("pk") === col("fk"), "left_anti").count()
    assert(orphans == 1 && childless == 1)
  }
}
