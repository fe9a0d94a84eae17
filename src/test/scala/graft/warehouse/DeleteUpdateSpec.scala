package graft.warehouse

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeleteUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(n: Int = 64, buckets: Int = 8): String = {
    val path = java.nio.file.Files.createTempDirectory("delupd").toString + "/t"
    val rows = (1 to n).map(i => (i.toLong, s"v$i", i % 10)).toDF("_id", "v", "grp")
    MergeWriter.merge(spark, path, rows, numBuckets = buckets)
    path
  }

  /** (fileName → mtime) for one bucket dir. */
  private def bucketFiles(path: String, b: Int): Map[String, Long] = {
    val dir = java.nio.file.Paths.get(path, s"${MergeWriter.BucketCol}=$b")
    if (!java.nio.file.Files.exists(dir)) Map.empty
    else {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
      finally s.close()
    }
  }

  test("deleteWhere removes exactly the TRUE-predicate rows; NULL keeps") {
    val path = freshTable()
    // Predicate is NULL for grp=3 rows (three-valued logic): standard
    // DELETE semantics keeps them.
    val pred = when(col("grp") === 3, lit(null).cast("boolean"))
      .otherwise(col("grp") < 2)
    val expectDeleted = (1 to 64).count(i => i % 10 == 0 || i % 10 == 1)
    val deleted = MergeWriter.deleteWhere(spark, path, pred)
    assert(deleted == expectDeleted.toLong)
    val left = MergeWriter.read(spark, path).collect()
      .map(r => (r.getAs[Long]("_id"), r.getAs[Int]("grp")))
    assert(left.length == 64 - expectDeleted)
    assert(left.forall { case (_, g) => g >= 2 })
    assert(left.exists(_._2 == 3), "NULL-predicate rows must survive")
  }

  test("deleteWhere rewrites only buckets containing a match") {
    val path = freshTable()
    val victim = 7L
    val vb = spark.range(1)
      .select(MergeWriter.bucketOf(lit(victim), 8)).head().getInt(0)
    val before = (0 until 8).map(b => b -> bucketFiles(path, b)).toMap
    val deleted = MergeWriter.deleteWhere(spark, path, col("_id") === victim)
    assert(deleted == 1L)
    (0 until 8).filter(_ != vb).foreach { b =>
      assert(bucketFiles(path, b) == before(b),
        s"bucket $b had no match and must be byte-untouched")
    }
    assert(bucketFiles(path, vb) != before(vb), "the victim's bucket was rewritten")
    assert(MergeWriter.read(spark, path).filter(col("_id") === victim).count() == 0)
  }

  test("updateWhere sets assignments on matches only; merges still route correctly") {
    val path = freshTable()
    val updated = MergeWriter.updateWhere(spark, path,
      col("grp") === 5, Map("v" -> concat(col("v"), lit("!"))))
    assert(updated == (1 to 64).count(_ % 10 == 5).toLong)
    val rows = MergeWriter.read(spark, path).collect()
      .map(r => (r.getAs[Long]("_id"), r.getAs[String]("v"), r.getAs[Int]("grp")))
    rows.foreach { case (id, v, g) =>
      if (g == 5) assert(v == s"v$id!", s"row $id must be updated")
      else assert(v == s"v$id", s"row $id must be untouched")
    }
    // A later merge still routes by the stored bucket modulus.
    MergeWriter.merge(spark, path, Seq((5L, "fresh", 99)).toDF("_id", "v", "grp"))
    val after = MergeWriter.read(spark, path)
    assert(after.filter(col("_id") === 5L).count() == 1, "no key duplication")
    assert(after.count() == 64)
  }

  test("updateWhere refuses to assign the bucket routing column") {
    val path = freshTable()
    intercept[IllegalArgumentException] {
      MergeWriter.updateWhere(spark, path, lit(true),
        Map(MergeWriter.BucketCol -> lit(0)))
    }
    intercept[IllegalArgumentException] {
      MergeWriter.updateWhere(spark, path, lit(true), Map("nope" -> lit(0)))
    }
  }

  test("delete on a versioned table captures the pre-delete state") {
    val path = java.nio.file.Files.createTempDirectory("delver").toString + "/t"
    val rows = (1 to 32).map(i => (i.toLong, i)).toDF("_id", "x")
    TimeTravel.mergeVersioned(spark, path, rows)
    val v1 = TimeTravel.currentVersion(spark, path)
    val deleted = MergeWriter.deleteWhere(spark, path, col("x") <= 10)
    assert(deleted == 10L)
    assert(MergeWriter.read(spark, path).count() == 22)
    val old = TimeTravel.readAsOf(spark, path, v1)
    assert(old.count() == 32, "the pre-delete version must reconstruct fully")
  }
}
