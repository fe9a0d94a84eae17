package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.ParquetMeta

class CompactorSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.filterNot(x =>
        x.getName.startsWith("_") || x.getName.startsWith(".")).flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  test("compaction shrinks a many-small-file table losslessly") {
    val dir = tmpDir("compact-flat")
    spark.range(10000).repartition(24).write.mode("overwrite").parquet(dir)
    assert(parquetFiles(dir).size == 24)
    val report = Compactor.compact(spark, dir, targetBytes = 512L << 20)
    assert(report.leavesCompacted == 1 && report.filesBefore == 24)
    assert(parquetFiles(dir).size == 1, "one sub-target leaf must pack to one file")
    assert(report.rows == 10000 && ParquetMeta.rowCount(spark, dir) == 10000)
    assert(spark.read.parquet(dir).as[Long].collect().sorted.sameElements(0L until 10000L))
  }

  test("partition layout and pruning survive compaction; leaves compact independently") {
    val dir = tmpDir("compact-part")
    spark.range(3000)
      .select(col("id"), (col("id") % 3).as("p"))
      .repartition(10)
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val before = parquetFiles(dir).size
    assert(before >= 12, s"fixture must start fragmented, had $before files")
    val report = Compactor.compact(spark, dir, targetBytes = 512L << 20)
    assert(report.leavesSeen == 3 && report.leavesCompacted == 3)
    // Hive partition dirs intact — pruning still works.
    (0 to 2).foreach { p =>
      val rows = spark.read.parquet(dir).filter(col("p") === p).count()
      assert(rows == 1000, s"partition $p lost rows")
      assert(new java.io.File(s"$dir/p=$p").isDirectory)
    }
    assert(parquetFiles(dir).size == 3)
  }

  test("already-compact tables and sub-threshold leaves are metadata-only no-ops") {
    val dir = tmpDir("compact-noop")
    spark.range(100).coalesce(2).write.mode("overwrite").parquet(dir)
    val names = parquetFiles(dir).map(_.getName).toSet
    val report = Compactor.compact(spark, dir, targetBytes = 512L << 20, minFiles = 4)
    assert(report.leavesCompacted == 0 && report.rows == 100)
    assert(parquetFiles(dir).map(_.getName).toSet == names, "files must be untouched")
  }

  test("byte target caps output file count") {
    val dir = tmpDir("compact-target")
    spark.range(50000).select(col("id"), md5(col("id").cast("string")).as("pad"))
      .repartition(32).write.mode("overwrite").parquet(dir)
    val totalBytes = parquetFiles(dir).map(_.length()).sum
    // Pick a target that demands at least 3 output files.
    val target = totalBytes / 3
    Compactor.compact(spark, dir, targetBytes = target)
    val outFiles = parquetFiles(dir).size
    assert(outFiles >= 3 && outFiles < 32, s"expected 3..31 files, got $outFiles")
    assert(spark.read.parquet(dir).count() == 50000)
  }
}
