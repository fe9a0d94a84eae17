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
    assert(report.rowsCompacted == 10000 && ParquetMeta.rowCount(spark, dir) == 10000)
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
    assert(report.leavesCompacted == 0 && report.rowsCompacted == 0,
      "no-op runs must not even read footers for untouched leaves")
    assert(parquetFiles(dir).map(_.getName).toSet == names, "files must be untouched")
  }

  test("mixed layouts: a leaf with visible subdirs compacts only its direct files") {
    val dir = tmpDir("compact-mixed")
    spark.range(1000).repartition(8).write.mode("overwrite").parquet(dir)
    spark.range(1000, 1500).repartition(5)
      .write.mode("overwrite").parquet(s"$dir/sub")
    val report = Compactor.compact(spark, dir, targetBytes = 512L << 20)
    // Both leaves compact independently; the parent rewrite must not
    // absorb (and thereby duplicate) the nested rows.
    assert(report.leavesSeen == 2 && report.leavesCompacted == 2, report.summary)
    assert(spark.read.parquet(s"$dir/sub").count() == 500)
    val all = spark.read.option("recursiveFileLookup", "true").parquet(dir)
    assert(all.count() == 1500, "no row may be duplicated or lost across the layout")
  }

  test("schema-heterogeneous leaves are skipped, never rewritten lossily") {
    val dir = tmpDir("compact-evolved")
    // Schema evolution across batches: later files carry an extra column.
    spark.range(500).select(col("id")).coalesce(3)
      .write.mode("append").parquet(dir)
    spark.range(500, 1000).select(col("id"), lit("x").as("tag")).coalesce(3)
      .write.mode("append").parquet(dir)
    val names = parquetFiles(dir).map(_.getName).toSet
    assert(names.size >= 6, "fixture must be fragmented enough to trigger compaction")
    val report = Compactor.compact(spark, dir, targetBytes = 512L << 20)
    assert(report.leavesCompacted == 0, "a heterogeneous leaf must be left untouched")
    assert(parquetFiles(dir).map(_.getName).toSet == names, "files must be untouched")
    // The evolved column is still fully readable the way evolution intends.
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "tag"))
    assert(merged.filter(col("tag").isNotNull).count() == 500)
  }

  test("crash recovery: pre-commit rolls back, post-commit rolls forward") {
    import org.apache.hadoop.fs.Path
    val hfs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Pre-commit crash: originals moved to .compact_bak, tmp written, NO
    // marker → recover must restore the originals and drop the rewrite.
    val d1 = tmpDir("compact-crash-back")
    spark.range(500).repartition(6).write.mode("overwrite").parquet(d1)
    val leaf1 = new Path(d1)
    val bak1 = new Path(leaf1, ".compact_bak")
    hfs.mkdirs(bak1)
    spark.read.parquet(d1).repartition(1)
      .write.mode("overwrite").parquet(new Path(leaf1, ".compact_tmp").toString)
    parquetFiles(d1).foreach { f =>
      hfs.rename(new Path(f.getPath), new Path(bak1, f.getName))
    }
    assert(parquetFiles(d1).isEmpty, "simulated crash: leaf emptied")
    Compactor.compact(spark, d1, targetBytes = 512L << 20)
    assert(spark.read.parquet(d1).count() == 500, "rollback must restore the originals")
    assert(!hfs.exists(bak1) && !hfs.exists(new Path(leaf1, ".compact_tmp")))

    // Post-commit crash: same state PLUS the marker → recover must
    // finish installing the rewrite.
    val d2 = tmpDir("compact-crash-fwd")
    spark.range(700).repartition(6).write.mode("overwrite").parquet(d2)
    val leaf2 = new Path(d2)
    val bak2 = new Path(leaf2, ".compact_bak")
    hfs.mkdirs(bak2)
    spark.read.parquet(d2).repartition(1)
      .write.mode("overwrite").parquet(new Path(leaf2, ".compact_tmp").toString)
    parquetFiles(d2).foreach { f =>
      hfs.rename(new Path(f.getPath), new Path(bak2, f.getName))
    }
    hfs.create(new Path(leaf2, ".compact_commit"), true).close()
    Compactor.compact(spark, d2, targetBytes = 512L << 20)
    assert(spark.read.parquet(d2).count() == 700, "roll-forward must install the rewrite")
    assert(parquetFiles(d2).size == 1, "installed leaf must be the compacted form")
    assert(!hfs.exists(bak2) && !hfs.exists(new Path(leaf2, ".compact_commit")))
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
