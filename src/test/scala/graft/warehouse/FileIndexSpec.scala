package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FileIndexSpec extends SparkSpec {
  import spark.implicits._

  /** A many-file table keyed by a column with NO file-level locality:
    * key = id scrambled, so every file's min/max spans ~the whole domain
    * and footer stats alone could never skip anything.
    */
  private def makeTable(path: String, rows: Int = 20000, perFile: Int = 1000): Unit =
    spark.range(rows)
      .select((col("id") * 2654435761L % 1000003L).as("k"),
        col("id").as("payload"))
      .write.option("maxRecordsPerFile", perFile)
      .mode("overwrite").parquet(path)

  test("lookup is exact and reads only Bloom-surviving files") {
    val dir = tmpDir("fidx")
    val table = s"$dir/tbl"
    val index = s"$dir/idx"
    makeTable(table)
    val nFiles = FileIndex.build(spark, table, "k", index,
      expectedPerFile = 2000, numBits = 40000)
    assert(nFiles >= 10, s"fixture must be many-file, got $nFiles")

    val keys = spark.range(5).select((col("id") * 7 * 2654435761L % 1000003L).as("k"))
    val pruning = FileIndex.pruneFiles(spark, table, index, keys)
    assert(pruning.candidates.nonEmpty)
    assert(pruning.candidates.size < pruning.totalFiles / 2,
      s"index must skip most files: ${pruning.candidates.size}/${pruning.totalFiles}")

    val got = FileIndex.lookup(spark, table, index, "k", keys)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.read.parquet(table)
      .join(broadcast(keys), Seq("k"), "left_semi")
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "pruned lookup must equal the full-scan filter")
    assert(got.nonEmpty)
  }

  test("absent keys prune to ~fpp of the file set and return zero rows") {
    val dir = tmpDir("fidx")
    val table = s"$dir/tbl"
    val index = s"$dir/idx"
    makeTable(table)
    FileIndex.build(spark, table, "k", index, expectedPerFile = 2000, numBits = 40000)
    // Keys outside the residue domain: never present.
    val absent = spark.range(20).select((lit(2000000L) + col("id")).as("k"))
    val pruning = FileIndex.pruneFiles(spark, table, index, absent)
    assert(pruning.candidates.size <= pruning.totalFiles / 4,
      s"absent keys should survive in few files: " +
        s"${pruning.candidates.size}/${pruning.totalFiles}")
    assert(FileIndex.lookup(spark, table, index, "k", absent).count() == 0)
  }

  test("a rewritten table fails the staleness gate instead of lying") {
    val dir = tmpDir("fidx")
    val table = s"$dir/tbl"
    val index = s"$dir/idx"
    makeTable(table)
    FileIndex.build(spark, table, "k", index, expectedPerFile = 2000, numBits = 40000)
    // Append new files the index has never seen.
    spark.range(100).select(lit(999999L).as("k"), col("id").as("payload"))
      .write.mode("append").parquet(table)
    val keys = Seq(999999L).toDF("k")
    val e = intercept[IllegalArgumentException](
      FileIndex.lookup(spark, table, index, "k", keys))
    assert(e.getMessage.contains("stale"))
    // Rebuild heals it — and the new key is now findable.
    FileIndex.build(spark, table, "k", index, expectedPerFile = 2000, numBits = 40000)
    assert(FileIndex.lookup(spark, table, index, "k", keys).count() == 100)
  }
}
