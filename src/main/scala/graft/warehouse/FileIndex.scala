package graft.warehouse

import java.io.ByteArrayInputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnOps
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom index — file skipping for point lookups on a NON-sort
  * key. Parquet footers already answer "can this file contain key k?"
  * for the clustered column (min/max — what [[ZOrder]] exploits); for
  * any other high-cardinality column the min/max span of every file is
  * ~the whole domain and nothing skips. This index stores, per data
  * file, a Bloom filter of the key column (plus min/max/count), so a
  * point lookup reads ONLY the files whose filter claims the key —
  * ~fpp × files false-positive reads, zero false negatives (the Delta/
  * Iceberg bloom-column story, built from Spark's own
  * `BloomFilterAggregate`; the probe blob format round-trips through
  * `org.apache.spark.util.sketch.BloomFilter`).
  *
  * Scale shape: the build is ONE scan of the table (groupBy on
  * `input_file_name()` — partial aggregation collapses each task to a
  * blob before the files-sized shuffle). The index itself is
  * files-count-sized metadata (a few KB per file), read once per lookup
  * and probed driver-side; the data read that follows is a pruned
  * parquet scan of just the surviving files with the key predicate
  * pushed down. Lookups never touch non-candidate files at all.
  *
  * Staleness is detected, not tolerated: the index records the exact
  * file set it covers, and [[lookup]] fails loudly if the table has
  * files the index has never seen (a merge/compaction rewrote data) —
  * a silent stale index would produce false NEGATIVES, which a Bloom
  * contract must never do. Rebuild after rewrites (the build cost is
  * one scan; at 100 TB, index per-partition and rebuild only rewritten
  * partitions).
  */
object FileIndex {

  /** Lookup pruning evidence: candidate files vs the table's total. */
  final case class Pruning(candidates: Seq[String], totalFiles: Int)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Normalized paths of every data file under `tablePath` (dot/underscore
    * dirs and files — staging, versions, markers — excluded, like Spark's
    * own file index does).
    */
  private def dataFiles(spark: SparkSession, tablePath: String): Seq[String] = {
    val hfs = fs(spark, tablePath)
    def walk(p: Path): Seq[String] =
      hfs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) Nil
        else if (s.isDirectory) walk(s.getPath)
        else Seq(s.getPath.toUri.getPath)
      }
    walk(new Path(tablePath))
  }

  /** Build the index over `keyCol` into `indexPath` (staged-swap
    * installed). Returns the number of files indexed. `numBits` is the
    * per-file filter size: ~10 bits/key ≈ 1% fpp at `expectedPerFile`.
    */
  def build(spark: SparkSession, tablePath: String, keyCol: String, indexPath: String,
            expectedPerFile: Long = 1000000L, numBits: Long = 10000000L): Long = {
    val agg = new BloomFilterAggregate(
      ColumnOps.expression(xxhash64(col(keyCol))),
      Literal(expectedPerFile), Literal(numBits)).toAggregateExpression()
    val idx = spark.read.parquet(tablePath)
      .withColumn("__file", input_file_name())
      .groupBy(col("__file").as("file"))
      .agg(ColumnOps.column(agg).as("bloom"),
        count(lit(1)).as("n_rows"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
    StateFiles.install(spark, indexPath, idx)
    spark.read.parquet(indexPath).count()
  }

  /** The files that might contain any of `keys` (single-column frame,
    * same type as the indexed column) plus the table total — exposed
    * separately so operators and specs can assert pruning, not trust it.
    */
  def pruneFiles(spark: SparkSession, tablePath: String, indexPath: String,
                 keys: DataFrame): Pruning = {
    val current = dataFiles(spark, tablePath)
    // The index stores input_file_name() URIs (file:///…); normalize both
    // sides to bare paths so the staleness check compares like with like.
    val idxRows = spark.read.parquet(indexPath)
      .select("file", "bloom").collect()
      .map(r => (new Path(r.getString(0)).toUri.getPath, r.getAs[Array[Byte]]("bloom")))
    val indexed = idxRows.map(_._1).toSet
    val unindexed = current.filterNot(indexed.contains)
    require(unindexed.isEmpty,
      s"FileIndex at $indexPath is stale: ${unindexed.size} table file(s) " +
        s"not covered (e.g. ${unindexed.headOption.getOrElse("")}) — rebuild")

    val hashes: Array[Long] = keys.toDF("k")
      .select(xxhash64(col("k")).as("h")).distinct()
      .collect().map(_.getLong(0))
    val currentSet = current.toSet
    val candidates = idxRows.toSeq.collect {
      case (file, blob) if currentSet.contains(file) && Option(blob).exists { b =>
          val bf = BloomFilter.readFrom(new ByteArrayInputStream(b))
          hashes.exists(bf.mightContainLong)
        } => file
    }
    Pruning(candidates, current.size)
  }

  /** Point lookup: exact rows of `tablePath` whose `keyCol` is in `keys`,
    * reading only Bloom-surviving files. Bloom false positives are
    * removed by the pushed key predicate (a broadcast semi-join against
    * the key set), so the result is exact.
    */
  def lookup(spark: SparkSession, tablePath: String, indexPath: String,
             keyCol: String, keys: DataFrame): DataFrame = {
    val pruning = pruneFiles(spark, tablePath, indexPath, keys)
    val keySet = keys.toDF(keyCol)
    if (pruning.candidates.isEmpty)
      spark.read.parquet(tablePath).limit(0)
    else
      spark.read.parquet(pruning.candidates: _*)
        .join(broadcast(keySet), Seq(keyCol), "left_semi")
  }
}
