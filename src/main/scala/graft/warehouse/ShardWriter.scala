package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** Training-shard export — the writer side of a data-curation pipeline:
  * directory-partitioned by the routing columns (e.g. `split`, `lang`)
  * with BOUNDED shard files (`maxRecordsPerFile`), so downstream loaders
  * stream fixed-size shards instead of one unbounded file per partition.
  *
  * Scale notes: `maxRecordsPerFile` caps are enforced per task writer, so
  * the bound holds regardless of executor count; routing columns become
  * directory partitions (readable with partition pruning); no coalesce —
  * write parallelism stays at the upstream partitioning. For exact-count
  * shards (sequence-packed data) pre-partition by the pack's sequence key
  * before calling this.
  */
object ShardWriter {

  final case class ShardReport(rows: Long, files: Long)

  def writeShards(df: DataFrame, path: String, partitionCols: Seq[String],
                  maxRecordsPerFile: Long, format: String = "parquet"): ShardReport = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    // Row accounting rides the write itself via an Observation (the
    // CollectMetrics node sees every row the writer sees) — previously a
    // post-write re-read counted the output, a second full pass over data
    // that was just streamed through this JVM. The file count stays a
    // metadata listing (O(files), no data pages touched).
    val obs = Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)
    val spark = df.sparkSession
    val files = countDataFiles(spark, path)
    ShardReport(obs.get("rows").asInstanceOf[Long], files)
  }

  private def countDataFiles(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val p = new Path(path)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = hfs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }
}
