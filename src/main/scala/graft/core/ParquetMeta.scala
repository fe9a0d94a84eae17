package graft.core

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Metadata-only parquet row counts: sum the footer record counts of every
  * data file under a path — no data pages are read, no Spark job runs.
  * Counting the input of a 100 TB pipeline must not cost a 100 TB pass
  * (and must not cost a cluster job at all: footers are O(files), read on
  * the driver like any other planning-time metadata).
  */
object ParquetMeta {

  /** Per-data-file (path, min, max) footer statistics of an integral
    * column under `path` — the metadata a stats-based reader consults to
    * skip files/row groups, surfaced so specs can assert a layout's
    * skipping power without tracing a scan. Footer-only, like
    * [[rowCount]]. Files lacking stats for the column are returned as
    * full-range (never skippable) — the conservative reading a real
    * engine takes.
    */
  def longRanges(spark: SparkSession, path: String, column: String): Seq[(String, Long, Long)] = {
    val root = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val hfs = root.getFileSystem(conf)
    val rootUri = root.toUri.getPath
    val it = hfs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    while (it.hasNext) {
      val f = it.next()
      // Same hidden-entry rule as rowCount: EVERY path component below
      // the root — a crashed write's _temporary/... must not appear as a
      // phantom (unskippable) file in the audit.
      val rel = f.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val hidden = rel.split("/").exists(c => c.startsWith("_") || c.startsWith("."))
      if (f.isFile && f.getPath.getName.endsWith(".parquet") && !hidden) {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          var lo = Long.MaxValue
          var hi = Long.MinValue
          var ok = true
          reader.getFooter.getBlocks.forEach { block =>
            block.getColumns.forEach { cc =>
              if (cc.getPath.toDotString == column) {
                val st: org.apache.parquet.column.statistics.Statistics[_ <: Comparable[_]] =
                  cc.getStatistics
                if (st == null || !st.hasNonNullValue) ok = false
                else st.genericGetMin match {
                  case n: java.lang.Number =>
                    lo = math.min(lo, n.longValue())
                    hi = math.max(hi, st.genericGetMax.asInstanceOf[java.lang.Number].longValue())
                  case _ => ok = false
                }
              }
            }
          }
          if (ok && lo <= hi) out += ((f.getPath.toString, lo, hi))
          else out += ((f.getPath.toString, Long.MinValue, Long.MaxValue))
        } finally reader.close()
      }
    }
    out.toSeq
  }

  /** Footer (physical) schema of a single parquet data file, as the
    * canonical message-type string — cheap driver-side metadata, used to
    * assert a file set is schema-homogeneous before a rewrite that would
    * otherwise silently drop columns absent from the sampled footer
    * (schema evolution across batches).
    */
  def fileSchema(spark: SparkSession, path: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    try reader.getFooter.getFileMetaData.getSchema.toString
    finally reader.close()
  }

  /** Total rows across all `*.parquet` data files under `path` (a single
    * file or a directory tree). `_`/`.`-prefixed entries are metadata and
    * skipped at EVERY path level below the root — a crashed write's
    * `_temporary/…/part-*.parquet` must not count, exactly as Spark's own
    * reader hides it. Layouts whose data files lack the `.parquet` suffix
    * (e.g. Hive-written `000000_0`) are outside this helper's contract —
    * count those through the reader.
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    val root = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val hfs = root.getFileSystem(conf)
    val rootUri = root.toUri.getPath
    val it = hfs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val hidden = rel.split("/").exists(c => c.startsWith("_") || c.startsWith("."))
      if (f.isFile && f.getPath.getName.endsWith(".parquet") && !hidden) {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try n += reader.getRecordCount
        finally reader.close()
      }
    }
    n
  }
}
