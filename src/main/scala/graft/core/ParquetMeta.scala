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

  /** Total rows across all `*.parquet` data files under `path` (a single
    * file or a directory tree; `_`/`.`-prefixed entries are metadata and
    * skipped, matching Spark's own data-file convention).
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val hfs = p.getFileSystem(conf)
    val it = hfs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") &&
        !name.startsWith("_") && !name.startsWith(".")) {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try n += reader.getRecordCount
        finally reader.close()
      }
    }
    n
  }
}
