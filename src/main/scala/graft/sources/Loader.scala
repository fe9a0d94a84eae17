package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.warehouse.MergeWriter

/** Bulk file loader — the reference's `dump.py` as a library + CLI verb:
  * sniff format, stream-parse, batch-load into the warehouse, report
  * loaded/failed counts per collection (dump.py:61-114,172-220).
  *
  * Counts are computed scalably: good rows from the DROPMALFORMED scan,
  * malformed = non-blank physical lines minus good rows (no caching of the
  * parsed data, no driver materialization).
  */
object Loader {

  final case class LoadResult(collection: String, loaded: Long, malformed: Long, mode: String) {
    def summary: String =
      s"Loaded $loaded docs into '$collection' ($mode)" +
        (if (malformed > 0) s", skipped $malformed malformed lines" else "")
  }

  /** Load one file into `warehouseDir/collection`.
    *
    * @param mode `overwrite` = truncate-and-reload (dump.py:187-194);
    *             `merge` = last-write-wins upsert by `key`.
    */
  def load(spark: SparkSession, warehouseDir: String, filePath: String,
           collection: String, mode: String = "overwrite", key: String = "_id"): LoadResult = {
    require(graft.core.Settings.validCollectionName(collection),
      s"invalid collection name '$collection'")
    val fmt = Readers.detectFormat(spark, filePath)
    val df = Readers.load(spark, filePath)

    val malformed = fmt match {
      case Readers.Ndjson =>
        val physical = spark.read.text(filePath)
          .filter(length(trim(col("value"))) > 0).count()
        physical - df.count()
      case _ => 0L
    }

    val tablePath = s"$warehouseDir/$collection"
    val withKey = if (df.columns.contains(key)) df
      else df.withColumn(key, monotonically_increasing_id().cast("string"))
    val loaded = mode match {
      case "merge"     => MergeWriter.merge(spark, tablePath, withKey, key)
      case "overwrite" => MergeWriter.overwrite(spark, tablePath, withKey, key)
      case other       => sys.error(s"unknown load mode '$other' (overwrite|merge)")
    }
    LoadResult(collection, loaded, malformed, mode)
  }
}
