package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.warehouse.MergeWriter

/** Bulk file loader — the reference's `dump.py` as a library + CLI verb:
  * sniff format, stream-parse, batch-load into the warehouse, report
  * loaded/failed counts per collection (dump.py:61-114,172-220).
  *
  * Counts are computed scalably: the good-row count rides the load's own
  * write via an Observation (no second parse pass), malformed = non-blank
  * physical lines (a cheap text scan, no JSON parsing) minus good rows —
  * no caching of the parsed data, no driver materialization.
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
    val raw = Readers.load(spark, filePath)

    // NDJSON malformed accounting: the parsed-good count is observed on
    // the load's own evaluation (MergeWriter's first action drives the
    // CollectMetrics node exactly once) instead of a df.count() that
    // re-parsed the whole file.
    val obs = fmt match {
      case Readers.Ndjson => Some(org.apache.spark.sql.Observation())
      case _              => None
    }
    val df = obs.map(o => raw.observe(o, count(lit(1)).as("good"))).getOrElse(raw)

    val tablePath = s"$warehouseDir/$collection"
    val withKey = if (df.columns.contains(key)) df
      else df.withColumn(key, monotonically_increasing_id().cast("string"))
    val loaded = mode match {
      case "merge"     => MergeWriter.merge(spark, tablePath, withKey, key)
      case "overwrite" => MergeWriter.overwrite(spark, tablePath, withKey, key)
      case other       => sys.error(s"unknown load mode '$other' (overwrite|merge)")
    }
    val malformed = obs.map { o =>
      val physical = spark.read.text(filePath)
        .filter(length(trim(col("value"))) > 0).count()
      physical - o.get("good").asInstanceOf[Long]
    }.getOrElse(0L)
    LoadResult(collection, loaded, malformed, mode)
  }
}
