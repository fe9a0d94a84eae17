package graft.meta

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only run-audit log — `sync_history(id, source, collection, status,
  * started_at, completed_at, records_synced, message)`, the Spark
  * restatement of the reference's audit relation (reference
  * src/core/db.py:54-69, src/services/etl.py:153-179).
  *
  * The reference INSERTs a STARTED row then UPDATEs it in place; an
  * append-only parquet log can't update, so we append start and end events
  * and fold to the latest event per id at read time (SURVEY.md §2.A SNK5).
  * Appends are new parquet files — safe under concurrent writers, no
  * rewrite amplification.
  */
final class History(spark: SparkSession, metaDir: String) {
  import spark.implicits._

  private val path = s"$metaDir/sync_history"

  private def exists: Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def append(id: String, source: String, collection: String, status: String,
                     startedAt: Timestamp, completedAt: Option[Timestamp],
                     records: Long, message: String, seq: Int): Unit =
    Seq((id, source, collection, status, startedAt, completedAt.orNull, records, message, seq))
      .toDF("id", "source", "collection", "status", "started_at", "completed_at",
        "records_synced", "message", "event_seq")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(path)

  /** Record a STARTED event; returns the run id. */
  def logStart(id: String, source: String, collection: String, startedAt: Timestamp): String = {
    append(id, source, collection, "STARTED", startedAt, None, 0L, "", seq = 0)
    id
  }

  /** Record the terminal SUCCESS/FAILED event for a run. */
  def logEnd(id: String, source: String, collection: String, status: String,
             startedAt: Timestamp, completedAt: Timestamp, records: Long,
             message: String): Unit =
    append(id, source, collection, status, startedAt, Some(completedAt), records, message, seq = 1)

  /** Latest event per run id. A fresh warehouse yields a TYPED empty
    * DataFrame (a schemaless one would make recentRuns' orderBy throw
    * UNRESOLVED_COLUMN on first use).
    */
  def runs(): DataFrame =
    if (!exists)
      Seq.empty[(String, String, String, String, Timestamp, Timestamp, Long, String, Int)]
        .toDF("id", "source", "collection", "status", "started_at", "completed_at",
          "records_synced", "message", "event_seq")
    else
      graft.warehouse.MergeWriter.latestByKey(
        spark.read.parquet(path), "id", Seq(desc("event_seq")))

  /** Recent-N audit query — `ORDER BY started_at DESC LIMIT n` (reference
    * src/api/routes.py:114-129) → TakeOrderedAndProject, no global sort.
    */
  def recentRuns(n: Int = 50): DataFrame =
    runs().orderBy(desc("started_at"), desc("id")).limit(n)
}
