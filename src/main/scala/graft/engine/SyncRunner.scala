package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.Settings
import graft.meta.{Checkpoints, History}
import graft.sources.Readers
import graft.transform.Clean
import graft.warehouse.MergeWriter

/** One incremental sync run and its outcome (reference
  * src/services/etl.py:181-261).
  */
final case class SyncResult(
    runId: String,
    source: String,
    collection: String,
    status: String, // SUCCESS | FAILED
    recordsSynced: Long,
    newWatermark: Option[Timestamp],
    message: String)

/** The engine: incremental scan → watermark filter → clean → bucketed
  * last-write-wins merge → checkpoint advance → audit log. The Spark-first
  * restatement of the reference's `sync_collection_streaming`
  * (reference src/services/etl.py:181-261); SURVEY.md §3.1 step 6.
  *
  * Semantics preserved:
  *  - strict `>` watermark predicate, pushed into the scan (etl.py:208-211);
  *  - first run = full scan ("no checkpoint found");
  *  - checkpoint advances only after a fully successful merge, so failure +
  *    replay is at-least-once over an idempotent merge = effectively-once
  *    (etl.py:248, SURVEY.md §2.I S7);
  *  - per-run STARTED → SUCCESS/FAILED audit rows with record counts and a
  *    `"Synced N rows ... in D.DDs"` message (etl.py:251-253).
  *
  * Deliberately NOT preserved: per-batch driver-side chunking. The reference
  * pulls 5000-doc buffers through the driver because pandas is
  * single-machine; Spark processes the whole incremental slice as one
  * distributed job — partitioning, not buffering, bounds memory.
  *
  * `clock` and `runIdGen` are injectable for deterministic tests
  * (SURVEY.md §7.4 item 3).
  */
final class SyncRunner(
    spark: SparkSession,
    settings: Settings,
    clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    runIdGen: () => String = () => java.util.UUID.randomUUID().toString) {

  private val metaDir = s"${settings.warehouseDir}/_meta"
  val checkpoints = new Checkpoints(spark, metaDir)
  val history = new History(spark, metaDir)

  def tablePath(collection: String): String = s"${settings.warehouseDir}/$collection"

  def readTable(collection: String): DataFrame =
    MergeWriter.read(spark, tablePath(collection))

  /** Incrementally sync one (source, collection) pair. */
  def syncCollection(
      sourceName: String,
      sourcePath: String,
      collection: String,
      schema: Option[StructType] = None): SyncResult = {
    require(Settings.validCollectionName(collection),
      s"invalid collection name '$collection' (must match ${Settings.CollectionNamePattern})")

    val runId = runIdGen()
    val startedAt = clock()
    history.logStart(runId, sourceName, collection, startedAt)
    try {
      val loaded = Readers.good(Readers.load(spark, sourcePath, schema))
      // Type normalization (reference capability: datetime → timestamp,
      // UTC-coerced — src/services/etl.py:98-110): schema-inferred JSON
      // yields ISO strings for the watermark column; coerce it so watermark
      // arithmetic is well-typed. Unparseable values become null, which —
      // like Mongo docs missing `updated_at` — never match the strict-`>`
      // predicate.
      val raw = loaded.schema.fields.find(_.name == settings.watermarkCol) match {
        case Some(f) if f.dataType == org.apache.spark.sql.types.StringType =>
          loaded.withColumn(settings.watermarkCol,
            expr(s"try_to_timestamp(`${settings.watermarkCol}`)"))
        case Some(_) => loaded
        case None =>
          sys.error(s"watermark column '${settings.watermarkCol}' missing in $sourcePath")
      }
      val hwm = checkpoints.lastSynced(sourceName, collection)
      // Strict `>` watermark — pushed into the parquet/JSON scan by Catalyst.
      // Cached: the slice feeds both the watermark agg and the merge, and a
      // mutable source file must not be re-read between the two.
      val slice = hwm.fold(raw)(ts => raw.filter(col(settings.watermarkCol) > lit(ts))).cache()
      try {
        // One distributed pass computes the new high-water mark (A0: running
        // max) — grabbed before the merge so a merge failure never advances it.
        val newHwmRow = slice.agg(max(col(settings.watermarkCol))).collect().head
        val newHwm = Option(newHwmRow.getTimestamp(0))

        val cleaned = Clean(slice, sourceName, syncedAt = clock())
        val n = MergeWriter.merge(spark, tablePath(collection), cleaned,
          numBuckets = settings.numBuckets)

        newHwm.foreach(ts => checkpoints.advance(sourceName, collection, ts))

        val completedAt = clock()
        val secs = (completedAt.getTime - startedAt.getTime) / 1000.0
        val msg = f"Synced $n rows for '$collection' from '$sourceName' in $secs%.2fs"
        // The sync is already durable here (merge committed, checkpoint
        // advanced) — an audit-log write failure must not relabel it
        // FAILED through the outer catch-all.
        try history.logEnd(runId, sourceName, collection, "SUCCESS", startedAt, completedAt, n, msg)
        catch {
          case e: Exception =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"audit logEnd failed for committed sync $runId: ${e.getMessage}")
        }
        SyncResult(runId, sourceName, collection, "SUCCESS", n, newHwm, msg)
      } finally slice.unpersist()
    } catch {
      case e: Exception =>
        val completedAt = clock()
        val msg = s"Sync failed for '$collection' from '$sourceName': ${e.getMessage}"
        history.logEnd(runId, sourceName, collection, "FAILED", startedAt, completedAt, 0L, msg)
        SyncResult(runId, sourceName, collection, "FAILED", 0L, None, msg)
    }
  }

  /** Resolve a collection's data path under a source root — the analogue of
    * the reference's database/collection resolution (etl.py:198-203, SRC2).
    * Accepts `<root>/<collection>` as a directory or a
    * `.ndjson`/`.json`/`.parquet` file.
    */
  def resolveCollectionPath(sourceRoot: String, collection: String): String = {
    val hfs = new org.apache.hadoop.fs.Path(sourceRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val candidates = Seq(
      s"$sourceRoot/$collection",
      s"$sourceRoot/$collection.ndjson",
      s"$sourceRoot/$collection.json",
      s"$sourceRoot/$collection.parquet")
    candidates.find(c => hfs.exists(new org.apache.hadoop.fs.Path(c)))
      .getOrElse(sys.error(s"collection '$collection' not found under $sourceRoot"))
  }

  /** Scheduled-run semantics: every target collection × every source,
    * log-and-continue on per-pair failure (reference src/main.py:27-45).
    */
  def scheduledRun(schemas: Map[String, StructType] = Map.empty): Seq[SyncResult] =
    for {
      collection <- settings.targetCollections.map(_.trim).filter(_.nonEmpty)
      (name, root) <- settings.sources.toSeq.sortBy(_._1)
    } yield
      try syncCollection(name, resolveCollectionPath(root, collection), collection,
        schemas.get(collection))
      catch {
        case e: Exception =>
          SyncResult("", name, collection, "FAILED", 0L, None,
            s"Sync failed for '$collection' from '$name': ${e.getMessage}")
      }
}
