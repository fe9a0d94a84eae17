package graft.api

import java.util.concurrent.ConcurrentHashMap

import scala.concurrent.{ExecutionContext, Future}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.core.Settings
import graft.engine.{SyncResult, SyncRunner}

/** Control plane — the library mirror of the reference's REST surface
  * (reference src/api/routes.py; SURVEY.md §2.K). The queries, not the HTTP
  * transport, are the capability: health, on-demand trigger with per-source
  * task status, recent-runs log, scheduled loop.
  */
final class SyncService(runner: SyncRunner, settings: Settings,
                        taskTtlSeconds: Long = 3600,
                        clock: () => Long = () => System.currentTimeMillis())(
    implicit ec: ExecutionContext) {

  // task_id → (created_ms, source → status). The reference keeps this in
  // Redis with a 1h TTL (routes.py:21-29,91-93); driver-side state is the
  // Spark-native equivalent — it is not a data-plane concern. The same
  // TTL applies here (sweep on every access), or a long-lived driver
  // accumulates one entry per trigger forever. Like the reference's
  // un-refreshed `expire` at creation, the TTL is from CREATION: a sync
  // still running past it reads as absent (its terminal state lives in
  // the durable sync_history audit log, not here).
  private val tasks =
    new ConcurrentHashMap[String, (Long, ConcurrentHashMap[String, String])]()

  private def sweepExpired(): Unit = {
    val cutoff = clock() - taskTtlSeconds * 1000L
    tasks.entrySet().removeIf(e => e.getValue._1 < cutoff)
  }

  /** `GET /health` parity (routes.py:31-75): can we see the warehouse and is
    * the session alive?
    */
  def health(): Map[String, String] = {
    val sparkOk =
      try { runner.checkpoints.all(); "ok" }
      catch { case e: Exception => s"error: ${e.getMessage}" }
    Map("status" -> (if (sparkOk == "ok") "ok" else "degraded"), "warehouse" -> sparkOk)
  }

  /** `POST /sync/{collection}` parity (routes.py:77-102): validate the name,
    * mint a task id, fan one async sync per source, return immediately.
    */
  def triggerSync(collection: String): String = {
    require(Settings.validCollectionName(collection),
      s"invalid collection name '$collection'")
    sweepExpired()
    val taskId = java.util.UUID.randomUUID().toString
    val statuses = new ConcurrentHashMap[String, String]()
    settings.sources.keys.foreach(statuses.put(_, "pending"))
    tasks.put(taskId, (clock(), statuses))
    settings.sources.foreach { case (name, root) =>
      Future {
        statuses.put(name, "running")
        val res =
          try runner.syncCollection(name, runner.resolveCollectionPath(root, collection), collection)
          catch { case e: Exception => SyncResult("", name, collection, "FAILED", 0, None, e.getMessage) }
        statuses.put(name,
          if (res.status == "SUCCESS") s"success: ${res.recordsSynced} records"
          else s"failed: ${res.message}")
      }
    }
    taskId
  }

  /** `GET /sync/status/{task_id}` parity (routes.py:104-112); expired
    * tasks read as absent, exactly like a lapsed Redis key.
    */
  def status(taskId: String): Option[Map[String, String]] = {
    sweepExpired()
    Option(tasks.get(taskId)).map(_._2.asScala.toMap)
  }

  /** `GET /sync/logs?limit=` parity (routes.py:128-136). */
  def recentLogs(limit: Int = 50): DataFrame = runner.history.recentRuns(limit)

  /** The scheduled job body (src/main.py:27-45). */
  def scheduledRun(): Seq[SyncResult] = runner.scheduledRun()
}
