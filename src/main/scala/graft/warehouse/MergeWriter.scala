package graft.warehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent last-write-wins upsert into a bucketed parquet table —
  * the Spark-native equivalent of the reference's staging-table
  * `INSERT ... ON CONFLICT ("_id") DO UPDATE` sink (reference
  * src/services/etl.py:17-87) without requiring a MERGE-capable format.
  *
  * Scale design (SURVEY.md §7.4 item 1): the table is hash-partitioned into
  * `sync_bucket=N` subdirectories on the merge key. A merge:
  *
  *  1. computes the batch's bucket set (≤ numBuckets ints — driver-safe),
  *  2. reads ONLY those buckets of the existing table (partition pruning —
  *     untouched buckets are never scanned or rewritten, so merge cost is
  *     O(batch + affected buckets), not O(table)),
  *  3. unions by name (schema evolution tolerated), dedupes per key with a
  *     sort-free `max(struct(_synced_at, batch-wins, row))` hash aggregate,
  *  4. writes to a hidden staging dir and atomically swaps the affected
  *     bucket directories (rename live → .bak, staging → live, drop .bak).
  *
  * Crash safety: the swap is per-bucket-atomic, not table-atomic. The engine
  * invariant (reference etl.py:248, SURVEY.md §2.I S7) is that the sync
  * checkpoint advances only after a fully successful merge, and the merge is
  * idempotent — so replay after any partial failure converges to the same
  * state. A failed swap leaves a `.bak_` dir for manual recovery.
  *
  * At 100 TB you would raise `numBuckets` (e.g. 2^14) so each bucket stays
  * executor-sized; bucket count is fixed per table at creation.
  */
object MergeWriter {

  val BucketCol = "sync_bucket"
  val DefaultNumBuckets = 64

  // Writers to the same table must not interleave: the staging dir is per
  // table and the bucket swap is read-modify-write. Within ONE driver a
  // striped JVM lock per NORMALIZED table path serializes them (SyncService
  // fans out one Future per source against the same collection table).
  // Across drivers the JVM lock is invisible — pass `lease = true` to
  // also take the cross-driver [[LeaseLock]] (exclusive-create lease file
  // beside the table); single-driver deployments pay nothing.
  private def lockFor(tablePath: String): Object = graft.core.PathLocks.forPath(tablePath)

  private def withLease[T](spark: SparkSession, tablePath: String, lease: Boolean)(body: => T): T =
    LeaseLock.withLease(spark, tablePath, lease)(body)

  // The bucket count is a table-creation-time invariant: merging with a
  // different modulus would route existing keys to fresh buckets and
  // silently duplicate them. Persist it beside the data (dot-file —
  // invisible to parquet readers) and always prefer the stored value.
  private def bucketCountPath(tablePath: String): Path = new Path(tablePath, ".graft_buckets")

  private def readBucketCount(spark: SparkSession, tablePath: String): Option[Int] = {
    val hfs = fs(spark, tablePath)
    val p = bucketCountPath(tablePath)
    if (!hfs.exists(p)) None
    else {
      val in = hfs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  private def writeBucketCount(spark: SparkSession, tablePath: String, n: Int): Unit = {
    val out = fs(spark, tablePath).create(bucketCountPath(tablePath), true)
    try out.write(n.toString.getBytes("UTF-8"))
    finally out.close()
  }

  def bucketOf(key: Column, numBuckets: Int): Column =
    pmod(hash(key), lit(numBuckets))

  /** Reusable last-write-wins collapse: keep one row per key, preferring the
    * greatest `orderBy` columns. Nondeterministic only if the full ordering
    * ties (callers pass enough tiebreaks).
    */
  def latestByKey(df: DataFrame, key: String, orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Sort-free variant: keep the row with the LARGEST (rankCols...) tuple
    * per key via `max(struct(...))` — a plain hash aggregate with map-side
    * partials instead of a shuffle+sort window (measured ~5× faster on a
    * 6M-row dedupe). Equivalent to [[latestByKey]] with all-descending
    * ordering; nulls in rank columns sort last either way.
    */
  def maxByKey(df: DataFrame, key: String, rankCols: Seq[Column]): DataFrame = {
    val ranked = rankCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    val packed = struct((ranked :+ struct(df.columns.map(col): _*).as("__row")): _*)
    df.groupBy(col(key)).agg(max(packed).as("__m")).select(col("__m.__row.*"))
  }

  /** `max(struct(...))` requires every column to be orderable; MapType is
    * not. Rows with maps fall back to the window form (which only orders
    * by the rank columns).
    */
  private def hasUnorderable(schema: org.apache.spark.sql.types.StructType): Boolean = {
    def bad(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => bad(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => bad(a.elementType)
      case _ => false
    }
    schema.fields.exists(f => bad(f.dataType))
  }

  /** LWW collapse choosing the fastest legal plan for the schema. */
  private def lwwCollapse(df: DataFrame, key: String, rankCols: Seq[Column]): DataFrame =
    if (hasUnorderable(df.schema)) latestByKey(df, key, rankCols.map(_.desc))
    else maxByKey(df, key, rankCols)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tableExists(spark: SparkSession, tablePath: String): Boolean =
    fs(spark, tablePath).exists(new Path(tablePath))

  /** Read a merged table back, hiding the internal bucket column.
    * `mergeSchema` because buckets written before a schema evolution keep
    * the old (narrower) parquet schema.
    */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath).drop(BucketCol)

  /** Overwrite-load (truncate-and-reload, reference dump.py:187-194).
    * The loaded count is observed on the write itself — a post-write
    * re-read-and-count was a second full pass over the table.
    */
  def overwrite(spark: SparkSession, tablePath: String, df: DataFrame, key: String = "_id",
                numBuckets: Int = DefaultNumBuckets, lease: Boolean = false): Long =
    lockFor(tablePath).synchronized {
      withLease(spark, tablePath, lease) {
        val obs = org.apache.spark.sql.Observation()
        val bucketed = df.observe(obs, count(lit(1)).as("rows"))
          .withColumn(BucketCol, bucketOf(col(key), numBuckets))
        bucketed.write.mode("overwrite").partitionBy(BucketCol).parquet(tablePath)
        writeBucketCount(spark, tablePath, numBuckets)
        obs.get("rows").asInstanceOf[Long]
      }
    }

  /** Upsert `batch` into the table at `tablePath` keyed on `key`.
    * Last write wins by `_synced_at` (when present) with the incoming batch
    * winning ties — PostgreSQL `ON CONFLICT DO UPDATE` semantics. Returns
    * the number of DISTINCT keys upserted (the reference counts scanned
    * docs, etl.py:217 — ours is the post-collapse count, i.e. rows that
    * actually landed in the table).
    */
  def merge(spark: SparkSession, tablePath: String, batch: DataFrame, key: String = "_id",
            numBuckets: Int = DefaultNumBuckets, lease: Boolean = false): Long =
    lockFor(tablePath).synchronized {
      withLease(spark, tablePath, lease) {
        mergeImpl(spark, tablePath, batch, key, numBuckets)
      }
    }

  /** [[TimeTravel]]'s entry points: the same table lock + optional lease
    * discipline as [[merge]], exposed so the versioned wrapper can hold
    * ONE critical section around its version-counter bump and the merge.
    */
  private[warehouse] def withTableLock[T](spark: SparkSession, tablePath: String,
                                          lease: Boolean)(body: => T): T =
    lockFor(tablePath).synchronized(withLease(spark, tablePath, lease)(body))

  /** Unlocked merge with bucket archiving — callers hold [[withTableLock]]. */
  private[warehouse] def mergeArchiving(spark: SparkSession, tablePath: String,
                                        batch: DataFrame, key: String, numBuckets: Int,
                                        archiveTo: Option[Path]): Long =
    mergeImpl(spark, tablePath, batch, key, numBuckets, archiveTo)

  private def mergeImpl(spark: SparkSession, tablePath: String, batch: DataFrame,
                        key: String, numBuckets: Int,
                        archiveTo: Option[Path] = None): Long = {
    if (!batch.columns.contains(key)) {
      // Keep the original contract: an empty batch is a successful no-op
      // even when it lacks the key column (zero-row incremental slices of
      // keyless sources must not flip SUCCESS(0) to FAILED).
      if (batch.isEmpty) return 0L
      throw new IllegalArgumentException(s"merge key '$key' missing from batch")
    }

    // The table's stored bucket count wins over the caller's — merging with
    // a different modulus would duplicate keys across buckets.
    val effectiveBuckets = readBucketCount(spark, tablePath).getOrElse(numBuckets)

    // Within-batch duplicate keys collapse up front (last `_synced_at` wins)
    // — the reference's PG upsert would error on these ("cannot affect row a
    // second time"); deterministic collapse is the documented improvement
    // (SURVEY.md §7.4 item 5). Cache: the batch lineage (often a JSON scan +
    // window) feeds the count, the bucket set, and the staging write — one
    // evaluation, not four.
    val deduped =
      if (batch.columns.contains("_synced_at")) lwwCollapse(batch, key, Seq(col("_synced_at")))
      else batch.dropDuplicates(key)
    val bucketed = deduped.withColumn(BucketCol, bucketOf(col(key), effectiveBuckets)).cache()
    try {
      val batchCount = bucketed.count()
      if (batchCount == 0) return 0L // empty-batch guard (reference etl.py:23-24)

      if (!tableExists(spark, tablePath)) {
        // First sync auto-creates the table (reference etl.py:31-49).
        bucketed.write.mode("errorifexists").partitionBy(BucketCol).parquet(tablePath)
        writeBucketCount(spark, tablePath, effectiveBuckets)
        return batchCount
      }

      val affected: Seq[Int] =
        bucketed.select(BucketCol).distinct().collect().map(_.getInt(0)).toSeq

      val existing = spark.read.option("mergeSchema", "true").parquet(tablePath)
        .filter(col(BucketCol).isin(affected: _*)) // partition-pruned scan
        .withColumn("_prec", lit(0))
      val incoming = bucketed.withColumn("_prec", lit(1))

      val unioned = existing.unionByName(incoming, allowMissingColumns = true)
      // Rank by _synced_at only when the BATCH carries it: if only the
      // existing table has the column, unionByName null-fills the incoming
      // rows and they would sort last — i.e. always lose — inverting the
      // "incoming batch wins" ON CONFLICT DO UPDATE contract. A timestamp-
      // less batch ranks by _prec alone (batch wins every conflict).
      val rank =
        (if (deduped.columns.contains("_synced_at")) Seq(col("_synced_at")) else Nil) :+ col("_prec")
      val merged = lwwCollapse(unioned, key, rank).drop("_prec")

      // Stage, then swap only the affected bucket dirs.
      val staging = stagingPath(tablePath)
      merged.write.mode("overwrite").partitionBy(BucketCol).parquet(staging)
      swapBuckets(spark, tablePath, staging, affected, archiveTo)
      batchCount
    } finally bucketed.unpersist()
  }

  /** Re-bucket a table to a new bucket count — the escape hatch from the
    * create-time bucket-modulus invariant (a table outgrowing its bucket
    * count gets executor-swamping buckets; merging with a different
    * modulus would duplicate keys, so the ONLY legal path is this full
    * rewrite). One table scan, staged write under the new modulus, then
    * the usual per-bucket swap — buckets that exist only under the old
    * modulus are swept (their staging side is empty), and the stored
    * bucket count is updated last so a crash mid-swap still reads as the
    * old count with recoverable `.bak` dirs.
    *
    * Time-travel aware: on a table with versioning metadata the rewrite
    * captures a full version (every replaced bucket archived, new
    * buckets birth-marked), so [[TimeTravel.readAsOf]] keeps
    * reconstructing pre-rebucket versions from archives alone. Returns
    * (rows rewritten, new version — 0 when unversioned).
    */
  def rebucket(spark: SparkSession, tablePath: String, key: String, newBuckets: Int,
               lease: Boolean = false): (Long, Long) =
    withTableLock(spark, tablePath, lease) {
      require(tableExists(spark, tablePath), s"no table at $tablePath")
      val hfs = fs(spark, tablePath)
      val obs = org.apache.spark.sql.Observation()
      val rewritten = spark.read.option("mergeSchema", "true").parquet(tablePath)
        .drop(BucketCol)
        .observe(obs, count(lit(1)).as("rows"))
        .withColumn(BucketCol, bucketOf(col(key), newBuckets))
      val staging = stagingPath(tablePath)
      rewritten.write.mode("overwrite").partitionBy(BucketCol).parquet(staging)

      def bucketIds(root: String): Seq[Int] =
        hfs.listStatus(new Path(root)).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$BucketCol="))
          .map(_.getPath.getName.stripPrefix(s"$BucketCol=").toInt)
      val affected = (bucketIds(tablePath) ++ bucketIds(staging)).distinct

      val archiveTo = TimeTravel.archiveForRewrite(spark, tablePath)
      swapBuckets(spark, tablePath, staging, affected, archiveTo)
      writeBucketCount(spark, tablePath, newBuckets)
      (obs.get("rows").asInstanceOf[Long],
        if (archiveTo.isDefined) TimeTravel.currentVersion(spark, tablePath) else 0L)
    }

  /** Predicate DELETE — the warehouse mutation primitive between
    * row-level upsert ([[merge]]) and whole-table truncate: remove every
    * row where `predicate` is TRUE (NULL keeps the row, standard SQL
    * DELETE semantics), rewriting ONLY the buckets that contain a match.
    * Unmatched buckets' files are never touched — at 100 TB a
    * key-constrained predicate costs the affected buckets, not a table
    * rewrite. Staged swap + same lock/lease discipline as merge;
    * time-travel-aware (a versioned table captures the replaced buckets,
    * so pre-delete reads keep reconstructing). Returns rows deleted.
    */
  def deleteWhere(spark: SparkSession, tablePath: String, predicate: Column,
                  lease: Boolean = false): Long =
    withTableLock(spark, tablePath, lease) {
      require(tableExists(spark, tablePath), s"no table at $tablePath")
      val t = spark.read.option("mergeSchema", "true").parquet(tablePath)
      val hit = coalesce(predicate, lit(false))
      val affected = t.filter(hit).select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (affected.isEmpty) 0L
      else {
        val scoped = t.filter(col(BucketCol).isin(affected: _*))
        val deleted = scoped.filter(hit).count()
        val staging = stagingPath(tablePath)
        scoped.filter(!hit)
          .write.mode("overwrite").partitionBy(BucketCol).parquet(staging)
        val archiveTo = TimeTravel.archiveForRewrite(spark, tablePath)
        swapBuckets(spark, tablePath, staging, affected, archiveTo)
        deleted
      }
    }

  /** Predicate UPDATE — SET `assignments` on every row where `predicate`
    * is TRUE (NULL leaves the row unchanged), with the same bucket-pruned
    * staged-swap discipline as [[deleteWhere]]. Assignments may not
    * change the merge key's bucket routing: updating the key itself is a
    * delete + merge, not an in-place update (enforced for the bucket
    * column; key renames are the caller's contract). Returns rows
    * updated.
    */
  def updateWhere(spark: SparkSession, tablePath: String, predicate: Column,
                  assignments: Map[String, Column],
                  lease: Boolean = false): Long =
    withTableLock(spark, tablePath, lease) {
      require(tableExists(spark, tablePath), s"no table at $tablePath")
      require(!assignments.contains(BucketCol),
        s"cannot assign the bucket routing column $BucketCol")
      val t = spark.read.option("mergeSchema", "true").parquet(tablePath)
      assignments.keys.foreach(k => require(t.columns.contains(k),
        s"assignment target '$k' not in table schema"))
      val hit = coalesce(predicate, lit(false))
      val affected = t.filter(hit).select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (affected.isEmpty) 0L
      else {
        val scoped = t.filter(col(BucketCol).isin(affected: _*))
        val updated = scoped.filter(hit).count()
        val projected = scoped.select(t.columns.map { c =>
          assignments.get(c) match {
            case Some(e) => when(hit, e).otherwise(col(c)).as(c)
            case None => col(c)
          }
        }: _*)
        val staging = stagingPath(tablePath)
        projected.write.mode("overwrite").partitionBy(BucketCol).parquet(staging)
        val archiveTo = TimeTravel.archiveForRewrite(spark, tablePath)
        swapBuckets(spark, tablePath, staging, affected, archiveTo)
        updated
      }
    }

  private def stagingPath(tablePath: String): String = {
    val p = new Path(tablePath)
    new Path(p.getParent, s".staging_${p.getName}").toString
  }

  /** With `archiveTo` set ([[TimeTravel]]), a replaced bucket's previous
    * content moves into the archive dir instead of being dropped, and a
    * bucket born in this merge (no previous live dir) leaves an
    * absent-marker so version reconstruction knows it did not exist
    * before. The crash discipline is unchanged: live → .bak,
    * staging → live, then .bak is archived-or-deleted — a crash still
    * leaves either the old or the new bucket plus a recoverable .bak.
    */
  private def swapBuckets(spark: SparkSession, tablePath: String, staging: String,
                          buckets: Seq[Int], archiveTo: Option[Path] = None): Unit = {
    val hfs = fs(spark, tablePath)
    archiveTo.foreach(hfs.mkdirs(_))
    buckets.foreach { b =>
      val live = new Path(tablePath, s"$BucketCol=$b")
      val stag = new Path(staging, s"$BucketCol=$b")
      val bak = new Path(tablePath, s".bak_$BucketCol=$b")
      if (hfs.exists(bak)) hfs.delete(bak, true)
      val hadLive = hfs.exists(live)
      if (hadLive) {
        if (!hfs.rename(live, bak)) sys.error(s"backup rename failed for bucket $b")
      }
      if (hfs.exists(stag)) {
        if (!hfs.rename(stag, live)) sys.error(s"staging rename failed for bucket $b")
      }
      archiveTo match {
        case Some(arch) if hadLive =>
          if (!hfs.rename(bak, new Path(arch, s"$BucketCol=$b")))
            sys.error(s"archive rename failed for bucket $b")
        case Some(arch) =>
          val marker = hfs.create(new Path(arch, s".absent_$BucketCol=$b"), true)
          marker.close()
        case None => hfs.delete(bak, true)
      }
    }
    hfs.delete(new Path(staging), true)
  }
}
