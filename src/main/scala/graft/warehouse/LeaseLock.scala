package graft.warehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-driver table lease — the honesty fix for MergeWriter's JVM-striped
  * lock (which serializes writers within ONE driver only): a lease file
  * beside the table, acquired with an exclusive create, carrying the
  * holder id and an expiry. A second driver's merge refuses (or waits)
  * instead of interleaving staging-dir writes with the first.
  *
  * Guarantees and limits, stated plainly:
  *  - On HDFS `create(path, overwrite = false)` is an atomic namenode
  *    operation — exactly one contender wins. On local paths Hadoop's
  *    LocalFileSystem implements it as a NON-atomic exists-then-create,
  *    so the lease file is created with POSIX O_EXCL there instead
  *    (File.createNewFile); the contention spec holds 24 contenders to
  *    zero overlapping acquisitions.
  *  - On eventually-consistent object stores without atomic create
  *    (plain S3), this is best-effort advisory locking; deployments there
  *    should point the lease at an HDFS/consistent path or use an external
  *    coordinator. Documented, not silently assumed.
  *  - Expiry handles crashed holders: a lease past its TTL is deleted and
  *    re-contended (the delete+create race is safe — the loser's create
  *    fails and it retries). TTL must exceed the longest merge; the
  *    default is generous because a false takeover is worse than a slow
  *    wait.
  *
  * Opt-in via [[MergeWriter]]'s `lease` parameter: single-driver
  * deployments (the reference's shape, and every local test) pay nothing.
  */
object LeaseLock {

  final case class Lease(path: Path, id: String)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def leasePath(tablePath: String): Path = {
    val p = new Path(tablePath)
    new Path(p.getParent, s".lease_${p.getName}")
  }

  /** Try to acquire the lease for `tablePath`, polling up to `waitMs`.
    * Returns None if another unexpired holder kept it the whole time.
    *
    * Expired-lease takeover is rename-based, never a blind delete: a
    * contender first RENAMES the stale file to a unique name — rename of
    * a specific path is atomic, so exactly one contender owns the stale
    * file and removes it; the losers' renames fail and they loop. A blind
    * delete here would race: contender B deletes the stale file and
    * creates a fresh lease, then contender C's delete (decided against
    * the same stale read) removes B's FRESH file — two "exclusive"
    * holders. After a successful takeover the contender retries the
    * create immediately, even with waitMs = 0 (it just freed the lease
    * itself; returning None there would misreport a live holder).
    */
  def acquire(spark: SparkSession, tablePath: String, ttlMs: Long = 30 * 60 * 1000L,
              waitMs: Long = 0L, pollMs: Long = 200L): Option[Lease] = {
    val p = leasePath(tablePath)
    val hfs = fs(spark, p)
    val id = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    var attempt = 0
    var tookOver = false
    while (attempt == 0 || tookOver || System.currentTimeMillis() <= deadline) {
      attempt += 1
      tookOver = false
      if (tryCreate(hfs, p, id, ttlMs)) return Some(Lease(p, id))
      readLease(hfs, p) match {
        case Some((_, expiry)) if System.currentTimeMillis() > expiry =>
          val stale = new Path(p.getParent, s".stale_${p.getName}_$id")
          tookOver =
            try hfs.rename(p, stale) && { hfs.delete(stale, false); true }
            catch { case _: java.io.IOException => false }
        case _ => ()
      }
      if (!tookOver) {
        if (System.currentTimeMillis() + pollMs <= deadline) Thread.sleep(pollMs)
        else if (waitMs > 0 && System.currentTimeMillis() <= deadline) Thread.sleep(
          math.max(1L, deadline - System.currentTimeMillis()))
      }
    }
    None
  }

  /** Release a held lease. Only the holder's own file is removed — if the
    * lease expired mid-hold and someone took over, their file (different
    * id) stays. The read-then-delete pair is safe for a LIVE holder: a
    * takeover can only interleave here if this very lease expired between
    * the two calls, i.e. the hold outlived its TTL — which is why the TTL
    * default is far above any merge duration and the contract requires
    * ttlMs > the longest expected hold.
    */
  def release(spark: SparkSession, lease: Lease): Unit = {
    val hfs = fs(spark, lease.path)
    readLease(hfs, lease.path) match {
      case Some((id, _)) if id == lease.id => hfs.delete(lease.path, false)
      case _ => () // expired + taken over, or already gone
    }
  }

  private def tryCreate(hfs: FileSystem, p: Path, id: String, ttlMs: Long): Boolean = {
    val payload = s"$id ${System.currentTimeMillis() + ttlMs}".getBytes("UTF-8")
    if (hfs.getScheme == "file") {
      // Hadoop's local filesystems implement create(overwrite = false) as
      // a NON-atomic exists()-then-create — the contention spec observed
      // overlapping holds through that window. POSIX O_EXCL via
      // File.createNewFile IS atomic; use it whenever the lease lives on
      // a local path. (The payload write after the create is not atomic —
      // a reader catching the empty file gets a malformed lease and just
      // polls again.)
      try {
        val f = new java.io.File(p.toUri.getPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        if (!f.createNewFile()) return false
        val out = new java.io.FileOutputStream(f)
        try out.write(payload) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    } else
      try {
        val out = hfs.create(p, false) // atomic namenode create on HDFS
        try out.write(payload) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  private def readLease(hfs: FileSystem, p: Path): Option[(String, Long)] =
    try {
      val in = hfs.open(p)
      val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      content.trim.split("\\s+") match {
        case Array(id, exp) => Some((id, exp.toLong))
        case _ => None
      }
    } catch { case _: java.io.IOException => None }

  /** Run `body` under the table's cross-driver lease when `lease` is
    * set — the ONE bracket every leased writer (merge, compaction, …)
    * shares, so wait/takeover/error semantics cannot drift per caller.
    */
  def withLease[T](spark: SparkSession, tablePath: String, lease: Boolean)(body: => T): T =
    if (!lease) body
    else acquire(spark, tablePath, waitMs = 60000L) match {
      case Some(l) => try body finally release(spark, l)
      case None => sys.error(s"could not acquire lease for $tablePath " +
        "(another driver holds it; raise waitMs or investigate a stale holder)")
    }
}
