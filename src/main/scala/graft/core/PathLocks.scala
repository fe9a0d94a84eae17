package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path

/** JVM-wide striped locks keyed on a NORMALIZED path. Callers naming the
  * same location differently (`/wh/tbl` vs `/wh/tbl/` vs `file:///wh/tbl`)
  * must take the same lock, or the read-modify-write sections they guard
  * (bucket swap, checkpoint swap, audit append) interleave.
  *
  * Normalization: Hadoop `Path` collapses `//` and trailing slashes; the
  * scheme-less local form and an explicit `file:` URI then reduce to the
  * same key via `toUri.getPath`. Non-file schemes (hdfs, s3a) keep their
  * full URI so distinct filesystems never share a lock.
  */
object PathLocks {
  private val locks = new ConcurrentHashMap[String, Object]()

  private[core] def normalize(path: String): String = {
    val uri = new Path(path).toUri
    uri.getScheme match {
      case null | "file" => uri.getPath
      case _             => uri.toString
    }
  }

  def forPath(path: String): Object =
    locks.computeIfAbsent(normalize(path), _ => new Object)
}
