package graft.core

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Local-filesystem scratch helpers (driver-side temp dirs only — state
  * and warehouse paths go through the Hadoop FileSystem API so they stay
  * object-store-portable; this is strictly for JVM-local scratch).
  */
object Fs {

  /** Delete `root` and everything under it; missing paths are a no-op.
    * `Files.walk` streams hold open directory handles until closed
    * (javadoc mandates try-with-resources) — leak one per bench rep and
    * a long session can hit EMFILE inside Spark's own shuffle files.
    */
  def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      val paths =
        try stream.iterator().asScala.toSeq
        finally stream.close()
      paths.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
    }
}
