package graft.core

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Local-filesystem scratch helpers (driver-side temp dirs only — state
  * and warehouse paths go through the Hadoop FileSystem API so they stay
  * object-store-portable; this is strictly for JVM-local scratch).
  */
object Fs {

  /** Delete `root` and everything under it; missing paths are a no-op. */
  def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(Files.deleteIfExists(_))
    }
}
