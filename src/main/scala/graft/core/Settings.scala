package graft.core

/** Engine configuration — parity with the reference's env-driven settings
  * (reference src/config.py:18-25,32-57).
  */
final case class Settings(
    warehouseDir: String,
    sources: Map[String, String] = Map.empty,
    targetCollections: Seq[String] = Seq("ticket", "users"), // config.py:25
    batchSize: Int = 5000,            // config.py:19 — advisory in Spark (maxFilesPerTrigger)
    syncIntervalMinutes: Int = 60,    // config.py:23
    watermarkCol: String = "updated_at",
    numBuckets: Int = graft.warehouse.MergeWriter.DefaultNumBuckets)

object Settings {

  /** Parse the multi-source setting: either a JSON object of name → uri or
    * a comma-separated list auto-named `source_1..N` (reference
    * src/config.py:32-57).
    */
  def parseSources(raw: String): Map[String, String] = {
    val s = raw.trim
    if (s.isEmpty) Map.empty
    else if (s.startsWith("{")) {
      // Flat string-to-string JSON object; no nested values in the reference.
      val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      val pairs = pair.findAllMatchIn(s).map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
      // Reference parity (config.py:47-57): a brace-string that parses to
      // no pairs is INVALID JSON there and falls back to the CSV form —
      // it must not become a silent empty source map (a shell that
      // strips the inner quotes would otherwise turn `sync` into a
      // successful no-op). `{}`/`{ }` is the one valid-JSON empty dict.
      if (pairs.nonEmpty || s.replaceAll("\\s", "") == "{}") pairs else csvSources(s)
    } else csvSources(s)
  }

  private def csvSources(s: String): Map[String, String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).zipWithIndex
      .map { case (uri, i) => s"source_${i + 1}" -> uri }
      .toMap

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Collection-name gate `^[a-zA-Z0-9_-]+$` (reference
    * src/schemas/request.py:6-7) — table paths are built from this name.
    */
  val CollectionNamePattern = "^[a-zA-Z0-9_-]+$"

  def validCollectionName(name: String): Boolean = name.matches(CollectionNamePattern)
}
