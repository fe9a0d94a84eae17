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
    // Reference parity (config.py:47-57): try JSON first; a JSON OBJECT is
    // the source dict, anything else — valid-but-not-an-object JSON or a
    // parse failure (e.g. a shell stripped the inner quotes) — falls back
    // to the CSV form. The fallback must not be a silent empty map, or a
    // garbled setting turns `sync` into a successful no-op. Jackson is
    // already on the classpath (Spark ships it); only brace-strings can
    // be JSON objects, so others skip straight to CSV.
    else if (s.startsWith("{")) jsonObjectSources(s).getOrElse(csvSources(s))
    else csvSources(s)
  }

  private def jsonObjectSources(s: String): Option[Map[String, String]] =
    try {
      // FAIL_ON_TRAILING_TOKENS: python's json.loads (the parity target)
      // raises on trailing data — without it Jackson would accept
      // '{"a":"x"} {"b":"y"}', keep only the first object, and silently
      // drop the rest of the setting instead of falling back to CSV.
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        .enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
      val node = mapper.readValue(s, classOf[com.fasterxml.jackson.databind.JsonNode])
      if (node != null && node.isObject) {
        val out = Map.newBuilder[String, String]
        node.fields().forEachRemaining { e =>
          val v = e.getValue
          // Non-string values stringify (the reference keeps them as-is
          // in its dict; they fail later at use, same as a bogus path).
          out += e.getKey -> (if (v.isTextual) v.asText else v.toString)
        }
        Some(out.result())
      } else None
    } catch { case _: Exception => None }

  private def csvSources(s: String): Map[String, String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).zipWithIndex
      .map { case (uri, i) => s"source_${i + 1}" -> uri }
      .toMap

  /** Collection-name gate `^[a-zA-Z0-9_-]+$` (reference
    * src/schemas/request.py:6-7) — table paths are built from this name.
    */
  val CollectionNamePattern = "^[a-zA-Z0-9_-]+$"

  def validCollectionName(name: String): Boolean = name.matches(CollectionNamePattern)
}
