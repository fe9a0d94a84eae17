package graft.warehouse

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Report output sinks (SURVEY.md §2.A SNK6 — the reference dumps its
  * scraped per-staff report as one JSON array file, scraper.py:69-71).
  */
object ReportSink {

  /** Single JSON-array file — driver-side materialization, matching the
    * reference's artifact byte-for-byte in shape. Only for report-sized
    * results (the per-staff report is O(#staff) rows); large outputs use
    * [[writeJsonDir]].
    */
  def writeJsonArrayFile(df: DataFrame, path: String): Unit = {
    val rows = df.toJSON.collect()
    Files.write(Paths.get(path),
      rows.mkString("[\n  ", ",\n  ", "\n]").getBytes("UTF-8"))
    ()
  }

  /** Scalable NDJSON directory (one line per row, partitioned parts). */
  def writeJsonDir(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)
}
