package graft.warehouse

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Report output sinks (SURVEY.md §2.A SNK6 — the reference dumps its
  * scraped per-staff report as one JSON array file, scraper.py:69-71).
  */
object ReportSink {

  /** Hard row ceiling for the single-file sink: a report is O(#staff)-
    * sized by contract; anything near this bound is a fact table on the
    * wrong API and must fail loudly BEFORE `toJSON.collect()` OOMs the
    * driver. */
  val MaxArrayFileRows = 100_000L

  /** Single JSON-array file — driver-side materialization, matching the
    * reference's artifact byte-for-byte in shape. Only for report-sized
    * results (the per-staff report is O(#staff) rows); large outputs use
    * [[writeJsonDir]].
    *
    * Guarded: `limit(MaxArrayFileRows + 1)` bounds the size probe itself
    * (the check must not cost a full count of a mispointed fact table),
    * and an over-limit input throws with the scalable alternative named.
    */
  def writeJsonArrayFile(df: DataFrame, path: String): Unit = {
    val probe = df.limit((MaxArrayFileRows + 1).toInt).count()
    require(probe <= MaxArrayFileRows,
      s"writeJsonArrayFile: input exceeds $MaxArrayFileRows rows — this " +
        "sink materializes on the driver and exists for report-sized " +
        "results only; use writeJsonDir for table-sized output")
    val rows = df.toJSON.collect()
    Files.write(Paths.get(path),
      rows.mkString("[\n  ", ",\n  ", "\n]").getBytes("UTF-8"))
    ()
  }

  /** Scalable NDJSON directory (one line per row, partitioned parts). */
  def writeJsonDir(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)
}
