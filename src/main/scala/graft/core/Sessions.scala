package graft.core

import org.apache.spark.sql.SparkSession

/** One place for the local-session recipe all CLI mains share (UTC, no UI,
  * shuffle partitions matched to cores — not the 200 default).
  */
object Sessions {
  def local(cpus: String, master: Option[String] = None): SparkSession = {
    val s = SparkSession.builder()
      .master(master.getOrElse(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
