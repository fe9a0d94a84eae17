package graft.warehouse

import graft.SparkSpec

/** The direct (job-free) marker I/O must stay bidirectionally
  * parquet-compatible with Spark: markers written by Spark read back via
  * [[StateFiles.readMarker]], and markers written by
  * [[StateFiles.writeMarkerDir]] read back via `spark.read.parquet` —
  * the exact compatibility every pre-existing state on disk relies on.
  */
class MarkerFilesSpec extends SparkSpec {

  test("spark-written marker reads back through readMarker") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("marker-sw").toString + "/stats"
    Seq((7L, Seq("label", "lang"), 64L))
      .toDF("last_batch", "attr_cols", "code_dim")
      .write.parquet(dir)
    val m = StateFiles.readMarker(spark, dir).get
    assert(m("last_batch") === 7L)
    assert(m("attr_cols") === Seq("label", "lang"))
    assert(m("code_dim") === 64L)
  }

  test("writeMarkerDir output reads back through spark.read.parquet") {
    val dir = java.nio.file.Files.createTempDirectory("marker-dw").toString + "/stats"
    StateFiles.writeMarkerDir(spark, dir,
      Seq("last_batch" -> 3L, "attr_cols" -> Seq("tenant"), "code_dim" -> -1L))
    val r = spark.read.parquet(dir).head()
    assert(r.getAs[Long]("last_batch") === 3L)
    assert(r.getAs[scala.collection.Seq[String]]("attr_cols").toSeq === Seq("tenant"))
    assert(r.getAs[Long]("code_dim") === -1L)
  }

  test("writeMarkerDir round-trips through readMarker, empty list included") {
    val dir = java.nio.file.Files.createTempDirectory("marker-rt").toString + "/meta"
    StateFiles.writeMarkerDir(spark, dir,
      Seq("folded_through" -> 12L, "attr_cols" -> Seq.empty[String]))
    val m = StateFiles.readMarker(spark, dir).get
    assert(m("folded_through") === 12L)
    assert(m("attr_cols") === Seq.empty[String])
    assert(StateFiles.readMarker(spark, dir + "/nope").isEmpty)
  }

  test("installMarker stages and swaps like install (replace an existing marker)") {
    val dir = java.nio.file.Files.createTempDirectory("marker-sw2").toString + "/stats"
    StateFiles.installMarker(spark, dir, Seq("last_batch" -> 0L))
    StateFiles.installMarker(spark, dir, Seq("last_batch" -> 1L))
    assert(StateFiles.readMarker(spark, dir).get("last_batch") === 1L)
    // Spark can still read the installed marker (the compat contract).
    assert(spark.read.parquet(dir).head().getAs[Long]("last_batch") === 1L)
  }
}
