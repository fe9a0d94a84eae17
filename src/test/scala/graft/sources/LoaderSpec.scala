package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.warehouse.MergeWriter

class LoaderSpec extends SparkSpec {

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("overwrite load: counts, malformed-line summary, reload truncates") {
    val dir = tmpDir("loader")
    val wh = tmpDir("loader-wh")
    val f = write(dir, "docs.ndjson",
      """{"_id": "1", "v": 10}""" + "\n" +
        "BROKEN {{{" + "\n" +
        "\n" + // blank line — skipped silently, not counted malformed
        """{"_id": "2", "v": 20}""")
    val res = Loader.load(spark, wh, f, "docs")
    assert(res.loaded == 2)
    assert(res.malformed == 1)
    assert(res.summary.contains("skipped 1 malformed"))

    // Truncate-and-reload (dump.py:187-194): second load replaces.
    val f2 = write(dir, "docs2.ndjson", """{"_id": "9", "v": 90}""")
    Loader.load(spark, wh, f2, "docs")
    val rows = MergeWriter.read(spark, s"$wh/docs").collect()
    assert(rows.map(_.getAs[String]("_id")).toSeq == Seq("9"))
  }

  test("merge load upserts by _id") {
    val dir = tmpDir("loader")
    val wh = tmpDir("loader-wh")
    Loader.load(spark, wh,
      write(dir, "a.ndjson", """{"_id": "1", "v": 1}""" + "\n" + """{"_id": "2", "v": 2}"""),
      "docs")
    val res = Loader.load(spark, wh,
      write(dir, "b.ndjson", """{"_id": "2", "v": 22}""" + "\n" + """{"_id": "3", "v": 3}"""),
      "docs", mode = "merge")
    assert(res.loaded == 2)
    val rows = MergeWriter.read(spark, s"$wh/docs").orderBy("_id").collect()
    assert(rows.map(r => (r.getAs[String]("_id"), r.getAs[Long]("v"))).toSeq ==
      Seq(("1", 1L), ("2", 22L), ("3", 3L)))
  }

  test("json-array file loads and rows without _id get synthetic keys") {
    val dir = tmpDir("loader")
    val wh = tmpDir("loader-wh")
    val f = write(dir, "arr.json", """[{"v": 1}, {"v": 2}, {"v": 3}]""")
    val res = Loader.load(spark, wh, f, "arrdocs")
    assert(res.loaded == 3)
    assert(res.malformed == 0)
    val tbl = MergeWriter.read(spark, s"$wh/arrdocs")
    assert(tbl.select("_id").distinct().count() == 3)
  }
}
