package graft.analytics

import graft.SparkSpec

class ArrayJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def users = Seq(
    ("u1", Seq("r1", "r2")),
    ("u2", Seq("r2")),
    ("u3", Seq.empty[String])
  ).toDF("user_id", "assignedRooms")

  private def rooms = Seq(("r1", "Room A"), ("r2", "Room B")).toDF("room_id", "room_name")

  test("membership join explodes array FKs into an equi-join") {
    val out = ArrayJoins.membershipJoinInner(users, "assignedRooms", rooms, "room_id")
      .select("user_id", "room_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("u1", "Room A"), ("u1", "Room B"), ("u2", "Room B")))
  }

  test("outer variant keeps users with empty arrays") {
    val out = ArrayJoins.membershipJoin(users, "assignedRooms", rooms, "room_id")
    assert(out.filter($"user_id" === "u3").count() == 1)
    assert(out.filter($"user_id" === "u3").head().getAs[String]("room_name") == null)
  }

  test("report sink writes a single JSON array artifact") {
    val out = tmpDir("report") + "/staff.json"
    graft.warehouse.ReportSink.writeJsonArrayFile(rooms, out)
    val content = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    assert(content.trim.startsWith("[") && content.trim.endsWith("]"))
    assert(content.contains("\"room_name\":\"Room A\""))
  }

  test("report sink refuses a table-sized input before collecting it") {
    // A fact table pointed at the driver-side array sink must fail loudly
    // at the size probe, never reach toJSON.collect(), and never write.
    val out = tmpDir("report_guard") + "/too_big.json"
    val big = spark.range(graft.warehouse.ReportSink.MaxArrayFileRows + 1)
      .toDF("id")
    val e = intercept[IllegalArgumentException] {
      graft.warehouse.ReportSink.writeJsonArrayFile(big, out)
    }
    assert(e.getMessage.contains("writeJsonDir"),
      s"guard must name the scalable alternative: ${e.getMessage}")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)),
      "guard must fire before any bytes are written")
    // At the ceiling itself the sink still works.
    assert(graft.warehouse.ReportSink.MaxArrayFileRows > 0)
  }
}
