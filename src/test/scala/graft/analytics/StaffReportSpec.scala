package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec

class StaffReportSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // staff s1: 3 tickets over 2 days (2 + 1), serve times 100s and 892s
  // (avg 496 → "8m 16s"); companies include non-ASCII (Amharic) per the
  // reference's production report (staff_reports.json:5).
  private val tickets = Seq(
    // _id, date, calledAt, servedDate, companyName, staffId, served
    ("t1", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:10:00"), ts("2024-01-01 09:11:40"), "Acme", "s1", true),
    ("t2", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), ts("2024-01-01 10:19:52"), "ንግድ ቢሮ", "s1", true),
    ("t3", ts("2024-01-02 09:00:00"), null, null, "Acme", "s1", false),
    ("t4", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), ts("2024-01-01 16:11:23"), "Acme", "s2", true)
  ).toDF("_id", "date", "calledAt", "servedDate", "companyName", "staffId", "served")

  private val users = Seq(
    ("s1", "john_doe"),
    ("s2", "jane_roe")
  ).toDF("_id", "username")

  test("staff report reproduces the reference's field semantics") {
    val report = StaffReport.build(tickets, users).orderBy("roomUserName").collect()
    assert(report.length == 2)

    val jane = report(0)
    assert(jane.getAs[String]("roomUserName") == "jane_roe")
    assert(jane.getAs[Long]("totalTickets") == 1L)
    // 7h11m23s = 431m 23s — uncapped minutes, reference staff_reports.json.
    assert(jane.getAs[String]("avgTimeToServe") == "431m 23s")
    assert(jane.getAs[String]("maxTimeToServe") == "431m 23s")

    val john = report(1)
    assert(john.getAs[String]("roomUserName") == "john_doe")
    assert(john.getAs[Long]("totalTickets") == 3L)
    assert(john.getAs[scala.collection.Seq[String]]("companyNames").toSeq == Seq("Acme", "ንግድ ቢሮ"))
    // Days: 2 tickets day1, 1 ticket day2 → avg 1.5 → integer-rounded 2.
    assert(john.getAs[Long]("avgTicketsPerDay") == 2L)
    assert(john.getAs[Long]("minTicketsPerDay") == 1L)
    assert(john.getAs[Long]("maxTicketsPerDay") == 2L)
    // Serve secs: 100 and 892 → avg 496 → "8m 16s"; min "1m 40s"; max "14m 52s".
    assert(john.getAs[String]("avgTimeToServe") == "8m 16s")
    assert(john.getAs[String]("minTimeToServe") == "1m 40s")
    assert(john.getAs[String]("maxTimeToServe") == "14m 52s")
    // No picture columns in fixture → nulls, not failures.
    assert(john.getAs[String]("staffPicture") == null)
  }
}
