package graft.analytics

import graft.SparkSpec

class RatingsSummarySpec extends SparkSpec {
  import spark.implicits._

  // Rating-shaped fixture (reference seed_mock.py:47-58): stars linked to
  // a room, staff user, and company.
  private val ratings = Seq(
    // _id, roomId, roomName, companyId, companyName, userId, stars
    ("r1", "room1", "Room 101", "c1", "Tech Corp", "u1", 5L),
    ("r2", "room1", "Room 101", "c1", "Tech Corp", "u1", 4L),
    ("r3", "room2", "Room 202", "c1", "Tech Corp", "u2", 2L),
    ("r4", "room2", "Room 202", "c2", "Acme", "u1", 1L)
  ).toDF("_id", "roomId", "roomName", "companyId", "companyName", "userId", "stars")

  private val users = Seq(
    ("u1", "john_doe"),
    ("u2", "jane_roe")
  ).toDF("_id", "username")

  test("byRoom averages stars per room") {
    val rooms = RatingsSummary.byRoom(ratings).orderBy("roomId").collect()
    assert(rooms.length == 2)
    assert(rooms(0).getAs[String]("roomName") == "Room 101")
    assert(rooms(0).getAs[Long]("n_ratings") == 2L)
    assert(rooms(0).getAs[Double]("avg_stars") == 4.5)
    assert(rooms(1).getAs[Long]("min_stars") == 1L && rooms(1).getAs[Long]("max_stars") == 2L)
  }

  test("byCompany averages stars per company") {
    val cos = RatingsSummary.byCompany(ratings).orderBy("companyId").collect()
    assert(cos.length == 2)
    assert(cos(0).getAs[String]("companyName") == "Tech Corp")
    assert(cos(0).getAs[Long]("n_ratings") == 3L)
    assert(cos(0).getAs[Double]("avg_stars") == 3.67) // (5+4+2)/3 rounded 2
  }

  test("perStaff joins usernames and aggregates per rated staff member") {
    val staff = RatingsSummary.perStaff(ratings, users).orderBy("username").collect()
    assert(staff.length == 2)
    val jane = staff(0)
    assert(jane.getAs[String]("username") == "jane_roe")
    assert(jane.getAs[Long]("n_ratings") == 1L && jane.getAs[Double]("avg_stars") == 2.0)
    val john = staff(1)
    assert(john.getAs[String]("username") == "john_doe")
    assert(john.getAs[Long]("n_ratings") == 3L)
    assert(john.getAs[Double]("avg_stars") == 3.33) // (5+4+1)/3
    assert(john.getAs[scala.collection.Seq[String]]("roomNames").toSeq ==
      Seq("Room 101", "Room 202"))
  }

  test("gated q34 derives a two-level summary with stars in 1..5") {
    val out = RatingsSummary.ratingsSummary(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val levels = out.map(_.getAs[String]("level")).toSet
    assert(levels == Set("room", "staff"))
    out.foreach { r =>
      assert(r.getAs[Long]("min_stars") >= 1L && r.getAs[Long]("max_stars") <= 5L)
      val avg = r.getAs[Double]("avg_stars")
      assert(avg >= 1.0 && avg <= 5.0)
    }
  }
}
