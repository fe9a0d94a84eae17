package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def history(rows: Seq[(Long, String, Long, Option[Long], Int)]): Set[(Long, String, Long, Option[Long], Int)] =
    rows.toSet

  private def collect(df: DataFrame): Set[(Long, String, Long, Option[Long], Int)] =
    df.collect().map { r =>
      (r.getAs[Long]("key"), r.getAs[String]("attr"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue()),
        r.getAs[Int]("is_current"))
    }.toSet

  test("buildHistory collapses runs and closes versions in order") {
    val log = Seq(
      (1L, "bronze", 10L), (1L, "bronze", 20L), (1L, "silver", 30L),
      (1L, "gold", 40L), (2L, "bronze", 15L)).toDF("key", "attr", "ord")
    val got = collect(Scd2.buildHistory(log, "key", "attr", "ord"))
    assert(got == history(Seq(
      (1L, "bronze", 10L, Some(30L), 0),
      (1L, "silver", 30L, Some(40L), 0),
      (1L, "gold", 40L, None, 1),
      (2L, "bronze", 15L, None, 1))))
  }

  test("merge: change closes + opens, same value is a no-op, new key inserts") {
    val dim = Scd2.buildHistory(
      Seq((1L, "bronze", 10L), (2L, "silver", 10L)).toDF("key", "attr", "ord"),
      "key", "attr", "ord")
    val updates = Seq(
      (1L, "gold", 50L),   // change → close + open
      (2L, "silver", 60L), // same value → untouched
      (3L, "bronze", 70L)  // unseen key → first version
    ).toDF("key", "attr", "ord")
    val got = collect(Scd2.merge(dim, updates, "key", "attr", "ord"))
    assert(got == history(Seq(
      (1L, "bronze", 10L, Some(50L), 0),
      (1L, "gold", 50L, None, 1),
      (2L, "silver", 10L, None, 1),
      (3L, "bronze", 70L, None, 1))))
  }

  test("incremental merges replay to exactly the batch-built history") {
    // Change log split into three batches (latest state per key per
    // batch); merging them in order must equal one-shot buildHistory.
    val log = Seq(
      (1L, "a", 1L), (2L, "a", 2L),
      (1L, "b", 10L), (3L, "a", 11L),
      (1L, "c", 20L), (2L, "b", 21L), (3L, "a", 22L)).toDF("key", "attr", "ord")
    val oneShot = collect(Scd2.buildHistory(log, "key", "attr", "ord"))

    val batches = Seq(Seq((1L, "a", 1L), (2L, "a", 2L)),
      Seq((1L, "b", 10L), (3L, "a", 11L)),
      Seq((1L, "c", 20L), (2L, "b", 21L), (3L, "a", 22L)))
    val empty = Scd2.buildHistory(
      Seq.empty[(Long, String, Long)].toDF("key", "attr", "ord"), "key", "attr", "ord")
    val replayed = batches.foldLeft(empty) { (dim, b) =>
      Scd2.merge(dim, b.toDF("key", "attr", "ord"), "key", "attr", "ord")
    }
    assert(collect(replayed) == oneShot)
    // Re-merging the last batch is idempotent.
    val again = Scd2.merge(replayed, batches.last.toDF("key", "attr", "ord"),
      "key", "attr", "ord")
    assert(collect(again) == oneShot)
  }

  test("pointInTimeJoin resolves each fact to exactly its containing version") {
    val dim = Scd2.buildHistory(
      Seq((1L, "bronze", 10L), (1L, "silver", 30L), (2L, "gold", 5L))
        .toDF("key", "attr", "ord"), "key", "attr", "ord")
    val facts = Seq(
      (1L, 10L), // exactly at valid_from → bronze
      (1L, 29L), // last second of bronze
      (1L, 30L), // boundary: valid_to is exclusive → silver
      (1L, 99L), // open current version → silver
      (1L, 5L),  // before the first version → no match
      (3L, 50L)  // unknown key → no match
    ).toDF("key", "sec")
    val rows = Scd2.pointInTimeJoin(facts, dim, "key", "sec")
      .select("key", "sec", "attr")
      .collect()
    assert(rows.length == 4, s"each fact must match at most ONE version, got ${rows.length}")
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got == Map(
      (1L, 10L) -> "bronze", (1L, 29L) -> "bronze",
      (1L, 30L) -> "silver", (1L, 99L) -> "silver"))
  }

  test("strict merge rejects late-arriving updates instead of corrupting") {
    val dim = Scd2.buildHistory(
      Seq((1L, "gold", 50L)).toDF("key", "attr", "ord"), "key", "attr", "ord")
    val late = Seq((1L, "bronze", 10L)).toDF("key", "attr", "ord")
    val e = intercept[IllegalArgumentException] {
      Scd2.merge(dim, late, "key", "attr", "ord")
    }
    assert(e.getMessage.contains("buildHistory"))
    // Same-ord same-value replay is NOT late (>= passes) and stays a no-op.
    val replay = Seq((1L, "gold", 50L)).toDF("key", "attr", "ord")
    assert(collect(Scd2.merge(dim, replay, "key", "attr", "ord")) ==
      history(Seq((1L, "gold", 50L, None, 1))))
  }

  test("strict merge rejects duplicate update keys instead of fanning out history") {
    val dim = Scd2.buildHistory(
      Seq((1L, "gold", 50L)).toDF("key", "attr", "ord"), "key", "attr", "ord")
    // Two rows for key 1 — would fan out the left join and duplicate the
    // key's entire history if allowed through.
    val dup = Seq((1L, "silver", 60L), (1L, "bronze", 70L)).toDF("key", "attr", "ord")
    val e = intercept[IllegalArgumentException] {
      Scd2.merge(dim, dup, "key", "attr", "ord")
    }
    assert(e.getMessage.contains("more than once"))
  }
}
