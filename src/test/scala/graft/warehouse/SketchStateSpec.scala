package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchStateSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("user_id"), col("event_type"))

  test("replayed batches produce exactly the one-shot sketch estimates") {
    val oneShotPath = tmpDir("hll-oneshot") + "/state"
    val replayPath = tmpDir("hll-replay") + "/state"
    SketchState.update(spark, oneShotPath, events, Seq("event_type"), "user_id")
    // Same rows in three arbitrary batches (modulo split), different
    // partitioning per batch — register-max merging must not care.
    Seq(0, 1, 2).foreach { i =>
      SketchState.update(spark, replayPath,
        events.filter(col("user_id") % 3 === i).repartition(i + 2),
        Seq("event_type"), "user_id")
    }
    def read(p: String) = SketchState.estimates(spark, p, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val one = read(oneShotPath)
    val rep = read(replayPath)
    assert(one == rep, s"batch-split must not change estimates: $one vs $rep")
  }

  test("estimates track exact distincts within HLL error, state stays tiny") {
    val path = tmpDir("hll-acc") + "/state"
    val est = SketchState.update(spark, path, events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= math.max(2L, (n * 0.05).toLong),
        s"$k: estimate ${est(k)} too far from exact $n")
    }
    // State is one row per group with a bytes-sized sketch.
    assert(spark.read.parquet(path).count() == exact.size)
  }

  test("estimates returned by update stay valid across the next update's file swap") {
    val path = tmpDir("hll-snapshot") + "/state"
    val snap = SketchState.update(spark, path,
      events.filter(col("user_id") % 2 === 0), Seq("event_type"), "user_id")
    // Second update's two-rename swap deletes the files snap was planned
    // over; the materialized snapshot must still read, with the OLD values.
    SketchState.update(spark, path, events, Seq("event_type"), "user_id")
    val snapVals = snap.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val halfPath = tmpDir("hll-snapshot-oracle") + "/state"
    val expected = SketchState.update(spark, halfPath,
      events.filter(col("user_id") % 2 === 0), Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(snapVals == expected, "snapshot must be the pre-swap estimates, not fail or drift")
  }

  test("re-merging the same batch cannot inflate the estimate") {
    val path = tmpDir("hll-idem") + "/state"
    val first = SketchState.update(spark, path, events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = SketchState.update(spark, path, events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == again, "HLL union is idempotent: replaying a batch is a no-op")
  }
}
