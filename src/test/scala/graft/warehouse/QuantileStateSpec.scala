package graft.warehouse

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantileStateSpec extends SparkSpec {
  import spark.implicits._

  private val Ps = Seq(0.5, 0.95)

  private def events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_type"), col("value"))

  /** Exact per-group sorted values, for rank-error assertions. */
  private lazy val exact: Map[String, Array[Double]] = events
    .na.drop(Seq("value"))
    .collect()
    .groupBy(_.getString(0))
    .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }

  /** Rank of `v` in `sorted` (count of elements < v) as a fraction. */
  private def rankFrac(sorted: Array[Double], v: Double): Double = {
    var i = java.util.Arrays.binarySearch(sorted, v)
    if (i < 0) i = -(i + 1)
    // binarySearch lands on AN occurrence; step to the range for ties.
    while (i > 0 && sorted(i - 1) >= v) i -= 1
    i.toDouble / sorted.length
  }

  private def readEst(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
    df.collect().map { r: Row =>
      r.getString(0) -> Ps.indices.map(i => r.getDouble(i + 1))
    }.toMap

  test("replayed batches match the one-shot estimates within sketch error") {
    val onePath = tmpDir("q-oneshot") + "/state"
    val repPath = tmpDir("q-replay") + "/state"
    QuantileState.update(spark, onePath, events, Seq("event_type"), "value", Ps)
    Seq(0, 1, 2).foreach { i =>
      QuantileState.update(spark, repPath,
        events.filter(crc32(col("value").cast("string")) % 3 === i).repartition(i + 2),
        Seq("event_type"), "value", Ps)
    }
    val one = readEst(QuantileState.estimates(spark, onePath, Seq("event_type"), Ps))
    val rep = readEst(QuantileState.estimates(spark, repPath, Seq("event_type"), Ps))
    assert(one.keySet == rep.keySet && one.keySet == exact.keySet)
    // GK bound: ε=0.01 per sketch, ≤ 3 batches merged → rank error well
    // under 5% + discretization. Check BOTH paths against exact ranks.
    exact.foreach { case (k, sorted) =>
      Ps.zipWithIndex.foreach { case (p, i) =>
        val tol = 0.05 + 1.5 / sorted.length
        assert(math.abs(rankFrac(sorted, one(k)(i)) - p) <= tol,
          s"$k p$p one-shot ${one(k)(i)} rank ${rankFrac(sorted, one(k)(i))}")
        assert(math.abs(rankFrac(sorted, rep(k)(i)) - p) <= tol,
          s"$k p$p replayed ${rep(k)(i)} rank ${rankFrac(sorted, rep(k)(i))}")
      }
    }
  }

  test("estimates read from state alone; state is one sketch row per group") {
    val path = tmpDir("q-tiny") + "/state"
    val est = readEst(
      QuantileState.update(spark, path, events, Seq("event_type"), "value", Ps))
    assert(est.keySet == exact.keySet)
    val state = spark.read.parquet(path)
    assert(state.count() == exact.size, "state must be one row per group")
    val maxSketch = state.select(max(length(col("__q_sketch")))).head().getInt(0)
    assert(maxSketch < (64 << 10), s"sketch must stay KB-sized, got $maxSketch bytes")
    // Quantiles must be monotone across the requested percentiles.
    est.values.foreach(vs => assert(vs == vs.sorted, s"non-monotone quantiles: $vs"))
  }

  test("estimates returned by update stay valid across the next update's file swap") {
    val path = tmpDir("q-snapshot") + "/state"
    val snap = QuantileState.update(spark, path,
      events.filter(col("value") < 50), Seq("event_type"), "value", Ps)
    QuantileState.update(spark, path, events, Seq("event_type"), "value", Ps)
    // The snapshot must still read (files it was planned over are gone)
    // and reflect the PRE-swap state: every p95 from the <50 half must
    // sit below the post-update p95's domain ceiling.
    val snapVals = readEst(snap)
    assert(snapVals.nonEmpty)
    snapVals.values.foreach(vs => vs.foreach(v => assert(v < 50,
      s"snapshot leaked post-swap values: $vs")))
  }

  test("merging sketches persisted at a different epsilon fails loudly") {
    // A persisted sketch carries its own relativeError; silently merging
    // into a looser/tighter aggregator would void the stated rank bound.
    val vals = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val sk = vals.agg(
      graft.functions.QuantileSketch.sketchAgg(vals, col("v"), 0.01).as("s"))
    // Same epsilon: merges fine.
    sk.agg(graft.functions.QuantileSketch.mergeAgg(sk, col("s"), 0.01).as("m")).collect()
    // Mismatched epsilon: the task must fail with the explicit message,
    // not produce an estimate with a silently broken bound.
    val ex = intercept[Exception] {
      sk.agg(graft.functions.QuantileSketch.mergeAgg(sk, col("s"), 0.05).as("m")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("relativeError mismatch")),
      s"expected the epsilon guard, got: ${chain(ex).mkString(" | ")}")
  }

  test("percentile column names keep the full fractional part") {
    val path = tmpDir("q-pname") + "/state"
    val fine = Seq(0.5, 0.9995, 0.951, 0.9505)
    QuantileState.update(spark, path, events, Seq("event_type"), "value", fine)
    val cols = QuantileState.estimates(spark, path, Seq("event_type"), fine).columns
    // 0.9995 and 0.951/0.9505 must not collide (the old one-digit
    // rendering made all three p99_10/p95_1-ish duplicates).
    assert(cols.toSeq == Seq("event_type", "p50", "p99_95", "p95_1", "p95_05"), cols.toSeq)
  }

  test("update with lease=true acquires and releases the cross-driver lease") {
    val path = tmpDir("q-lease") + "/state"
    QuantileState.update(spark, path, events, Seq("event_type"), "value", Ps,
      lease = true)
    val lp = LeaseLock.leasePath(path)
    val hfs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(lp), "lease must be released after a successful update")
    // The exclusivity gate update(lease=true) goes through: while a
    // foreign driver holds the lease, acquisition refuses.
    val foreign = LeaseLock.acquire(spark, path).get
    assert(LeaseLock.acquire(spark, path).isEmpty, "second holder must be refused")
    LeaseLock.release(spark, foreign)
  }
}
