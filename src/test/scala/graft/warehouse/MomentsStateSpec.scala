package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact mergeable moments: replay ≡ one-shot bit-for-bit (no error
  * bound — integer sums), derived variance matches a BigInt reference,
  * snapshots survive the next swap, and the lease bracket excludes
  * foreign writers like its state-table siblings.
  */
class MomentsStateSpec extends SparkSpec {
  import spark.implicits._

  private def orders = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
    .select(col("o_orderkey"), col("o_orderpriority").as("g"),
      floor(col("o_totalprice")).cast("long").as("v"))

  private def read(p: String) =
    MomentsState.stats(spark, p, Seq("g")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("sum"),
        r.getAs[Long]("sumsq"), r.getAs[Long]("min"), r.getAs[Long]("max"),
        r.getAs[Long]("mean_micro"))).toMap

  test("3-batch replay equals one-shot EXACTLY, any partitioning") {
    val onePath = tmpDir("mom-one") + "/state"
    val repPath = tmpDir("mom-rep") + "/state"
    MomentsState.update(spark, onePath, orders, Seq("g"), "v")
    Seq(0, 1, 2).foreach { i =>
      MomentsState.update(spark, repPath,
        orders.filter(col("o_orderkey") % 3 === i).repartition(i + 2),
        Seq("g"), "v")
    }
    assert(read(onePath) == read(repPath),
      "integer moments must merge with zero drift")
    // And the state equals the direct aggregate of the corpus.
    val direct = orders.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    read(onePath).foreach { case (g, (n, s, _, _, _, _)) =>
      assert(direct(g) == ((n, s)), s"state drifted from direct aggregate for $g")
    }
  }

  test("variance derived from (n, sum, sumsq) matches a BigInt reference") {
    val path = tmpDir("mom-var") + "/state"
    MomentsState.update(spark, path, orders, Seq("g"), "v")
    val rows = orders.collect().map(r => r.getString(1) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    read(path).foreach { case (g, (n, s, sq, mn, mx, meanMicro)) =>
      val vs = rows(g)
      assert(n == vs.length && s == vs.sum && mn == vs.min && mx == vs.max)
      assert(BigInt(sq) == vs.map(v => BigInt(v) * v).sum,
        s"$g: sumsq mismatch")
      assert(meanMicro == (BigInt(1000000) * s / n).toLong)
      // n·Σv² − (Σv)² ≥ 0 and equals the BigInt population-variance
      // numerator — the quantity a caller derives spread from.
      val numer = BigInt(n) * sq - BigInt(s) * s
      val ref = vs.map(v => BigInt(n) * v - s).map(x => x * x).sum / n
      assert(numer >= 0 && numer == ref, s"$g: variance numerator drifted")
    }
  }

  test("stats snapshot stays valid across the next update's file swap") {
    val path = tmpDir("mom-snap") + "/state"
    val snap = MomentsState.update(spark, path,
      orders.filter(col("o_orderkey") % 2 === 0), Seq("g"), "v")
    MomentsState.update(spark, path,
      orders.filter(col("o_orderkey") % 2 === 1), Seq("g"), "v")
    // The first snapshot was eagerly checkpointed — still readable, and
    // still the half-corpus numbers.
    val half = snap.collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val evens = orders.filter(col("o_orderkey") % 2 === 0)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(half == evens, "snapshot must reflect its own update, not the next")
  }

  test("foreign lease holder excludes the update; release restores it") {
    val path = tmpDir("mom-lease") + "/state"
    MomentsState.update(spark, path, orders, Seq("g"), "v", lease = true)
    // The update released its lease: a foreign driver can take it, and
    // while held no second holder fits (the MetaLeaseSpec exclusion
    // shape — a leased update would block then fail on this state).
    val foreign = LeaseLock.acquire(spark, path).get
    assert(LeaseLock.acquire(spark, path).isEmpty,
      "foreign lease must exclude a second holder")
    LeaseLock.release(spark, foreign)
    MomentsState.update(spark, path, orders, Seq("g"), "v", lease = true)
  }
}
