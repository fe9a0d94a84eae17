package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental MG heavy hitters: replay ≡ one-shot exact counts in the
  * sub-capacity regime, the MG presence/undercount bounds hold under
  * real eviction, capacity mismatches fail loudly, snapshots survive the
  * next swap, and the lease bracket excludes foreign writers like its
  * state-table siblings.
  */
class FrequentItemsStateSpec extends SparkSpec {
  import spark.implicits._

  private def items = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    .select(col("l_orderkey"), col("l_returnflag").as("g"),
      col("l_quantity").cast("long").cast("string").as("item"))

  private def read(p: String) =
    FrequentItemsState.estimates(spark, p, Seq("g")).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("item")) ->
        r.getAs[Long]("est")).toMap

  test("sub-capacity fold: 3-batch replay equals one-shot exact counts") {
    val onePath = tmpDir("fi-one") + "/state"
    val repPath = tmpDir("fi-rep") + "/state"
    FrequentItemsState.update(spark, onePath, items, Seq("g"), "item", 64)
    Seq(0, 1, 2).foreach { i =>
      FrequentItemsState.update(spark, repPath,
        items.filter(col("l_orderkey") % 3 === i).repartition(i + 2),
        Seq("g"), "item", 64)
    }
    assert(read(onePath) == read(repPath),
      "sub-capacity MG folds must merge with zero drift")
    val direct = items.groupBy("g", "item").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(read(onePath) == direct, "state drifted from the direct aggregate")
  }

  test("eviction regime: planted heavy item survives with bounded undercount") {
    val path = tmpDir("fi-evict") + "/state"
    // 400 occurrences of HEAVY + 600 singletons, capacity 9:
    // threshold n/(k+1) = 1000/10 = 100 < 400, so HEAVY must be present
    // with est in [400 - 100, 400]; noise items can never exceed capacity.
    val heavy = Seq.fill(400)("HEAVY")
    val noise = (0 until 600).map(i => s"noise_$i")
    val batches = new scala.util.Random(42).shuffle(heavy ++ noise).grouped(250).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      FrequentItemsState.update(spark,
        path, b.map(("g", _)).toDF("g", "item").repartition(3),
        Seq("g"), "item", capacity = 9)
    }
    val est = FrequentItemsState.estimates(spark, path, Seq("g")).collect()
    assert(est.length <= 9, "state size must stay within capacity")
    val heavyRow = est.find(_.getAs[String]("item") == "HEAVY")
    assert(heavyRow.isDefined, "an item above n/(k+1) can never be evicted")
    val e = heavyRow.get.getAs[Long]("est")
    val bound = heavyRow.get.getAs[Long]("max_undercount")
    assert(bound == 100L)
    assert(e <= 400L && e >= 400L - bound,
      s"est $e outside the MG undercount bound [300, 400]")
  }

  test("capacity mismatch fails loudly instead of merging silently") {
    val path = tmpDir("fi-cap") + "/state"
    FrequentItemsState.update(spark, path, items, Seq("g"), "item", 64)
    val ex = intercept[IllegalArgumentException] {
      FrequentItemsState.update(spark, path, items, Seq("g"), "item", 32)
    }
    assert(ex.getMessage.contains("capacity mismatch"))
  }

  test("estimates snapshot stays valid across the next update's file swap") {
    val path = tmpDir("fi-snap") + "/state"
    val snap = FrequentItemsState.update(spark, path,
      items.filter(col("l_orderkey") % 2 === 0), Seq("g"), "item", 64)
    FrequentItemsState.update(spark, path,
      items.filter(col("l_orderkey") % 2 === 1), Seq("g"), "item", 64)
    val half = snap.collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("item")) ->
        r.getAs[Long]("est")).toMap
    val evens = items.filter(col("l_orderkey") % 2 === 0)
      .groupBy("g", "item").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(half == evens, "snapshot must reflect its own update, not the next")
  }

  test("foreign lease holder excludes the update; release restores it") {
    val path = tmpDir("fi-lease") + "/state"
    FrequentItemsState.update(spark, path, items, Seq("g"), "item", 64,
      lease = true)
    val foreign = LeaseLock.acquire(spark, path).get
    assert(LeaseLock.acquire(spark, path).isEmpty,
      "foreign lease must exclude a second holder")
    LeaseLock.release(spark, foreign)
    FrequentItemsState.update(spark, path, items, Seq("g"), "item", 64,
      lease = true)
  }
}
