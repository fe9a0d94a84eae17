package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpState(): String =
    java.nio.file.Files.createTempDirectory("graft-dstate-spec").toString + "/s"

  private def binned(rows: (String, Boolean, Long)*) =
    rows.toDF("g", "is_ref", "bin")

  private def countsMap(root: String) =
    DriftState.counts(spark, root, Seq("g")).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur")))).toMap

  test("frozen-ref + batched current fold equals the one-shot PSI exactly") {
    val data = binned(
      ("a", true, 0L), ("a", true, 0L), ("a", true, 1L), ("a", false, 0L),
      ("a", false, 2L), ("a", false, 2L), ("b", true, 1L), ("b", false, 1L))
    val p = tmpState()
    DriftState.initReference(spark, p, data.filter(col("is_ref")), Seq("g"), "bin")
    DriftState.update(spark, p, data.filter(!col("is_ref") && col("bin") < 2),
      Seq("g"), "bin")
    DriftState.update(spark, p, data.filter(!col("is_ref") && col("bin") >= 2),
      Seq("g"), "bin")
    val fromState = DriftState.psiSnapshot(spark, p, "g", 10)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("term_ppm")))).toMap
    val oneShot = graft.analytics.Statistics.psi(data, "g", "is_ref", "bin", 10)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("term_ppm")))).toMap
    assert(fromState == oneShot, "state-derived PSI must be bit-identical")
  }

  test("fold order and batch partitioning do not change the counts") {
    val cur = binned(("g", false, 0L), ("g", false, 0L), ("g", false, 1L),
      ("g", false, 2L))
    val ref = binned(("g", true, 0L), ("g", true, 1L))
    def run(splits: Seq[Long => Boolean]): Map[(String, Long), (Long, Long)] = {
      val p = tmpState()
      DriftState.initReference(spark, p, ref, Seq("g"), "bin")
      splits.foreach { pred =>
        val f = udf(pred)
        DriftState.update(spark, p, cur.filter(f(col("bin"))), Seq("g"), "bin")
      }
      countsMap(p)
    }
    val a = run(Seq(b => b < 1, b => b >= 1))
    val b = run(Seq(b => b >= 1, b => b < 1))
    val c = run(Seq(_ => true))
    assert(a == b && b == c)
  }

  test("reference can be frozen in parts; extension folds by addition") {
    val p = tmpState()
    DriftState.initReference(spark, p, binned(("g", true, 0L)), Seq("g"), "bin")
    DriftState.initReference(spark, p, binned(("g", true, 0L), ("g", true, 1L)),
      Seq("g"), "bin")
    assert(countsMap(p) == Map(("g", 0L) -> ((2L, 0L)), ("g", 1L) -> ((1L, 0L))))
  }

  test("a replayed committed epoch short-circuits — no double count") {
    val p = tmpState()
    DriftState.initReference(spark, p, binned(("g", true, 0L)), Seq("g"), "bin",
      batchId = Some(0L))
    DriftState.update(spark, p, binned(("g", false, 0L)), Seq("g"), "bin",
      batchId = Some(1L))
    // Replay epoch 1 with different content: must be ignored entirely.
    DriftState.update(spark, p, binned(("g", false, 0L), ("g", false, 5L)),
      Seq("g"), "bin", batchId = Some(1L))
    assert(countsMap(p) == Map(("g", 0L) -> ((1L, 1L))))
  }

  test("an orphan (uncommitted) delta dir is excluded from reads") {
    val p = tmpState()
    DriftState.initReference(spark, p, binned(("g", true, 0L)), Seq("g"), "bin")
    // Simulate a crash AFTER the delta write but BEFORE the marker: write
    // a batch=99 dir by hand without committing it.
    binned(("g", false, 7L)).groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_ref", lit(0L)).withColumn("n_cur", col("n")).drop("n")
      .write.mode("overwrite").parquet(s"$p/cur/batch=99")
    assert(countsMap(p) == Map(("g", 0L) -> ((1L, 0L))),
      "uncommitted residue must not leak into counts")
    // The replay of that epoch commits it; now it counts once.
    DriftState.update(spark, p, binned(("g", false, 7L)), Seq("g"), "bin",
      batchId = Some(99L))
    assert(countsMap(p) == Map(("g", 0L) -> ((1L, 0L)), ("g", 7L) -> ((0L, 1L))))
  }
}
