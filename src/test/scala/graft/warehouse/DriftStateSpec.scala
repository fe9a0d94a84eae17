package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpState(): String =
    java.nio.file.Files.createTempDirectory("graft-dstate-spec").toString + "/s"

  private def binned(rows: (String, Boolean, Long)*) =
    rows.toDF("g", "is_ref", "bin")

  test("frozen-ref + batched current fold equals the one-shot PSI exactly") {
    val data = binned(
      ("a", true, 0L), ("a", true, 0L), ("a", true, 1L), ("a", false, 0L),
      ("a", false, 2L), ("a", false, 2L), ("b", true, 1L), ("b", false, 1L))
    val p = tmpState()
    DriftState.initReference(spark, p, data.filter(col("is_ref")), Seq("g"), "bin")
    // current side folded in two batches split arbitrarily
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

  test("fold order and batch partitioning do not change the state") {
    val cur = binned(("g", false, 0L), ("g", false, 0L), ("g", false, 1L),
      ("g", false, 2L))
    val ref = binned(("g", true, 0L), ("g", true, 1L))
    def run(splits: Seq[Long => Boolean]): Map[Long, (Long, Long)] = {
      val p = tmpState()
      DriftState.initReference(spark, p, ref, Seq("g"), "bin")
      splits.foreach { pred =>
        val f = udf(pred)
        DriftState.update(spark, p, cur.filter(f(col("bin"))), Seq("g"), "bin")
      }
      spark.read.parquet(p).collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur")))).toMap
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
    val st = spark.read.parquet(p).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_ref")).toMap
    assert(st == Map(0L -> 2L, 1L -> 1L))
  }
}
