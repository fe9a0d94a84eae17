package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental covariance state: replay ≡ one-shot bit-for-bit (integer
  * sufficient statistics, no error term), the assembled matrix matches
  * the direct [[graft.analytics.Pca.covarianceMatrix]], and the PCA
  * basis read from state solves the eigen equation of the directly
  * computed matrix — incremental PCA with zero history re-scan.
  */
class CovarianceStateSpec extends SparkSpec {

  private def emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def read(p: String) =
    CovarianceState.snapshot(spark, p).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("s_x_nano"),
          r.getAs[Long]("s_y_nano"), r.getAs[Long]("s_xy_nano"))).toMap

  test("legacy root-layout state fails loudly instead of starting fresh " +
    "(r10 advice)") {
    import spark.implicits._
    val root = tmpDir("cov-legacy") + "/state"
    // Simulate the pre-r10 layout: a folded pair-stats table at the
    // state ROOT, no stats/ commit table.
    Seq((0, 0, 10L, 5L, 5L, 3L))
      .toDF("i", "j", "n", "s_x_nano", "s_y_nano", "s_xy_nano")
      .write.parquet(root)
    val eu = intercept[RuntimeException] {
      CovarianceState.update(spark, root, emb)
    }
    assert(eu.getMessage.contains("legacy"),
      s"update must refuse the legacy layout loudly: ${eu.getMessage}")
    val es = intercept[RuntimeException] {
      CovarianceState.snapshot(spark, root).collect()
    }
    assert(es.getMessage.contains("legacy"),
      s"snapshot must refuse the legacy layout loudly: ${es.getMessage}")
  }

  test("PARTITIONED legacy state (data only under partition dirs) also " +
    "fails loudly — no silent orphaning (r12 advice)") {
    import spark.implicits._
    val root = tmpDir("cov-legacy-part") + "/state"
    // A pre-r10 table written partitioned: no .parquet file sits at the
    // root itself, every data file lives under part=X/ subdirs. The
    // root-level-only probe treated this as an empty state and silently
    // started fresh over it.
    Seq((0, 0, 10L, 5L, 5L, 3L, "a"), (0, 1, 7L, 2L, 2L, 1L, "b"))
      .toDF("i", "j", "n", "s_x_nano", "s_y_nano", "s_xy_nano", "part")
      .write.partitionBy("part").parquet(root)
    val eu = intercept[RuntimeException] {
      CovarianceState.update(spark, root, emb)
    }
    assert(eu.getMessage.contains("legacy"),
      s"update must refuse the partitioned legacy layout: ${eu.getMessage}")
    val es = intercept[RuntimeException] {
      CovarianceState.snapshot(spark, root).collect()
    }
    assert(es.getMessage.contains("legacy"),
      s"snapshot must refuse the partitioned legacy layout: ${es.getMessage}")
  }

  test("migrateLegacy round-trips: legacy -> migrate -> update -> snapshot " +
    "equals the clean one-shot (r12 verdict)") {
    val root = tmpDir("cov-migrate") + "/state"
    val firstHalf = emb.filter(col("vec_id") % 2 === 0)
    val secondHalf = emb.filter(col("vec_id") % 2 =!= 0)
    // The pre-r10 layout: folded pair stats at the root, PARTITIONED
    // (the harder shape — pairs sharded across partition dirs must
    // re-fold exactly), no stats/ commit table.
    graft.analytics.Pca.covarianceStats(firstHalf)
      .withColumn("part", col("i") % 2)
      .write.partitionBy("part").parquet(root)
    CovarianceState.migrateLegacy(spark, root)
    // Idempotent re-run (crash-after-install replay) is a no-op.
    CovarianceState.migrateLegacy(spark, root)
    // Legacy files are gone; the guard no longer fires; updates resume
    // on top of the migrated batch 0.
    CovarianceState.update(spark, root, secondHalf)
    val clean = tmpDir("cov-migrate-clean") + "/state"
    CovarianceState.update(spark, clean, emb)
    assert(read(root) == read(clean),
      "migrated-then-updated state must equal the clean one-shot")
    // And a root with neither legacy data nor state refuses loudly.
    val err = intercept[RuntimeException] {
      CovarianceState.migrateLegacy(spark, tmpDir("cov-migrate-empty"))
    }
    assert(err.getMessage.contains("nothing to migrate"))
  }

  test("first-batch crash residue (deltas/ without stats/) is NOT legacy: " +
    "the next update recovers and proceeds") {
    val root = tmpDir("cov-crash-resume") + "/state"
    // Simulate: first update wrote deltas/batch=0 then crashed before
    // the stats install. The legacy guard must not misread the orphan
    // delta as a legacy table; update must succeed and re-ingest.
    graft.analytics.Pca.covarianceStats(
        emb.filter(col("vec_id") % 7 === 0))
      .coalesce(1).write.parquet(s"$root/deltas/batch=0")
    val out = CovarianceState.update(spark, root, emb)
    assert(out.count() > 0, "update must proceed past crash residue")
    // The state now equals a clean one-shot over the full corpus (the
    // orphan batch=0 was never committed; the real batch 0 overwrote it).
    val clean = tmpDir("cov-crash-clean") + "/state"
    CovarianceState.update(spark, clean, emb)
    assert(read(root) == read(clean),
      "orphan delta must not leak into the committed snapshot")
  }

  test("3-batch replay equals one-shot EXACTLY, any partitioning") {
    val onePath = tmpDir("cov-one") + "/state"
    val repPath = tmpDir("cov-rep") + "/state"
    CovarianceState.update(spark, onePath, emb)
    Seq(0, 1, 2).foreach { i =>
      CovarianceState.update(spark, repPath,
        emb.filter(col("vec_id") % 3 === i).repartition(i + 2))
    }
    val one = read(onePath)
    assert(one.nonEmpty && one == read(repPath),
      "integer covariance stats must merge with zero drift")
    // And the state equals the direct one-shot sufficient statistics.
    val direct = graft.analytics.Pca.covarianceStats(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("s_x_nano"),
          r.getAs[Long]("s_y_nano"), r.getAs[Long]("s_xy_nano"))).toMap
    assert(one == direct, "state drifted from the direct aggregate")
  }

  test("PCA basis from state solves the directly-computed eigen equation") {
    val path = tmpDir("cov-pca") + "/state"
    Seq(0, 1).foreach { i =>
      CovarianceState.update(spark, path, emb.filter(col("vec_id") % 2 === i))
    }
    val fromState = CovarianceState.covariance(spark, path)
    val direct = graft.analytics.Pca.covarianceMatrix(emb)
    for (i <- direct.indices; j <- direct.indices)
      assert(math.abs(fromState(i)(j) - direct(i)(j)) < 1e-12,
        s"assembled covariance drifted at ($i,$j)")
    val comps = CovarianceState.principalComponents(spark, path, r = 2)
    val l1 = math.max(comps.head._1, 1.0)
    comps.foreach { case (l, v) =>
      val av = direct.map(_.zip(v).map { case (a, b) => a * b }.sum)
      val resid = math.sqrt(
        av.zip(v).map { case (a, b) => (a - l * b) * (a - l * b) }.sum)
      assert(resid < 1e-6 * l1, s"state-derived component residual $resid")
    }
  }

  test("snapshot survives the next swap; foreign lease excludes") {
    val path = tmpDir("cov-snap") + "/state"
    val snap1 = CovarianceState.update(spark, path,
      emb.filter(col("vec_id") % 2 === 0))
    val n1 = snap1.agg(max("n")).head.getLong(0)
    CovarianceState.update(spark, path, emb.filter(col("vec_id") % 2 === 1),
      lease = true)
    // The first snapshot was checkpointed — still readable post-swap.
    assert(snap1.agg(max("n")).head.getLong(0) == n1)
    // The leased update released its lease: a foreign driver can take it,
    // and while held no second holder fits (the MetaLeaseSpec shape).
    val foreign = LeaseLock.acquire(spark, path).get
    assert(LeaseLock.acquire(spark, path).isEmpty,
      "foreign lease must exclude a second holder")
    LeaseLock.release(spark, foreign)
  }

  test("migrateLegacy REFUSES to clean up another state family's root " +
    "(r13 advice: the stats/-present branch must not delete foreign data)") {
    import spark.implicits._
    // Simulate a delta-dir sibling state's layout: stats/ (every family
    // has one) plus a data dir whose schema is NOT the six covariance
    // columns — the shape of RetrievalIndex postings / an IVF bundle.
    val root = tmpDir("cov-foreign") + "/state"
    StateFiles.install(spark, s"$root/stats", Seq(3L).toDF("last_batch"))
    Seq((1L, Seq(0.1, 0.2), 7)).toDF("vec_id", "embedding", "cell")
      .write.parquet(s"$root/bundle")
    val err = intercept[RuntimeException] {
      CovarianceState.migrateLegacy(spark, root)
    }
    assert(err.getMessage.contains("refusing"),
      s"cleanup must refuse a foreign-looking root: ${err.getMessage}")
    assert(new java.io.File(s"$root/bundle").exists,
      "the foreign data dir must survive the refused migrate")
    // Whereas genuine six-column residue (crash after the stats install,
    // before the legacy delete) IS cleaned up on the re-run.
    val resume = tmpDir("cov-resume") + "/state"
    StateFiles.install(spark, s"$resume/stats", Seq(0L).toDF("last_batch"))
    graft.analytics.Pca.covarianceStats(emb)
      .coalesce(1).write.parquet(s"$resume/leftover")
    CovarianceState.migrateLegacy(spark, resume)
    assert(!new java.io.File(s"$resume/leftover").exists,
      "genuine legacy residue must be cleaned up")
  }

  test("legacy table PARTITIONED BY a stats column migrates (r13 advice: " +
    "basePath recovers the partition column)") {
    val root = tmpDir("cov-migrate-bypart") + "/state"
    // Pre-r10 layout partitioned by `i` itself: without basePath the
    // leaf-dir read drops `i` and the shape check fails misleadingly.
    graft.analytics.Pca.covarianceStats(emb)
      .write.partitionBy("i").parquet(root)
    CovarianceState.migrateLegacy(spark, root)
    val clean = tmpDir("cov-migrate-bypart-clean") + "/state"
    CovarianceState.update(spark, clean, emb)
    assert(read(root) == read(clean),
      "i-partitioned legacy state must migrate to the clean one-shot")
  }
}
