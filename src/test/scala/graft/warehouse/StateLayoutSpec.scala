package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Legacy-layout symmetry audit across the state families (r12 verdict
  * item 9): [[CovarianceState]] carries a legacy guard + `migrate-state`
  * verb because it CHANGED layout in round 10 (single folded root table
  * → stats/ + deltas/). This spec pins, per family, why no equivalent
  * guard is needed — by layout fingerprint, not by assertion in prose:
  *
  *  - **Fold-in-place families** (Moments, Sketch, Quantile, Novelty,
  *    Skyline, FrequentItems): the state root IS the single staged-swap
  *    parquet table and always has been. Whatever parquet data sits at
  *    the root is READ AND MERGED by the next update (their
  *    replay-≡-one-shot specs prove it), so a pre-existing table can
  *    never be silently orphaned — the failure mode the covariance
  *    guard exists for is structurally impossible.
  *  - **Born-on-delta-dir families** (EvalState, DriftState, DedupIndex,
  *    RetrievalIndex): these shipped WITH the stats/ + delta-dir
  *    protocol from their first commit — there is no older layout in
  *    the lineage to migrate, so a "legacy dir" for them is foreign
  *    data, not an orphaned state. The fingerprint test pins that the
  *    FIRST update creates the commit-marker layout (stats/ present, no
  *    root-level data files), so any future layout change that would
  *    create a migration debt fails this spec by name.
  */
class StateLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def hfsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rootDataFiles(root: String): Seq[String] = {
    val p = new Path(root)
    val hfs = hfsOf(root)
    if (!hfs.exists(p)) Nil
    else hfs.listStatus(p).toSeq.filter(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet")).map(_.getPath.getName)
  }

  private def subDirs(root: String): Set[String] = {
    val p = new Path(root)
    val hfs = hfsOf(root)
    if (!hfs.exists(p)) Set.empty
    else hfs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_.startsWith(".")).toSet
  }

  test("fold-in-place families keep the root-table layout: pre-existing " +
    "state is merged by the next update, never orphaned") {
    // Representative: MomentsState. Seed a state with batch A, then
    // update with batch B — the A-derived statistics must survive in
    // the post-B snapshot (i.e. the root table was read and folded, not
    // treated as empty and overwritten).
    val root = tmpDir("layout-moments") + "/state"
    val a = Seq(("g", 1.0), ("g", 2.0)).toDF("grp", "v")
    val b = Seq(("g", 3.0)).toDF("grp", "v")
    MomentsState.update(spark, root, a, Seq("grp"), "v")
    // Layout fingerprint: the state root itself is the parquet table.
    assert(rootDataFiles(root).nonEmpty,
      s"MomentsState root must hold the table's data files: $root")
    assert(!subDirs(root).contains("deltas") && !subDirs(root).contains("stats"),
      "fold-in-place families must not grow delta-dir structure unnoticed")
    val out = MomentsState.update(spark, root, b, Seq("grp"), "v")
      .collect().head
    assert(out.getAs[Long]("n") == 3L,
      s"pre-existing state must fold into the next update: $out")
  }

  test("born-on-delta-dir families create the commit-marker layout on " +
    "their FIRST update (no root-level data, stats/ present)") {
    // EvalState
    val evalRoot = tmpDir("layout-eval") + "/state"
    EvalState.update(spark, evalRoot,
      Seq(("s", 500000L, true), ("s", 100000L, false))
        .toDF("source", "score_micro", "label"))
    assert(rootDataFiles(evalRoot).isEmpty &&
      subDirs(evalRoot) == Set("deltas", "stats"),
      s"EvalState layout drifted: files=${rootDataFiles(evalRoot)} " +
        s"dirs=${subDirs(evalRoot)}")
    // DriftState (ref/ + cur/ delta dirs + stats marker)
    val driftRoot = tmpDir("layout-drift") + "/state"
    DriftState.initReference(spark, driftRoot,
      Seq(("g", 1L)).toDF("grp", "bin"), Seq("grp"), "bin")
    assert(rootDataFiles(driftRoot).isEmpty &&
      subDirs(driftRoot).contains("stats"),
      s"DriftState layout drifted: dirs=${subDirs(driftRoot)}")
    // CovarianceState (the migrated family — the guard's own specs
    // cover legacy; here just pin the new layout fingerprint).
    val covRoot = tmpDir("layout-cov") + "/state"
    CovarianceState.update(spark, covRoot,
      graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(8))
    assert(rootDataFiles(covRoot).isEmpty &&
      subDirs(covRoot) == Set("deltas", "stats"),
      s"CovarianceState layout drifted: dirs=${subDirs(covRoot)}")
  }

  test("index families create the commit-marker layout on first ingest") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(20)
    val dedupRoot = tmpDir("layout-dedup") + "/idx"
    DedupIndex.matchAndIngest(spark, dedupRoot, docs, threshold = 0.7)
    assert(rootDataFiles(dedupRoot).isEmpty &&
      subDirs(dedupRoot).contains("stats"),
      s"DedupIndex layout drifted: dirs=${subDirs(dedupRoot)}")
    val retrRoot = tmpDir("layout-retr") + "/idx"
    RetrievalIndex.update(spark, retrRoot, docs)
    assert(rootDataFiles(retrRoot).isEmpty &&
      subDirs(retrRoot).contains("stats"),
      s"RetrievalIndex layout drifted: dirs=${subDirs(retrRoot)}")
  }

  test("round-14 state additions are born on the delta-dir layout too " +
    "(IvfPqState, DecontamState)") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(20)
    val ivfpqRoot = tmpDir("layout-ivfpq") + "/state"
    IvfPqState.update(spark, ivfpqRoot, emb)
    assert(rootDataFiles(ivfpqRoot).isEmpty &&
      subDirs(ivfpqRoot) == Set("deltas", "stats"),
      s"IvfPqState layout drifted: dirs=${subDirs(ivfpqRoot)}")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    val decRoot = tmpDir("layout-dec") + "/state"
    DecontamState.update(spark, decRoot, docs.limit(5), docs)
    assert(rootDataFiles(decRoot).isEmpty &&
      subDirs(decRoot) == Set("deltas", "stats"),
      s"DecontamState layout drifted: dirs=${subDirs(decRoot)}")
  }
}
