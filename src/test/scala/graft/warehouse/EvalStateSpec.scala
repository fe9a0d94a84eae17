package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EvalStateSpec extends SparkSpec {

  private def scored = graft.analytics.ModelEval.scoredDocs(
    graft.core.Tables.documents(spark, "/root/testdata/sf0.001"))

  private def read(p: String) =
    EvalState.snapshot(spark, p).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("pos"))).toMap

  test("3-batch fold equals one-shot EXACTLY, any partitioning") {
    val onePath = tmpDir("eval-one") + "/state"
    val repPath = tmpDir("eval-rep") + "/state"
    EvalState.update(spark, onePath, scored)
    Seq(0, 1, 2).foreach { i =>
      EvalState.update(spark, repPath,
        scored.filter(col("doc_id") % 3 === i).repartition(i + 2))
    }
    val one = read(onePath)
    assert(one.nonEmpty && one == read(repPath),
      "integer bin counts must merge with zero drift")
    // And the state equals the direct one-shot aggregate.
    val direct = scored
      .groupBy(col("source"), (col("score_micro") / 100000L).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("pos"))).toMap
    assert(one == direct, "state drifted from the direct aggregate")
  }

  test("committed replay short-circuits; compaction preserves the fold") {
    val path = tmpDir("eval-rp") + "/state"
    Seq(0, 1, 2).foreach { i =>
      EvalState.update(spark, path, scored.filter(col("doc_id") % 3 === i))
    }
    val before = read(path)
    // Replaying a committed epoch with DIFFERENT content must be a no-op.
    EvalState.update(spark, path, scored.limit(5), batchId = Some(1L))
    assert(read(path) == before, "a committed replay must not re-fold")
    val reports = EvalState.compact(spark, path)
    assert(reports.exists(_.dirsAfter == 1), s"fold: $reports")
    assert(read(path) == before,
      "compaction must not change the folded counts")
  }

  test("snapshot survives the next swap; foreign lease excludes") {
    val path = tmpDir("eval-lease") + "/state"
    val snap1 = EvalState.update(spark, path,
      scored.filter(col("doc_id") % 2 === 0))
    val n1 = snap1.agg(sum("n")).head.getLong(0)
    EvalState.update(spark, path, scored.filter(col("doc_id") % 2 === 1),
      lease = true)
    // The first snapshot was checkpointed — still readable post-swap.
    assert(snap1.agg(sum("n")).head.getLong(0) == n1)
    // The leased update released its lease: a foreign driver can take it,
    // and while held no second holder fits (the MetaLeaseSpec shape).
    val foreign = LeaseLock.acquire(spark, path).get
    assert(LeaseLock.acquire(spark, path).isEmpty,
      "foreign lease must exclude a second holder")
    LeaseLock.release(spark, foreign)
  }

  test("50-batch sustained ingest + compaction: result-identical, " +
    "~10x fewer delta files, replay still short-circuits (r10 verdict #6)") {
    val n = 50
    val path = tmpDir("eval-50") + "/state"
    (0 until n).foreach { i =>
      EvalState.update(spark, path, scored.filter(col("doc_id") % n === i))
    }
    val before = read(path)
    def deltaFiles: Int = {
      val p = new org.apache.hadoop.fs.Path(s"$path/deltas")
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(d: org.apache.hadoop.fs.Path): Int =
        hfs.listStatus(d).map(st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet")) 1 else 0).sum
      walk(p)
    }
    val filesBefore = deltaFiles
    val reports = EvalState.compact(spark, path)
    assert(reports.exists(r => r.dirsBefore == n && r.dirsAfter == 1),
      s"fold must collapse $n delta dirs to 1: $reports")
    val filesAfter = deltaFiles
    assert(filesAfter * 10 <= filesBefore,
      s"compaction must cut delta files ~10x: $filesBefore -> $filesAfter")
    assert(read(path) == before,
      "50-batch fold + compact changed the counts")
    // Post-compact: a committed replay (epoch < last_batch) stays a no-op
    // even though its delta dir was folded away...
    EvalState.update(spark, path, scored.limit(7), batchId = Some(12L))
    assert(read(path) == before, "post-compact replay must short-circuit")
    // ...and fresh ingestion continues on top of the consolidated state.
    EvalState.update(spark, path, scored.filter(col("doc_id") % n === 0))
    val after = read(path)
    assert(after.values.map(_._1).sum ==
      before.values.map(_._1).sum + scored.filter(col("doc_id") % n === 0).count(),
      "post-compact ingest must fold the new batch exactly once")
  }

  test("sweepSnapshot from state equals the direct q213 sweep") {
    val path = tmpDir("eval-sw") + "/state"
    Seq(0, 1, 2).foreach { i =>
      EvalState.update(spark, path, scored.filter(col("doc_id") % 3 === i))
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("threshold_micro") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Long]("tn"), r.getAs[Long]("precision_micro"),
          r.getAs[Long]("recall_micro"), r.getAs[Long]("f1_micro"))).toMap
    val fromState = key(EvalState.sweepSnapshot(spark, path))
    val direct = key(graft.analytics.ModelEval.thresholdSweep(
      scored, "score_micro", "label"))
    assert(fromState.nonEmpty && fromState == direct,
      "state-derived sweep must equal the corpus-scan sweep row-for-row")
  }
}
