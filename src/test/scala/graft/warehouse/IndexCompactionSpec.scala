package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-partition folding for the incremental indices (r9 verdict item
  * 2): many-batch ingestion + compaction must (a) leave match/search
  * results identical to an uncompacted twin, (b) collapse the per-batch
  * dir/file growth ~N×, and (c) keep the committed-replay short-circuit
  * working post-compact. Plus the marker-protocol crash matrix.
  */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

  private def batchDirCount(table: String): Int = {
    val p = new Path(table)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.listStatus(p).count(_.getPath.getName.startsWith("batch="))
  }

  test("dedup index: 15-batch ingest + mid/final compaction keeps matches " +
    "identical, collapses dirs, and preserves the committed-replay read") {
    val n = 15
    val plain = tmpDir("didx-fold-a") + "/idx"
    val folded = tmpDir("didx-fold-b") + "/idx"
    def slice(i: Int) = docs.filter(col("doc_id") % n === i)
    val plainMatches = (0 until n).map { i =>
      DedupIndex.matchAndIngest(spark, plain, slice(i), threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val foldedMatches = (0 until n).map { i =>
      if (i == 8) DedupIndex.compact(spark, folded) // mid-stream fold
      DedupIndex.matchAndIngest(spark, folded, slice(i), threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(plainMatches == foldedMatches,
      "mid-stream compaction changed batch-vs-index matches")
    val reports = DedupIndex.compact(spark, folded)
    assert(reports.forall(_.dirsAfter == 1), s"final fold: $reports")
    assert(batchDirCount(s"$plain/bands") == n &&
      batchDirCount(s"$folded/bands") == 1 &&
      batchDirCount(s"$folded/sets") == 1,
      "bands/sets must collapse to one consolidated partition")
    // matches/ keeps per-batch dirs — that IS the replay read contract.
    assert(batchDirCount(s"$folded/matches") == n)
    // (c) committed replay short-circuits post-compact: re-offering an
    // already-committed batch id returns the PERSISTED matches (content
    // of the garbage frame is never ingested, stats untouched).
    val statsBefore = spark.read.parquet(s"$folded/stats").head()
    val replay = DedupIndex.matchAndIngest(spark, folded,
      Seq((999999L, "garbage that was never indexed")).toDF("doc_id", "text"),
      threshold = 0.7, batchId = Some(9L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == foldedMatches(9), "replay must return persisted matches")
    assert(spark.read.parquet(s"$folded/stats").head() == statsBefore)
    // And ingestion CONTINUES cleanly after the final fold.
    val next = DedupIndex.matchAndIngest(spark, folded,
      Seq((1000000L, docs.orderBy("doc_id").head().getAs[String]("text")))
        .toDF("doc_id", "text"), threshold = 0.7)
    assert(next.count() >= 1, "post-fold ingest must still see old signatures")
  }

  test("retrieval index: 15-batch ingest + compaction ranks identically " +
    "and collapses postings/doclen dirs") {
    val n = 15
    val plain = tmpDir("ridx-fold-a") + "/idx"
    val folded = tmpDir("ridx-fold-b") + "/idx"
    (0 until n).foreach { i =>
      RetrievalIndex.update(spark, plain, docs.filter(col("doc_id") % n === i))
      RetrievalIndex.update(spark, folded, docs.filter(col("doc_id") % n === i))
    }
    val reports = RetrievalIndex.compact(spark, folded)
    assert(reports.forall(_.dirsAfter == 1) &&
      reports.forall(_.dirsBefore == n), s"fold: $reports")
    assert(batchDirCount(s"$folded/postings") == 1 &&
      batchDirCount(s"$plain/postings") == n)
    val queries = graft.analytics.Retrieval.BenchQueries
      .toDF("query_id", "query_text")
    def ranked(root: String) = RetrievalIndex.rank(spark, root, queries, k = 10)
      .collect().map(_.toSeq).toSet
    assert(ranked(folded) == ranked(plain),
      "compaction changed BM25 rankings")
  }

  test("fold crash matrix: no marker rolls back; marker rolls forward") {
    val table = tmpDir("fold-crash") + "/t"
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$table/batch=$i")
    }
    val hfs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash BEFORE the marker: junk tmp must be dropped, dirs untouched.
    Seq((99L, "junk")).toDF("id", "v").write.parquet(s"$table/.fold_tmp")
    IndexCompaction.recover(spark, table)
    assert(!hfs.exists(new Path(s"$table/.fold_tmp")))
    assert(batchDirCount(table) == 4)
    assert(spark.read.parquet(table).count() == 4)
    // Crash AFTER the marker (tmp verified, deletes not yet done): roll
    // forward must install tmp as batch=3 and drop dirs <= 3.
    spark.read.parquet((0 until 4).map(i => s"$table/batch=$i"): _*)
      .repartition(1).write.parquet(s"$table/.fold_tmp")
    val out = hfs.create(new Path(s"$table/.fold_commit"), true)
    out.write("3;".getBytes("UTF-8")); out.close()
    IndexCompaction.recover(spark, table)
    assert(batchDirCount(table) == 1)
    assert(spark.read.parquet(table).count() == 4)
    assert(spark.read.parquet(table).select("batch").distinct().head()
      .get(0).toString == "3")
    // Idempotent re-entry AFTER the rename (marker alone remains).
    val out2 = hfs.create(new Path(s"$table/.fold_commit"), true)
    out2.write("3;".getBytes("UTF-8")); out2.close()
    IndexCompaction.recover(spark, table)
    assert(spark.read.parquet(table).count() == 4,
      "marker-only recovery must not delete the installed partition")
  }

  test("crash between marker create and content write: empty marker " +
    "rolls back instead of wedging the table (r10 advice)") {
    val table = tmpDir("fold-crash-empty") + "/t"
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$table/batch=$i")
    }
    val hfs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((99L, "junk")).toDF("id", "v").write.parquet(s"$table/.fold_tmp")
    // hfs.create + crash before write: the marker exists but is EMPTY —
    // pre-decision, since deletes only run after a fully-written marker.
    hfs.create(new Path(s"$table/.fold_commit"), true).close()
    IndexCompaction.recover(spark, table) // must not throw
    assert(!hfs.exists(new Path(s"$table/.fold_tmp")), "tmp must roll back")
    assert(!hfs.exists(new Path(s"$table/.fold_commit")),
      "the unreadable marker must be cleared, not left to wedge every verb")
    assert(batchDirCount(table) == 3 && spark.read.parquet(table).count() == 3,
      "original batch dirs must be untouched by the rollback")
    // And recovery is idempotent + a subsequent real fold still works.
    IndexCompaction.recover(spark, table)
    val rep = IndexCompaction.foldBatches(spark, table, 2L)
    assert(rep.dirsAfter == 1 && spark.read.parquet(table).count() == 3)
  }

  test("marker truncated to a numeric prefix REFUSES (never installs tmp " +
    "under the wrong partition, never discards a pre-upgrade commit) — " +
    "r12+r13 advice") {
    // 13 batch dirs, fold through 12 crashes mid-marker-write leaving
    // '1' (a numeric prefix of '12;'). Rolling FORWARD would install
    // tmp (folded through 12) as batch=1 beside the live dirs 2..12 —
    // double count. Rolling BACK silently is no better: the same bytes
    // are what a COMPLETE pre-upgrade (unterminated-format) marker looks
    // like, where some old dirs may already be deleted and tmp holds the
    // only copy — rollback is data loss. The only safe move is to refuse
    // with the discriminating instructions and touch NOTHING.
    val table = tmpDir("fold-crash-prefix") + "/t"
    (0 until 13).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$table/batch=$i")
    }
    val hfs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet((0 until 13).map(i => s"$table/batch=$i"): _*)
      .repartition(1).write.parquet(s"$table/.fold_tmp")
    val out = hfs.create(new Path(s"$table/.fold_commit"), true)
    out.write("1".getBytes("UTF-8")); out.close() // truncated from "12;"
    val err = intercept[RuntimeException] { IndexCompaction.recover(spark, table) }
    assert(err.getMessage.contains("ambiguous"), err.getMessage)
    assert(hfs.exists(new Path(s"$table/.fold_tmp")),
      "refusal must not delete tmp (it may be the only copy)")
    assert(hfs.exists(new Path(s"$table/.fold_commit")))
    assert(batchDirCount(table) == 13, "original dirs must be untouched")
    // Operator path A (this scenario: every batch<=1 dir present ⇒ the
    // fold never committed): drop marker + tmp, then fold normally.
    hfs.delete(new Path(s"$table/.fold_commit"), false)
    hfs.delete(new Path(s"$table/.fold_tmp"), true)
    val rep = IndexCompaction.foldBatches(spark, table, 12L)
    assert(rep.dirsAfter == 1 && spark.read.parquet(table).count() == 13)
  }

  test("pre-upgrade COMPLETE (unterminated) marker after partial deletes: " +
    "refuse preserves tmp; rewriting the terminated marker rolls forward " +
    "losslessly (r13 advice)") {
    // The other side of the ambiguity: an old binary wrote marker '12'
    // (no ';'), deleted dirs 0..5, then died. tmp holds the ONLY copy of
    // those rows. The old recover() would have finished the fold; the
    // terminator-required parser must NOT silently roll back (that
    // deletes tmp → permanent row loss). It refuses; the operator
    // follows the message — some batch<=12 dirs are missing ⇒ the fold
    // DID commit ⇒ rewrite the marker terminated — and recovery then
    // completes the fold with all 13 rows.
    val table = tmpDir("fold-crash-preupgrade") + "/t"
    (0 until 13).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$table/batch=$i")
    }
    val hfs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet((0 until 13).map(i => s"$table/batch=$i"): _*)
      .repartition(1).write.parquet(s"$table/.fold_tmp")
    (0 until 6).foreach(i => hfs.delete(new Path(s"$table/batch=$i"), true))
    val out = hfs.create(new Path(s"$table/.fold_commit"), true)
    out.write("12".getBytes("UTF-8")); out.close() // old format: no ';'
    val err = intercept[RuntimeException] { IndexCompaction.recover(spark, table) }
    assert(err.getMessage.contains("ambiguous"), err.getMessage)
    assert(hfs.exists(new Path(s"$table/.fold_tmp")),
      "tmp holds the only copy of batches 0..5 — refusal must keep it")
    val fixed = hfs.create(new Path(s"$table/.fold_commit"), true)
    fixed.write("12;".getBytes("UTF-8")); fixed.close()
    IndexCompaction.recover(spark, table)
    assert(batchDirCount(table) == 1, "roll-forward must consolidate")
    assert(spark.read.parquet(table).count() == 13, "no row lost")
  }
}
