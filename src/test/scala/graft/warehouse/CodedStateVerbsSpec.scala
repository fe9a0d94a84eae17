package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r18 verbs of the encode-once state core, exercised through the
  * SQ8 and binary faces: tombstone DELETION (a deleted id never
  * surfaces pre- OR post-compaction; replayed epochs are idempotent; a
  * later re-ingest resurfaces the id), metadata-FILTERED search (zero
  * stratum leakage, per-stratum brute parity across bundle AND tail),
  * and the PINNED state metadata (attr columns fixed at creation;
  * BitState's plane-matrix dimension fixed at first non-empty ingest —
  * a later dim-mismatched batch or query fails LOUDLY instead of
  * re-probing a different matrix or silently dropping rows, the r17
  * ADVICE finding).
  */
class CodedStateVerbsSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def key(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
      (r.getLong(1), r.getAs[Double]("score_r"))).toMap

  test("delete hides bundle AND tail victims immediately; compaction " +
    "purges the tombstones and the ids stay hidden after it") {
    val root = tmpDir("codedstate-del") + "/state"
    val queries = emb.filter(col("vec_id") < 4)
    (0 until 3).foreach { i =>
      SqState.update(spark, root, emb.filter(col("vec_id") % 3 === i))
      if (i == 1) SqState.recluster(spark, root, k = Some(8))
    }
    // vec 6 (%3=0) was folded into the bundle; vec 5 (%3=2) is tail.
    SqState.delete(spark, root, Seq(6L, 5L).toDF("vec_id"))
    val hfs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.exists(new Path(s"$root/deletes/batch=3")),
      "the tombstone epoch must be committed under deletes/")
    val want = key(graft.analytics.Similarity.bruteForceKnn(
      emb.filter(!col("vec_id").isin(5L, 6L)), queries, k = 5))
    val pre = key(SqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600))
    assert(pre == want, "live tombstones must hide both victims exactly")
    assert(!pre.values.exists { case (id, _) => id == 5L || id == 6L })
    // Compaction applies and PURGES the tombstones; results unchanged.
    SqState.recluster(spark, root, k = Some(8))
    assert(!hfs.exists(new Path(s"$root/deletes")),
      "applied tombstone epochs must be purged with the fold")
    assert(spark.read.parquet(s"$root/bundle/index")
      .filter(col("vec_id").isin(5L, 6L)).count() == 0,
      "deleted rows must not enter the new bundle")
    assert(key(SqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == want,
      "post-compaction results must match the pre-compaction ones")
  }

  test("replayed delete epochs are idempotent; a later re-ingest " +
    "resurfaces the id") {
    val root = tmpDir("codedstate-replay") + "/state"
    val queries = emb.filter(col("vec_id") < 4)
    (0 until 2).foreach { i =>
      SqState.update(spark, root, emb.filter(col("vec_id") % 2 === i))
    }
    SqState.delete(spark, root, Seq(7L).toDF("vec_id")) // epoch 2
    val want = key(graft.analytics.Similarity.bruteForceKnn(
      emb.filter(col("vec_id") =!= 7L), queries, k = 5))
    assert(key(SqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == want)
    // Replay of the committed epoch with a DIFFERENT payload: must be a
    // no-op (the exactly-once marker), so vec 9 stays live.
    SqState.delete(spark, root, Seq(9L).toDF("vec_id"), batchId = Some(2L))
    assert(key(SqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == want,
      "a replayed delete epoch must not delete anything new")
    // Re-ingesting the deleted id in a LATER batch resurfaces it: batch
    // order totally orders deletes against ingests.
    SqState.update(spark, root, emb.filter(col("vec_id") === 7L))
    val wantBack = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 5))
    assert(key(SqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == wantBack,
      "a re-ingest after the tombstone must resurface the id")
  }

  test("filtered state search: per-stratum brute parity and zero " +
    "leakage across bundle and tail") {
    val root = tmpDir("codedstate-filter") + "/state"
    val labeled = emb.withColumn("label", col("vec_id") % 3)
    (0 until 2).foreach { i =>
      SqState.update(spark, root, labeled.filter(col("vec_id") % 2 === i),
        attrCols = Seq("label"))
      if (i == 0) SqState.recluster(spark, root, k = Some(8))
    }
    val queries = labeled.filter(col("vec_id") < 6)
    val got = SqState.search(spark, root, queries, k = 3,
      nprobe = 8, shortlist = 600, filterCol = Some("label"))
      .localCheckpoint(eager = true)
    // Zero leakage: every neighbor shares its query's label.
    val lab = labeled.select(col("vec_id"), col("label"))
    val leaks = got
      .join(lab.select(col("vec_id").as("query_id"), col("label").as("ql")), "query_id")
      .join(lab.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
      .filter(col("ql") =!= col("nl")).count()
    assert(leaks == 0, s"$leaks cross-stratum neighbors leaked")
    // Per-stratum brute parity at nprobe=all + corpus-wide shortlist.
    val want = (0 until 3).map { l =>
      graft.analytics.Similarity.bruteForceKnn(
        labeled.filter(col("label") === l),
        queries.filter(col("label") === l), k = 3)
    }.reduce(_ unionByName _)
    assert(key(got) == key(want),
      "filtered state search must equal per-stratum brute force")
  }

  test("attr columns are pinned at creation; contradicting them or " +
    "filtering on an undeclared column fails loudly") {
    val root = tmpDir("codedstate-pin") + "/state"
    val labeled = emb.withColumn("label", col("vec_id") % 3)
    SqState.update(spark, root, labeled.filter(col("vec_id") < 50),
      attrCols = Seq("label"))
    val e1 = intercept[RuntimeException] {
      SqState.update(spark, root, labeled.filter(col("vec_id") >= 50),
        attrCols = Seq("other"))
    }
    assert(e1.getMessage.contains("fixed at state creation"), e1.getMessage)
    // Omitting attrCols uses the pinned set (the friendly path).
    SqState.update(spark, root, labeled.filter(col("vec_id") >= 50))
    assert(spark.read.parquet(s"$root/deltas").columns.contains("label"),
      "later batches must carry the pinned attr columns")
    val e2 = intercept[RuntimeException] {
      SqState.search(spark, root, labeled.filter(col("vec_id") < 3),
        k = 3, filterCol = Some("nope"))
    }
    assert(e2.getMessage.contains("pinned attribute columns"), e2.getMessage)
  }

  test("BitState pins the plane-matrix dim at first non-empty ingest: " +
    "a dim-mismatched later batch or query fails loudly (r17 ADVICE)") {
    val root = tmpDir("bitstate-dim") + "/state"
    def vecs(dim: Int, ids: Range) =
      ids.map(i => (i.toLong, Seq.tabulate(dim)(j => math.sin(i * 31 + j).toDouble)))
        .toDF("vec_id", "embedding")
    BitState.update(spark, root, vecs(8, 0 until 40))
    // A whole batch at a different dim: loudly rejected, not re-probed.
    val e1 = intercept[Exception] {
      BitState.update(spark, root, vecs(12, 100 until 120))
    }
    assert(e1.getMessage != null && e1.getMessage.contains("pinned dim"),
      s"expected a pinned-dim failure, got: ${e1.getMessage}")
    // A single ragged row inside a conforming batch: loud, never dropped.
    val ragged = vecs(8, 200 until 210)
      .unionByName(vecs(5, 300 until 301))
    val e2 = intercept[Exception] { BitState.update(spark, root, ragged) }
    assert(e2.getMessage != null && e2.getMessage.contains("pinned dim"),
      s"expected a pinned-dim failure, got: ${e2.getMessage}")
    // The failed batches must not have committed: the marker still sits
    // at the first epoch and a conforming ingest continues from there.
    BitState.update(spark, root, vecs(8, 40 until 60))
    BitState.recluster(spark, root, k = Some(4))
    // Queries at the wrong dim hit the same wall at the bundle probe.
    val e3 = intercept[Exception] {
      BitState.search(spark, root, vecs(12, 0 until 3), k = 3,
        nprobe = 4, shortlist = 100).collect()
    }
    assert(e3.getMessage != null && e3.getMessage.contains("pinned dim"),
      s"expected a pinned-dim failure, got: ${e3.getMessage}")
    // Conforming queries answer exactly.
    val got = key(BitState.search(spark, root, vecs(8, 0 until 3), k = 3,
      nprobe = 4, shortlist = 200))
    val want = key(graft.analytics.Similarity.bruteForceKnn(
      vecs(8, 0 until 60), vecs(8, 0 until 3), k = 3))
    assert(got == want, "pinned-dim state must still answer exactly")
  }
}
