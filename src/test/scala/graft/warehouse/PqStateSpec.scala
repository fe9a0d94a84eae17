package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental PQ ANN state: many-batch ingestion with periodic
  * codebook retraining must answer exactly like brute force when the
  * shortlist spans the corpus (removing the ADC approximation leaves
  * the state machinery under test — the IvfStateSpec nprobe=all
  * analogue), replay must short-circuit across a retrain, folded deltas
  * must collapse, and fresh batches must be searchable immediately.
  */
class PqStateSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def deltaDirCount(root: String): Int = {
    val p = new Path(s"$root/deltas")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(p)) 0
    else hfs.listStatus(p).count(_.getPath.getName.startsWith("batch="))
  }

  private def key(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
      (r.getLong(1), r.getAs[Double]("score_r"))).toMap

  test("20-batch ingest + mid-stream retrain answers exactly like brute " +
    "force at corpus-wide shortlist; replay short-circuits; dirs collapse") {
    val n = 20
    val root = tmpDir("pqstate") + "/state"
    val queries = emb.filter(col("vec_id") < 6)
    (0 until n).foreach { i =>
      PqState.update(spark, root, emb.filter(col("vec_id") % n === i))
      if (i == 12) PqState.retrain(spark, root, m = 8, ksub = 8)
    }
    assert(deltaDirCount(root) == 7,
      s"folded deltas must be reclaimed: ${deltaDirCount(root)} dirs")
    // Corpus-wide shortlist removes the ADC approximation entirely.
    val got = key(PqState.search(spark, root, queries, k = 5, shortlist = 600))
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 5))
    assert(got.nonEmpty && got == want,
      s"state search must equal brute force: got=${got.size} want=${want.size}")
    // Committed replay of a FOLDED batch id ingests nothing.
    PqState.update(spark, root,
      Seq((999999L, Seq.fill(4)(9.9))).toDF("vec_id", "embedding"),
      batchId = Some(3L))
    assert(key(PqState.search(spark, root, queries, k = 5, shortlist = 600)) == want,
      "committed replay must not ingest")
    // A genuinely new batch is searchable immediately (raw tail).
    PqState.update(spark, root, emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding")))
    val after = PqState.search(spark, root, queries, k = 5, shortlist = 600)
      .filter(col("query_id") === 0 && col("rank") === 1).collect().head
    assert(after.getLong(1) == 500000L,
      s"a fresh identical-vector batch must rank first: $after")
  }

  test("empty committed epochs neither break retrain nor leak into search") {
    val root = tmpDir("pqstate-empty") + "/state"
    PqState.update(spark, root, emb.filter(lit(false))) // idle epoch commits
    PqState.retrain(spark, root, m = 8, ksub = 8) // all-empty fold: no-op
    PqState.update(spark, root, emb.filter(col("vec_id") < 150))
    PqState.retrain(spark, root, m = 8, ksub = 8)
    PqState.update(spark, root, emb.filter(lit(false))) // idle tail tick
    val queries = emb.filter(col("vec_id") < 3)
    val got = key(PqState.search(spark, root, queries, k = 3, shortlist = 200))
    val want = key(graft.analytics.Similarity.bruteForceKnn(
      emb.filter(col("vec_id") < 150), queries, k = 3))
    assert(got == want, "empty epochs must be invisible to results")
  }

  test("retrain no-ops on empty and already-folded state; staging residue " +
    "is discarded; tail-only search is exact") {
    val root = tmpDir("pqstate-crash") + "/state"
    PqState.retrain(spark, root) // no state: must not throw
    (0 until 2).foreach { i =>
      PqState.update(spark, root, emb.filter(col("vec_id") % 2 === i))
    }
    val queries = emb.filter(col("vec_id") < 4)
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 3))
    // Bundle-less search serves exactly from the raw tail.
    assert(key(PqState.search(spark, root, queries, k = 3, shortlist = 10)) == want)
    PqState.retrain(spark, root, m = 8, ksub = 8)
    PqState.retrain(spark, root, m = 8, ksub = 8) // already folded: no-op
    // Junk staging from a dead retrain is invisible to reads.
    Seq((1L, Seq(1.0))).toDF("vec_id", "embedding")
      .write.parquet(s"$root/.staging_bundle/index")
    assert(key(PqState.search(spark, root, queries, k = 3, shortlist = 600)) == want)
  }

  test("search serves a crashed swap's .bak without mutating (r13 advice)") {
    val root = tmpDir("pqstate-bak") + "/state"
    val queries = emb.filter(col("vec_id") < 5)
    (0 until 4).foreach { i =>
      PqState.update(spark, root, emb.filter(col("vec_id") % 4 === i))
      if (i == 2) PqState.retrain(spark, root, m = 8, ksub = 8)
    }
    val want = key(PqState.search(spark, root, queries, k = 4, shortlist = 600))
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.rename(new org.apache.hadoop.fs.Path(s"$root/bundle"),
      new org.apache.hadoop.fs.Path(s"$root/.bak_bundle")))
    val got = key(PqState.search(spark, root, queries, k = 4, shortlist = 600))
    assert(got == want, "search must serve the .bak bundle transparently")
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$root/bundle")) &&
      hfs.exists(new org.apache.hadoop.fs.Path(s"$root/.bak_bundle")),
      "the read path must not perform the bak->bundle rename")
    PqState.retrain(spark, root, m = 8, ksub = 8)
    assert(hfs.exists(new org.apache.hadoop.fs.Path(s"$root/bundle")) &&
      !hfs.exists(new org.apache.hadoop.fs.Path(s"$root/.bak_bundle")))
    assert(key(PqState.search(spark, root, queries, k = 4, shortlist = 600)) == want)
  }
}
