package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental IVF ANN state (r12 verdict item 8): many-batch ingestion
  * with periodic re-clustering must answer EXACTLY like a one-shot
  * brute-force search when every cell is probed (nprobe = k removes the
  * approximation, leaving only the state machinery under test), the
  * committed-replay short-circuit must hold across a recluster, folded
  * delta dirs must collapse, and crash residue must be ignored.
  */
class IvfStateSpec extends SparkSpec {
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

  test("50-batch ingest + periodic recluster answers exactly like " +
    "brute force at nprobe=all; replay short-circuits; dirs collapse") {
    val n = 50
    val root = tmpDir("ivfstate") + "/state"
    val queries = emb.filter(col("vec_id") < 8)
    (0 until n).foreach { i =>
      IvfState.update(spark, root, emb.filter(col("vec_id") % n === i))
      if (i == 20 || i == 40) IvfState.recluster(spark, root, k = Some(8))
    }
    // Tail = batches 41..49; bundle covers 0..40. 9 tail delta dirs.
    assert(deltaDirCount(root) == 9,
      s"folded deltas must be reclaimed: ${deltaDirCount(root)} dirs")
    // nprobe >= k cells probes everything: the answer is the exact kNN.
    val got = key(IvfState.search(spark, root, queries, k = 5, nprobe = 8))
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 5))
    assert(got.nonEmpty && got == want,
      s"state search must equal brute force: got=${got.size} want=${want.size}")
    // Committed replay: re-offering an already-committed batch id (one
    // that was FOLDED by the recluster) ingests nothing — the garbage
    // frame never lands, the search answer is unchanged.
    IvfState.update(spark, root,
      Seq((999999L, Seq.fill(4)(9.9))).toDF("vec_id", "embedding"),
      batchId = Some(5L))
    assert(key(IvfState.search(spark, root, queries, k = 5, nprobe = 8)) == want,
      "committed replay must not ingest")
    // Ingestion continues cleanly after everything: a genuinely new
    // batch lands in the tail and is immediately searchable (the
    // memtable face — no recluster needed to see it).
    val probe = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    IvfState.update(spark, root, probe)
    val after = IvfState.search(spark, root, queries, k = 5, nprobe = 8)
      .filter(col("query_id") === 0 && col("rank") === 1).collect().head
    assert(after.getLong(1) == 500000L,
      s"a fresh identical-vector batch must rank first: $after")
  }

  test("recluster is a no-op on an empty state and on an already-folded " +
    "state; crash residue in .staging_bundle is discarded") {
    val root = tmpDir("ivfstate-crash") + "/state"
    IvfState.recluster(spark, root) // no state: must not throw
    IvfState.update(spark, root, emb.filter(col("vec_id") < 100))
    IvfState.recluster(spark, root, k = Some(4))
    val base = key(IvfState.search(spark, root,
      emb.filter(col("vec_id") < 4), k = 3, nprobe = 4))
    // Already folded: a second recluster with nothing new is a no-op.
    IvfState.recluster(spark, root, k = Some(4))
    // Crash residue: a junk staging dir from a dead recluster must be
    // ignored by reads and replaced by the next recluster.
    Seq((1L, Seq(1.0))).toDF("vec_id", "embedding")
      .write.parquet(s"$root/.staging_bundle/index")
    assert(key(IvfState.search(spark, root,
      emb.filter(col("vec_id") < 4), k = 3, nprobe = 4)) == base)
    IvfState.update(spark, root,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 120))
    IvfState.recluster(spark, root, k = Some(4))
    val again = IvfState.search(spark, root,
      emb.filter(col("vec_id") < 4), k = 3, nprobe = 4)
    assert(again.count() == 12, "post-residue recluster must serve searches")
  }

  test("empty committed epochs (idle streaming ticks) neither break " +
    "recluster nor leak into search") {
    val root = tmpDir("ivfstate-empty") + "/state"
    // Epoch 0 is EMPTY — the idle-foreachBatch shape — and must commit.
    IvfState.update(spark, root, emb.filter(lit(false)))
    // Recluster over an all-empty corpus is a no-op, not a crash.
    IvfState.recluster(spark, root, k = Some(4))
    // Real data afterwards: both verbs work and answers are exact.
    IvfState.update(spark, root, emb.filter(col("vec_id") < 150))
    IvfState.recluster(spark, root, k = Some(4))
    IvfState.update(spark, root, emb.filter(lit(false))) // idle tail tick
    val queries = emb.filter(col("vec_id") < 3)
    val got = key(IvfState.search(spark, root, queries, k = 3, nprobe = 4))
    val want = key(graft.analytics.Similarity.bruteForceKnn(
      emb.filter(col("vec_id") < 150), queries, k = 3))
    assert(got == want, "empty epochs must be invisible to results")
  }

  test("search before any recluster serves from deltas alone (exact)") {
    val root = tmpDir("ivfstate-tail") + "/state"
    (0 until 3).foreach { i =>
      IvfState.update(spark, root, emb.filter(col("vec_id") % 3 === i))
    }
    val queries = emb.filter(col("vec_id") < 5)
    val got = key(IvfState.search(spark, root, queries, k = 4, nprobe = 1))
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 4))
    assert(got == want, "bundle-less search is brute force over the tail")
  }

  test("search serves a crashed swap's .bak WITHOUT the bak->bundle " +
    "rename (r13 advice: reader-side recovery must not mutate)") {
    val root = tmpDir("ivfstate-bak") + "/state"
    val queries = emb.filter(col("vec_id") < 5)
    (0 until 4).foreach { i =>
      IvfState.update(spark, root, emb.filter(col("vec_id") % 4 === i))
      if (i == 2) IvfState.recluster(spark, root, k = Some(8))
    }
    val want = key(IvfState.search(spark, root, queries, k = 4, nprobe = 8))
    // Simulate a recluster crash between its two swap renames: the old
    // bundle sits at .bak_bundle, bundle/ is missing, and (per the swap
    // order) the folded delta dirs are still present.
    val hfs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.rename(new Path(s"$root/bundle"), new Path(s"$root/.bak_bundle")))
    val got = key(IvfState.search(spark, root, queries, k = 4, nprobe = 8))
    assert(got == want, "search must serve the .bak bundle transparently")
    assert(!hfs.exists(new Path(s"$root/bundle")) &&
      hfs.exists(new Path(s"$root/.bak_bundle")),
      "the read path must NOT perform the bak->bundle rename — that is " +
        "reserved for the locked verbs")
    // The next LOCKED verb performs the recovery rename and proceeds.
    IvfState.recluster(spark, root, k = Some(8))
    assert(hfs.exists(new Path(s"$root/bundle")) &&
      !hfs.exists(new Path(s"$root/.bak_bundle")))
    assert(key(IvfState.search(spark, root, queries, k = 4, nprobe = 8)) == want)
  }
}
