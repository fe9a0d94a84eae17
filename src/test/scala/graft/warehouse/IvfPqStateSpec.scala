package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental IVF-PQ state (the q238 composite under the q234/q236
  * protocol): many-batch ingestion with mid-stream reclustering must
  * answer EXACTLY like one-shot brute force when every cell is probed
  * and the shortlist covers the corpus (removing both approximations
  * leaves only the state machinery under test); replays short-circuit;
  * folded delta dirs collapse; probes prune cell dirs; the read path
  * serves a crashed swap's .bak without mutating.
  */
class IvfPqStateSpec extends SparkSpec {
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

  test("20-batch ingest + periodic recluster answers exactly like brute " +
    "force at nprobe=all cells + corpus-wide shortlist; replay " +
    "short-circuits; dirs collapse") {
    val n = 20
    val root = tmpDir("ivfpqstate") + "/state"
    val queries = emb.filter(col("vec_id") < 8)
    (0 until n).foreach { i =>
      IvfPqState.update(spark, root, emb.filter(col("vec_id") % n === i))
      if (i == 8 || i == 15) IvfPqState.recluster(spark, root, kCells = Some(8))
    }
    // Tail = batches 16..19; bundle covers 0..15. 4 tail delta dirs.
    assert(deltaDirCount(root) == 4,
      s"folded deltas must be reclaimed: ${deltaDirCount(root)} dirs")
    val got = key(IvfPqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600))
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 5))
    assert(got.nonEmpty && got == want,
      s"state search must equal brute force: got=${got.size} want=${want.size}")
    // Committed replay with DIFFERENT content (a folded id) is a no-op.
    IvfPqState.update(spark, root,
      emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 800000L).as("vec_id"), col("embedding")),
      batchId = Some(2L))
    assert(key(IvfPqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == want,
      "a committed replay must not re-ingest")
  }

  test("bundle search scans only probed cell dirs; tail-only search is " +
    "exact before any recluster") {
    val root = tmpDir("ivfpqstate-prune") + "/state"
    val queries = emb.filter(col("vec_id") === 0)
    // Tail-only face first (no bundle yet): exact brute force.
    (0 until 3).foreach { i =>
      IvfPqState.update(spark, root, emb.filter(col("vec_id") % 3 === i))
    }
    val want4 = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 4))
    assert(key(IvfPqState.search(spark, root, queries, k = 4,
      nprobe = 1, shortlist = 600)) == want4,
      "bundle-less search is brute force over the tail")
    // Recluster, then audit the probe's file footprint via the pruned
    // scan shape: nprobe=2 of 8 cells must list ≤ 2 cell dirs.
    IvfPqState.recluster(spark, root, kCells = Some(8))
    val idx = s"$root/bundle/index"
    val cellDirs = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.length >= 4, s"expected a spread index, got ${cellDirs.toSeq}")
    val model = graft.analytics.IvfPq.loadModel(spark, s"$root/bundle/model")
    val (_, probed) = graft.analytics.IvfPq.lutFrame(spark, model,
      queries.select(col("vec_id"), col("embedding")), 2, "vec_id", "embedding")
    assert(probed.length <= 2, s"nprobe=2 must probe <= 2 cells: $probed")
    val scanned = spark.read.parquet(idx)
      .filter(col("cell").isin(probed: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .map(f => f.split("/").find(_.startsWith("cell=")).get).distinct
    assert(scanned.length <= 2,
      s"probe must scan <= 2 of ${cellDirs.length} cell dirs: ${scanned.toSeq}")
  }

  test("search serves a crashed swap's .bak without mutating; the next " +
    "locked verb recovers (r13 advice discipline)") {
    val root = tmpDir("ivfpqstate-bak") + "/state"
    val queries = emb.filter(col("vec_id") < 5)
    (0 until 4).foreach { i =>
      IvfPqState.update(spark, root, emb.filter(col("vec_id") % 4 === i))
      if (i == 2) IvfPqState.recluster(spark, root, kCells = Some(8))
    }
    val want = key(IvfPqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600))
    val hfs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.rename(new Path(s"$root/bundle"), new Path(s"$root/.bak_bundle")))
    assert(key(IvfPqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "search must serve the .bak bundle transparently")
    assert(!hfs.exists(new Path(s"$root/bundle")) &&
      hfs.exists(new Path(s"$root/.bak_bundle")),
      "the read path must not perform the bak->bundle rename")
    IvfPqState.recluster(spark, root, kCells = Some(8))
    assert(hfs.exists(new Path(s"$root/bundle")) &&
      !hfs.exists(new Path(s"$root/.bak_bundle")))
    assert(key(IvfPqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want)
  }

  test("recluster no-ops on empty and already-folded state; empty " +
    "committed epochs neither break recluster nor leak into search") {
    val root = tmpDir("ivfpqstate-empty") + "/state"
    IvfPqState.recluster(spark, root) // empty state: no-op
    IvfPqState.update(spark, root, emb.filter(col("vec_id") % 2 === 0))
    IvfPqState.update(spark, root, emb.filter(lit(false))) // idle epoch
    IvfPqState.update(spark, root, emb.filter(col("vec_id") % 2 === 1))
    IvfPqState.recluster(spark, root, kCells = Some(8))
    IvfPqState.recluster(spark, root, kCells = Some(8)) // already folded: no-op
    val queries = emb.filter(col("vec_id") < 5)
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 4))
    assert(key(IvfPqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want)
  }
}
