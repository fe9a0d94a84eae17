package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental IVF-SQ8 state: many-batch ingestion with periodic coarse
  * reclustering must answer exactly like brute force when nprobe spans
  * all cells and the shortlist spans the corpus (removing both
  * approximations leaves the state machinery under test — the
  * IvfStateSpec/PqStateSpec discipline), replay must short-circuit,
  * folded deltas must collapse, fresh batches must be searchable
  * immediately — and, the face this state exists to prove: RECLUSTER
  * NEVER RE-ENCODES. Codes are per-vector (no codebook in the code
  * path), so they are computed once at ingest and carried verbatim
  * through every cell reassignment; the tamper test below plants a
  * sentinel code array in a committed delta and watches it survive two
  * recluster generations byte-for-byte — a re-encoding recluster (the
  * PqState shape) would silently restore the true codes.
  */
class SqStateSpec extends SparkSpec {
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
    "force at nprobe=all + corpus-wide shortlist; replay short-circuits; " +
    "dirs collapse") {
    val n = 20
    val root = tmpDir("sqstate") + "/state"
    val queries = emb.filter(col("vec_id") < 6)
    (0 until n).foreach { i =>
      SqState.update(spark, root, emb.filter(col("vec_id") % n === i))
      if (i == 12) SqState.recluster(spark, root, k = Some(8))
    }
    assert(deltaDirCount(root) == 7,
      s"folded deltas must be reclaimed: ${deltaDirCount(root)} dirs")
    // nprobe = all cells + corpus-wide shortlist removes both the probe
    // and the SQ8 shortlist approximation entirely.
    val got = key(SqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600))
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 5))
    assert(got.nonEmpty && got == want,
      s"state search must equal brute force: got=${got.size} want=${want.size}")
    // Committed replay of a FOLDED batch id ingests nothing.
    SqState.update(spark, root,
      Seq((999999L, Seq.fill(4)(9.9))).toDF("vec_id", "embedding"),
      batchId = Some(3L))
    assert(key(SqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == want,
      "committed replay must not ingest")
    // A genuinely new batch is searchable immediately (encoded tail).
    SqState.update(spark, root, emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding")))
    val after = SqState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)
      .filter(col("query_id") === 0 && col("rank") === 1).collect().head
    assert(after.getLong(1) == 500000L,
      s"a fresh identical-vector batch must rank first: $after")
  }

  test("recluster carries committed codes VERBATIM: a tampered sentinel " +
    "survives two generations while cells move (no re-encode)") {
    val root = tmpDir("sqstate-tamper") + "/state"
    val victim = 7L
    (0 until 2).foreach { i =>
      SqState.update(spark, root, emb.filter(col("vec_id") % 2 === i))
    }
    // Plant the sentinel: overwrite the victim's committed codes with
    // all-42 inside its delta file (length-preserving, schema untouched).
    val batchDir = s"$root/deltas/batch=1" // vec_id 7 is odd -> batch 1
    val pinned = spark.read.parquet(batchDir).localCheckpoint(eager = true)
    assert(pinned.filter(col("vec_id") === victim).count() == 1)
    pinned.withColumn("codes",
        when(col("vec_id") === victim,
          transform(col("codes"), _ => lit(42).cast("byte")).cast("array<tinyint>"))
          .otherwise(col("codes")))
      .write.mode("overwrite").parquet(batchDir)
    def bundleRow(gen: String) = {
      val r = spark.read.parquet(s"$root/bundle/index")
        .filter(col("vec_id") === victim)
        .select(col("cell"), col("codes"), col("embedding")).collect()
      assert(r.length == 1, s"$gen: victim must appear once")
      r.head
    }
    SqState.recluster(spark, root, k = Some(4))
    val g1 = bundleRow("gen1")
    val codes1 = g1.getSeq[Byte](1)
    assert(codes1.nonEmpty && codes1.forall(_ == 42.toByte),
      s"gen1 bundle must carry the tampered codes verbatim: $codes1")
    // The sentinel is discriminating: a re-encode would have produced
    // the TRUE codes, which differ from all-42.
    val trueCodes = graft.analytics.SqIndex.encode(
        Seq(Tuple1(g1.getSeq[Double](2))).toDF("embedding"), "embedding")
      .select("codes").collect().head.getSeq[Byte](0)
    assert(trueCodes != codes1, "fixture defect: true codes equal the sentinel")
    // Second generation at a DIFFERENT k: rows move between cells, codes
    // still ride untouched.
    SqState.update(spark, root, emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 600000L).as("vec_id"), col("embedding")))
    SqState.recluster(spark, root, k = Some(9))
    val g2 = bundleRow("gen2")
    assert(g2.getSeq[Byte](1) == codes1,
      s"gen2 recluster must not re-encode: ${g2.getSeq[Byte](1)}")
    val cells2 = spark.read.parquet(s"$root/bundle/index")
      .select("cell").distinct().count()
    assert(cells2 > 4, s"k=9 recluster must spread beyond gen1's 4 cells: $cells2")
  }

  test("search before any recluster serves from the encoded tail alone " +
    "(exact); empty committed epochs are invisible") {
    val root = tmpDir("sqstate-tail") + "/state"
    SqState.update(spark, root, emb.filter(lit(false))) // idle epoch commits
    SqState.recluster(spark, root, k = Some(4)) // all-empty fold: no-op
    SqState.update(spark, root, emb.filter(col("vec_id") < 150))
    val queries = emb.filter(col("vec_id") < 3)
    val want = key(graft.analytics.Similarity.bruteForceKnn(
      emb.filter(col("vec_id") < 150), queries, k = 3))
    assert(key(SqState.search(spark, root, queries, k = 3,
      nprobe = 4, shortlist = 200)) == want,
      "bundle-less search is exact brute force over the tail")
    SqState.recluster(spark, root, k = Some(4))
    SqState.update(spark, root, emb.filter(lit(false))) // idle tail tick
    assert(key(SqState.search(spark, root, queries, k = 3,
      nprobe = 4, shortlist = 200)) == want,
      "empty epochs must be invisible to results")
  }

  test("recluster no-ops on empty and already-folded state; staging " +
    "residue is discarded") {
    val root = tmpDir("sqstate-crash") + "/state"
    SqState.recluster(spark, root) // no state: must not throw
    (0 until 2).foreach { i =>
      SqState.update(spark, root, emb.filter(col("vec_id") % 2 === i))
    }
    val queries = emb.filter(col("vec_id") < 4)
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 3))
    SqState.recluster(spark, root, k = Some(8))
    SqState.recluster(spark, root, k = Some(8)) // already folded: no-op
    // Junk staging from a dead recluster is invisible to reads.
    Seq((1L, Seq(1.0))).toDF("vec_id", "embedding")
      .write.parquet(s"$root/.staging_bundle/index")
    assert(key(SqState.search(spark, root, queries, k = 3,
      nprobe = 8, shortlist = 600)) == want)
  }

  test("search serves a crashed swap's .bak without mutating (r13 advice)") {
    val root = tmpDir("sqstate-bak") + "/state"
    val queries = emb.filter(col("vec_id") < 5)
    (0 until 4).foreach { i =>
      SqState.update(spark, root, emb.filter(col("vec_id") % 4 === i))
      if (i == 2) SqState.recluster(spark, root, k = Some(8))
    }
    val want = key(SqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600))
    val hfs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.rename(new Path(s"$root/bundle"), new Path(s"$root/.bak_bundle")))
    assert(key(SqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "search must serve the .bak bundle transparently")
    assert(!hfs.exists(new Path(s"$root/bundle")) &&
      hfs.exists(new Path(s"$root/.bak_bundle")),
      "the read path must not perform the bak->bundle rename")
    SqState.recluster(spark, root, k = Some(8))
    assert(hfs.exists(new Path(s"$root/bundle")) &&
      !hfs.exists(new Path(s"$root/.bak_bundle")))
    assert(key(SqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want)
  }
}
