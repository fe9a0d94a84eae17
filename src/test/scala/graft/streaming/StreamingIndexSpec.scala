package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.warehouse.{DedupIndex, RetrievalIndex}

/** Streaming index ingestion: a real availableNow file stream drained
  * through foreachBatch equals the one-shot builds exactly, and the
  * epoch-keyed commit protocol makes replays no-ops.
  */
class StreamingIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  /** Stage `parts` as one NDJSON file each under a watch dir with
    * strictly increasing mtimes (oldest-first source order).
    */
  private def stageFiles(parts: Seq[org.apache.spark.sql.DataFrame],
                         watch: String): Unit =
    parts.zipWithIndex.foreach { case (p, i) =>
      val stage = tmpDir("sidx-stage")
      p.coalesce(1).write.mode("overwrite").json(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".json")).get
      val target = Paths.get(watch, f"$i%04d.json")
      Files.move(Paths.get(part), target, StandardCopyOption.ATOMIC_MOVE)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 10000))
    }

  test("file-streamed retrieval index ranks identically to the one-shot ranker") {
    val watch = tmpDir("sidx-src")
    val root = tmpDir("sidx-root") + "/idx"
    val ckpt = tmpDir("sidx-ckpt")
    val small = docs.filter(col("doc_id") < 200)
      .select("doc_id", "text")
    stageFiles(Seq(
      small.filter(col("doc_id") < 70),
      small.filter(col("doc_id") >= 70 && col("doc_id") < 140),
      small.filter(col("doc_id") >= 140)), watch)
    StreamingIndex.retrievalAvailableNow(spark, watch, small.schema, root, ckpt)
    val queries = graft.analytics.Retrieval.BenchQueries.toDF("query_id", "query_text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score_unats"))).toMap
    val streamed = key(RetrievalIndex.rank(spark, root, queries, k = 5))
    val oneShot = key(graft.analytics.Retrieval.bm25Rank(small, queries, k = 5))
    assert(streamed.nonEmpty && streamed == oneShot,
      "streamed index must reproduce the one-shot ranking")
  }

  test("file-streamed dedup index reports exactly the cross-batch matches") {
    val watch = tmpDir("sdidx-src")
    val root = tmpDir("sdidx-root") + "/idx"
    val ckpt = tmpDir("sdidx-ckpt")
    // Plant twins across batch boundaries: docs 0-49 stream first, their
    // twins (id+1000, text + suffix token removed → same text) second.
    val base = docs.filter(col("doc_id") < 50).select("doc_id", "text")
    val twins = base.select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    stageFiles(Seq(base, twins), watch)
    StreamingIndex.dedupAvailableNow(spark, watch, base.schema, root, ckpt)
    val matches = spark.read.parquet(root + "/matches")
      .select("batch_id", "base_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    // Every twin matches exactly its source (identical text ⇒ J = 1).
    val expected = (0 until 50)
      .map(i => (i + 1000L) -> i.toLong)
      .filter { case (_, b) => base.filter(col("doc_id") === b).count() == 1 }
      .toSet
    assert(matches.filter { case (a, b) => a - 1000 == b } ==
      expected.filter { case (a, b) => a - 1000 == b },
      "each twin must match its cross-batch source")
    assert(matches.nonEmpty)
  }

  test("a replayed epoch is a no-op for both indices") {
    val root = tmpDir("sidx-replay") + "/idx"
    val small = docs.filter(col("doc_id") < 100).select("doc_id", "text")
    RetrievalIndex.update(spark, root, small, batchId = Some(0L))
    val s1 = spark.read.parquet(root + "/stats").head()
    // Same epoch again — with DIFFERENT (overlapping) content: a
    // committed replay must short-circuit before the re-ingest guard.
    RetrievalIndex.update(spark, root, small, batchId = Some(0L))
    val s2 = spark.read.parquet(root + "/stats").head()
    assert(s1.getAs[Long]("n_docs") == s2.getAs[Long]("n_docs"))
    assert(s2.getAs[Long]("last_batch") == 0L)

    val droot = tmpDir("sdidx-replay") + "/idx"
    DedupIndex.matchAndIngest(spark, droot, small, 0.7, batchId = Some(0L))
    val m1 = DedupIndex.matchAndIngest(spark, droot, small, 0.7, batchId = Some(0L))
    assert(m1.count() == 0L, "replayed first batch returns its persisted (empty) matches")
    assert(spark.read.parquet(droot + "/stats").head()
      .getAs[Long]("n_docs") == small.count())
  }

  test("file-streamed drift state equals the one-shot PSI bit-for-bit") {
    import graft.warehouse.DriftState
    val watch = tmpDir("sdrift-src")
    val root = tmpDir("sdrift-root") + "/state"
    val ckpt = tmpDir("sdrift-ckpt")
    // Bin documents by n_chars span; ref = sources s0, cur = the rest,
    // streamed as three files.
    val binExpr = expr("least(n_chars div 200, 9)")
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val all = base.withColumn("bin", binExpr)
    val ref = all.filter(col("doc_id") % 2 === 0)
    val cur = base.filter(col("doc_id") % 2 === 1)
    DriftState.initReference(spark, root, ref, Seq("source"), "bin")
    stageFiles(Seq(
      cur.filter(col("doc_id") % 3 === 0),
      cur.filter(col("doc_id") % 3 === 1),
      cur.filter(col("doc_id") % 3 === 2)), watch)
    StreamingIndex.driftAvailableNow(spark, watch, cur.schema, root, ckpt,
      Seq("source"), binExpr)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("term_ppm")))).toMap
    val streamed = key(DriftState.psiSnapshot(spark, root, "source", 10))
    val oneShot = key(graft.analytics.Statistics.psi(
      all.withColumn("is_ref", col("doc_id") % 2 === 0),
      "source", "is_ref", "bin", 10))
    assert(streamed.nonEmpty && streamed == oneShot,
      "streamed drift state must reproduce the one-shot PSI")
  }

  test("file-streamed eval state equals the one-shot bin counts " +
    "bit-for-bit; a replayed epoch is a no-op") {
    import graft.warehouse.EvalState
    val watch = tmpDir("seval-src")
    val root = tmpDir("seval-root") + "/state"
    val ckpt = tmpDir("seval-ckpt")
    val scored = graft.analytics.ModelEval.scoredDocs(docs)
      .withColumn("doc_id", col("doc_id")) // keep id for the split
    stageFiles(Seq(
      scored.filter(col("doc_id") % 3 === 0),
      scored.filter(col("doc_id") % 3 === 1),
      scored.filter(col("doc_id") % 3 === 2)), watch)
    StreamingIndex.evalAvailableNow(spark, watch, scored.schema, root, ckpt)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("pos"))).toMap
    val streamed = key(EvalState.snapshot(spark, root))
    val oneShot = key(graft.analytics.ModelEval.scoredDocs(docs)
      .groupBy(col("source"), (col("score_micro") / 100000L).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos")))
    assert(streamed.nonEmpty && streamed == oneShot,
      "streamed eval state must equal the one-shot bin counts")
    // Replaying a committed epoch with DIFFERENT content short-circuits.
    EvalState.update(spark, root, scored.limit(7), batchId = Some(0L))
    assert(key(EvalState.snapshot(spark, root)) == oneShot,
      "a committed replay must not re-fold")
  }

  test("file-streamed covariance state equals the one-shot sufficient " +
    "statistics bit-for-bit; a replayed epoch is a no-op") {
    import graft.warehouse.CovarianceState
    val watch = tmpDir("scov-src")
    val root = tmpDir("scov-root") + "/state"
    val ckpt = tmpDir("scov-ckpt")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    stageFiles(Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2)), watch)
    StreamingIndex.covarianceAvailableNow(spark, watch, emb.schema, root, ckpt)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("s_x_nano"),
          r.getAs[Long]("s_y_nano"), r.getAs[Long]("s_xy_nano"))).toMap
    val streamed = key(CovarianceState.snapshot(spark, root))
    val oneShot = key(graft.analytics.Pca.covarianceStats(emb))
    assert(streamed.nonEmpty && streamed == oneShot,
      "streamed covariance state must equal the one-shot integer stats")
    // Replaying a committed epoch with DIFFERENT content short-circuits.
    CovarianceState.update(spark, root,
      emb.filter(col("vec_id") < 3), batchId = Some(0L))
    assert(key(CovarianceState.snapshot(spark, root)) == oneShot,
      "a committed replay must not re-fold")
    // And compaction preserves the snapshot exactly.
    val reports = CovarianceState.compact(spark, root)
    assert(reports.exists(_.dirsAfter == 1), s"fold: $reports")
    assert(key(CovarianceState.snapshot(spark, root)) == oneShot,
      "compaction must not change the folded statistics")
  }

  test("file-streamed IVF ANN state searches exactly like brute force at " +
    "nprobe=all, before AND after a mid-stream recluster; replay no-ops") {
    import graft.warehouse.IvfState
    val watch = tmpDir("sivf-src")
    val root = tmpDir("sivf-root") + "/state"
    val ckpt = tmpDir("sivf-ckpt")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    stageFiles(Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2)), watch)
    StreamingIndex.ivfAvailableNow(spark, watch, emb.schema, root, ckpt)
    val queries = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
        (r.getLong(1), r.getAs[Double]("score_r"))).toMap
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 4))
    // Tail-only search (stream drained, never reclustered) is exact.
    assert(key(IvfState.search(spark, root, queries, k = 4, nprobe = 1)) == want,
      "streamed tail must serve exact searches before any recluster")
    // Maintenance recluster, then the probe-everything search matches.
    IvfState.recluster(spark, root, k = Some(6))
    assert(key(IvfState.search(spark, root, queries, k = 4, nprobe = 6)) == want,
      "post-recluster bundle search must equal brute force at nprobe=all")
    // Replaying a committed epoch with DIFFERENT content short-circuits.
    IvfState.update(spark, root,
      emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 700000L).as("vec_id"), col("embedding")),
      batchId = Some(1L))
    assert(key(IvfState.search(spark, root, queries, k = 4, nprobe = 6)) == want,
      "a committed replay must not re-ingest")
  }

  test("file-streamed PQ ANN state searches exactly like brute force at " +
    "corpus-wide shortlist, before AND after a mid-stream retrain") {
    import graft.warehouse.PqState
    val watch = tmpDir("spq-src")
    val root = tmpDir("spq-root") + "/state"
    val ckpt = tmpDir("spq-ckpt")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    stageFiles(Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2)), watch)
    StreamingIndex.pqAvailableNow(spark, watch, emb.schema, root, ckpt)
    val queries = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
        (r.getLong(1), r.getAs[Double]("score_r"))).toMap
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 4))
    assert(key(PqState.search(spark, root, queries, k = 4, shortlist = 600)) == want,
      "streamed tail must serve exact searches before any retrain")
    PqState.retrain(spark, root, m = 8, ksub = 8)
    assert(key(PqState.search(spark, root, queries, k = 4, shortlist = 600)) == want,
      "post-retrain ADC + re-rank must equal brute force at full shortlist")
  }

  test("file-streamed IVF-PQ state searches exactly like brute force at " +
    "nprobe=all + corpus-wide shortlist, before AND after a recluster") {
    import graft.warehouse.IvfPqState
    val watch = tmpDir("sivfpq-src")
    val root = tmpDir("sivfpq-root") + "/state"
    val ckpt = tmpDir("sivfpq-ckpt")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    stageFiles(Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2)), watch)
    StreamingIndex.ivfPqAvailableNow(spark, watch, emb.schema, root, ckpt)
    val queries = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
        (r.getLong(1), r.getAs[Double]("score_r"))).toMap
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 4))
    assert(key(IvfPqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "streamed tail must serve exact searches before any recluster")
    IvfPqState.recluster(spark, root, kCells = Some(8))
    assert(key(IvfPqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "post-recluster pruned ADC + re-rank must equal brute force")
  }

  test("file-streamed IVF-SQ8 state searches exactly like brute force at " +
    "nprobe=all + corpus-wide shortlist, before AND after a recluster") {
    import graft.warehouse.SqState
    val watch = tmpDir("ssq-src")
    val root = tmpDir("ssq-root") + "/state"
    val ckpt = tmpDir("ssq-ckpt")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    stageFiles(Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2)), watch)
    StreamingIndex.sqAvailableNow(spark, watch, emb.schema, root, ckpt)
    val queries = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
        (r.getLong(1), r.getAs[Double]("score_r"))).toMap
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 4))
    assert(key(SqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "streamed encoded tail must serve exact searches before any recluster")
    SqState.recluster(spark, root, k = Some(8))
    assert(key(SqState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "post-recluster pruned int8 + re-rank must equal brute force")
  }

  test("file-streamed IVF-binary state searches exactly like brute force " +
    "at nprobe=all + corpus-wide shortlist, before AND after a recluster") {
    import graft.warehouse.BitState
    val watch = tmpDir("sbit-src")
    val root = tmpDir("sbit-root") + "/state"
    val ckpt = tmpDir("sbit-ckpt")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    stageFiles(Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2)), watch)
    StreamingIndex.bitAvailableNow(spark, watch, emb.schema, root, ckpt)
    val queries = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
        (r.getLong(1), r.getAs[Double]("score_r"))).toMap
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 4))
    assert(key(BitState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "streamed encoded tail must serve exact searches before any recluster")
    BitState.recluster(spark, root, k = Some(8))
    assert(key(BitState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "post-recluster Hamming + re-rank must equal brute force")
  }

  test("file-streamed MIPS state searches exactly like brute MIPS at " +
    "nprobe=all + corpus-wide shortlist, before AND after a recluster") {
    import graft.warehouse.MipsState
    val watch = tmpDir("smips-src")
    val root = tmpDir("smips-root") + "/state"
    val ckpt = tmpDir("smips-ckpt")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    stageFiles(Seq(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 === 1),
      emb.filter(col("vec_id") % 3 === 2)), watch)
    StreamingIndex.mipsAvailableNow(spark, watch, emb.schema, root, ckpt)
    val queries = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
        (r.getLong(1), r.getAs[Double]("score_r"))).toMap
    val want = key(graft.analytics.Mips.bruteMips(emb, queries, k = 4))
    assert(key(MipsState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "streamed encoded tail must serve exact raw-dot searches")
    MipsState.recluster(spark, root, k = Some(8))
    assert(key(MipsState.search(spark, root, queries, k = 4,
      nprobe = 8, shortlist = 600)) == want,
      "post-recluster augmented-cell + raw-dot re-rank must equal brute MIPS")
  }

  test("file-streamed substring decontamination equals the one-shot batch " +
    "row-for-row; a committed replay is a no-op (q233 streaming face)") {
    import graft.warehouse.DecontamState
    val watch = tmpDir("sdec-src")
    val root = tmpDir("sdec-root") + "/state"
    val ckpt = tmpDir("sdec-ckpt")
    // The q233 shape: hash-split the corpus, stream the train side in 3
    // micro-batches against the fixed test side.
    val split = docs.select(col("doc_id"),
      graft.analytics.TrainingData.hashSplit(col("doc_id")).as("split"),
      col("text"))
    val train = split.filter(col("split") === "train").select("doc_id", "text")
    val eval = split.filter(col("split") === "test").select("doc_id", "text")
    stageFiles(Seq(
      train.filter(col("doc_id") % 3 === 0),
      train.filter(col("doc_id") % 3 === 1),
      train.filter(col("doc_id") % 3 === 2)), watch)
    StreamingIndex.decontamAvailableNow(spark, watch, train.schema, eval,
      root, ckpt)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toMap
    val streamed = key(DecontamState.snapshot(spark, root))
    val oneShot = key(graft.analytics.TrainingData.substringOverlap(train, eval))
    assert(streamed.nonEmpty && streamed == oneShot,
      s"streamed decontam must equal the one-shot batch " +
        s"(${streamed.size} vs ${oneShot.size} rows)")
    assert(streamed.values.exists(_._4 == 1),
      "fixture must exercise a contaminated doc (planted cross-split dup)")
    // Committed replay with DIFFERENT content short-circuits.
    DecontamState.update(spark, root, eval,
      train.limit(3).select((col("doc_id") + 900000L).as("doc_id"), col("text")),
      batchId = Some(1L))
    assert(key(DecontamState.snapshot(spark, root)) == oneShot,
      "a committed replay must not re-ingest")
  }

  test("file-streamed components state equals the one-shot closure, " +
    "merging chains across micro-batches") {
    import spark.implicits._
    val watch = tmpDir("scc-src")
    val root = tmpDir("scc-root") + "/state"
    val ckpt = tmpDir("scc-ckpt")
    // Two chains stream in separate files; the bridge lands last.
    val p1 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val p2 = Seq((20L, 21L), (21L, 22L)).toDF("a_id", "b_id")
    val p3 = Seq((4L, 20L), (30L, 31L)).toDF("a_id", "b_id")
    stageFiles(Seq(p1, p2, p3), watch)
    graft.streaming.StreamingIndex.componentsAvailableNow(
      spark, watch, p1.schema, root, ckpt)
    val streamed = spark.read.parquet(root).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    val all = p1.unionByName(p2).unionByName(p3)
    val nodes = all.select(col("a_id").as("doc_id"))
      .unionByName(all.select(col("b_id").as("doc_id"))).distinct()
    val oneShot = graft.analytics.Dedup.clusters(nodes, all)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == oneShot)
    assert(streamed(22L) == 1L && streamed(31L) == 30L)
  }
}
