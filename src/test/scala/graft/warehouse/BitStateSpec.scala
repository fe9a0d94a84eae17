package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental IVF-binary state: the shared-core protocol (fully pinned
  * by SqStateSpec/IvfStateSpec on the same code) re-checked through the
  * 1-bit face, plus the face's own no-re-encode tamper proof — an
  * all-ones sentinel word pattern survives a recluster verbatim where a
  * re-encoding recluster would restore the true sign bits.
  */
class BitStateSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def key(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
      (r.getLong(1), r.getAs[Double]("score_r"))).toMap

  test("multi-batch ingest + mid-stream recluster answers exactly like " +
    "brute force at nprobe=all + corpus-wide shortlist; dirs collapse") {
    val n = 12
    val root = tmpDir("bitstate") + "/state"
    val queries = emb.filter(col("vec_id") < 6)
    (0 until n).foreach { i =>
      BitState.update(spark, root, emb.filter(col("vec_id") % n === i))
      if (i == 7) BitState.recluster(spark, root, k = Some(8))
    }
    val p = new Path(s"$root/deltas")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.listStatus(p).count(_.getPath.getName.startsWith("batch=")) == 4,
      "folded deltas must be reclaimed")
    val got = key(BitState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600))
    val want = key(graft.analytics.Similarity.bruteForceKnn(emb, queries, k = 5))
    assert(got.nonEmpty && got == want,
      s"state search must equal brute force: got=${got.size} want=${want.size}")
    // Committed replay ingests nothing.
    BitState.update(spark, root,
      Seq((999999L, Seq.fill(64)(9.9))).toDF("vec_id", "embedding"),
      batchId = Some(3L))
    assert(key(BitState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == want, "committed replay must not ingest")
  }

  test("recluster carries committed bit codes VERBATIM: an all-ones " +
    "sentinel survives while cells move (no re-encode)") {
    val root = tmpDir("bitstate-tamper") + "/state"
    val victim = 7L
    (0 until 2).foreach { i =>
      BitState.update(spark, root, emb.filter(col("vec_id") % 2 === i))
    }
    val batchDir = s"$root/deltas/batch=1" // vec_id 7 is odd -> batch 1
    val pinned = spark.read.parquet(batchDir).localCheckpoint(eager = true)
    pinned.withColumn("codes",
        when(col("vec_id") === victim,
          transform(col("codes"), _ => lit(-1L)))
          .otherwise(col("codes")))
      .write.mode("overwrite").parquet(batchDir)
    BitState.recluster(spark, root, k = Some(4))
    val row = spark.read.parquet(s"$root/bundle/index")
      .filter(col("vec_id") === victim)
      .select(col("codes"), col("embedding")).collect()
    assert(row.length == 1)
    val codes = row.head.getSeq[Long](0)
    assert(codes.nonEmpty && codes.forall(_ == -1L),
      s"bundle must carry the tampered words verbatim: $codes")
    // Discriminating: the true codes differ from all-ones.
    val trueCodes = graft.analytics.BitIndex.encode(
        Seq(Tuple1(row.head.getSeq[Double](1))).toDF("embedding"), "embedding")
      .select("codes").collect().head.getSeq[Long](0)
    assert(trueCodes != codes, "fixture defect: true codes equal the sentinel")
  }
}
