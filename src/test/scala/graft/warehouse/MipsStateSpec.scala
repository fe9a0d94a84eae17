package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental MIPS state: the store-raw / augment-at-recluster answer
  * to the M-problem ([[MipsState]] scaladoc). Pins (1) exact brute-MIPS
  * parity with both approximations removed, through ingest → recluster
  * → tail; (2) the RAISING-M lifecycle the design exists for — a late
  * batch with a larger max norm leaves every stored artifact valid and
  * the search exact, before AND after the next recluster re-augments;
  * (3) no M-dependent artifact is ever stored (the bundle holds raw
  * vectors + raw SQ8 codes only); and (4) the family's no-re-encode
  * tamper proof on this face.
  */
class MipsStateSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def key(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getAs[Number]("rank").longValue()) ->
      (r.getLong(1), r.getAs[Double]("score_r"))).toMap

  test("state ≡ brute MIPS at nprobe=all + corpus-wide shortlist " +
    "across ingest, mid-stream recluster, and tail") {
    val root = tmpDir("mipsstate") + "/state"
    val queries = emb.filter(col("vec_id") < 6)
    (0 until 3).foreach { i =>
      MipsState.update(spark, root, emb.filter(col("vec_id") % 3 === i))
      if (i == 1) MipsState.recluster(spark, root, k = Some(8))
    }
    val got = key(MipsState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600))
    val want = key(graft.analytics.Mips.bruteMips(emb, queries, k = 5))
    assert(got.nonEmpty && got == want,
      s"state search must equal brute MIPS: got=${got.size} want=${want.size}")
  }

  test("a late batch that RAISES M keeps search exact (stale-M bundle + " +
    "exact tail), and the next recluster re-augments at the new M") {
    val root = tmpDir("mipsstate-m") + "/state"
    // Batches 0/1: the harness corpus (norms ~1). Batch 2: 3x-scaled
    // copies under fresh ids — they RAISE the max corpus norm 3x and,
    // being longer, legitimately dominate every dot ranking (the
    // longer-beats-nearer property the measure is about).
    val loud = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 700000L).as("vec_id"),
        transform(col("embedding"), x => x * 3.0).as("embedding"))
    val full = emb.unionByName(loud)
    val queries = emb.filter(col("vec_id") < 6)
    (0 until 2).foreach { i =>
      MipsState.update(spark, root, emb.filter(col("vec_id") % 2 === i))
    }
    MipsState.recluster(spark, root, k = Some(8)) // M pinned at ~1 here
    MipsState.update(spark, root, loud) // the M-raising tail
    val want = key(graft.analytics.Mips.bruteMips(full, queries, k = 5))
    assert(key(MipsState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == want,
      "a louder unfolded tail must rank exactly (raw-dot tail scan)")
    // The loud rows must actually lead the ranking for the spec to mean
    // anything (longer-beats-nearer).
    assert(want.collect { case ((_, 1L), (id, _)) => id }
      .forall(_ >= 700000L), "fixture defect: loud rows must rank first")
    // Re-augmentation at the new M: fold everything, search again.
    MipsState.recluster(spark, root, k = Some(8))
    assert(key(MipsState.search(spark, root, queries, k = 5,
      nprobe = 8, shortlist = 600)) == want,
      "post-recluster (re-augmented at the raised M) search must stay exact")
    // No M-dependent artifact is stored: raw layout only.
    val cols = spark.read.parquet(s"$root/bundle/index").columns.toSet
    assert(cols == Set("vec_id", "embedding", "scale", "codes", "cell"),
      s"bundle must store the raw layout, got: $cols")
  }

  test("recluster carries committed codes VERBATIM on the MIPS face " +
    "(augmentation is transient; codes are raw-vector SQ8)") {
    val root = tmpDir("mipsstate-tamper") + "/state"
    val victim = 7L
    (0 until 2).foreach { i =>
      MipsState.update(spark, root, emb.filter(col("vec_id") % 2 === i))
    }
    val batchDir = s"$root/deltas/batch=1" // vec 7 is odd -> batch 1
    val pinned = spark.read.parquet(batchDir).localCheckpoint(eager = true)
    pinned.withColumn("codes",
        when(col("vec_id") === victim,
          transform(col("codes"), _ => lit(42).cast("byte")).cast("array<tinyint>"))
          .otherwise(col("codes")))
      .write.mode("overwrite").parquet(batchDir)
    MipsState.recluster(spark, root, k = Some(4))
    val row = spark.read.parquet(s"$root/bundle/index")
      .filter(col("vec_id") === victim).select("codes").collect()
    assert(row.length == 1)
    val codes = row.head.getSeq[Byte](0)
    assert(codes.nonEmpty && codes.forall(_ == 42.toByte),
      s"bundle must carry the tampered codes verbatim: $codes")
  }
}
