package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end coverage for [[Curate.run]] — the deliverable pipeline of
  * the training-data surface (dedup → split → pack → shard). The stages
  * are individually verified elsewhere; this spec pins the COMPOSITION:
  * the accounting a run reports, losslessness through the shard write,
  * the shard-file bound, and the packing invariant that no sequence
  * straddles a split boundary.
  */
class CurateSpec extends SparkSpec {

  // documents corpus + planted near-twin per doc (the q30 planting): the
  // dedup stage must collapse each (doc, twin) pair to the min-id doc.
  private def fixture(out: String): Long = {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val planted = docs.unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"), col("source")))
    planted.write.mode("overwrite").parquet(out)
    planted.count()
  }

  test("curate run: accounting, dedup, shard caps, and split-local packing") {
    val in = tmpDir("curate-in") + "/docs.parquet"
    val out = tmpDir("curate-out") + "/shards"
    val docsIn = fixture(in)

    val report = Curate.run(spark, in, out, threshold = 0.7, budget = 64,
      maxRecordsPerFile = 100)

    // Input accounting comes from parquet footers — it must equal the
    // planted corpus size exactly.
    assert(report.docsIn == docsIn, s"docsIn ${report.docsIn} != $docsIn")

    // Dedup really ran: every planted twin (and any natural near-dup
    // cluster loser) is gone, and only original-id docs survive (the twin
    // of doc d can never beat d — min-id-per-cluster keeps d).
    assert(report.docsKept < docsIn, "planted twins must be deduped away")
    val back = spark.read.parquet(out)
    assert(back.count() == report.docsKept, "shard rows must equal docsKept")
    assert(back.filter(col("doc_id") >= 1000000L).count() == 0,
      "a planted twin survived dedup")

    // Token accounting is lossless: observed total == re-summed total.
    val tokens = back.agg(sum("n_toks")).head().getLong(0)
    assert(report.totalTokens == tokens,
      s"observed tokens ${report.totalTokens} != written $tokens")

    // Shard bound holds per file.
    val perFile = back.groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 100), s"oversized shard: ${perFile.max}")
    assert(report.shards.files >= math.ceil(report.docsKept / 100.0).toLong)

    // Packing is split-local AND source-local (eval sequences must not
    // share training tokens — Curate.curated's claim): recompute the
    // greedy offset packing independently per (split, source) in plain
    // Scala and require EXACT agreement — this pins both the window
    // partitioning (no cross-split leakage: a leaked row would shift
    // every later offset in its group) and the offset arithmetic.
    val rows = back.select("split", "source", "doc_id", "n_toks", "seq_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(r => (r._1, r._2)).foreach { case ((split, source), group) =>
      var off = 0L
      group.sortBy(_._3).foreach { case (_, _, docId, nToks, seqId) =>
        val expected = off / 64
        assert(seqId == expected,
          s"($split,$source) doc $docId: seq_id $seqId != $expected at offset $off")
        off += nToks
      }
    }
  }
}
