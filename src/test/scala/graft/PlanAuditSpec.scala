package graft

import graft.Explain.PlanStats
import graft.SparkSpec

/** Physical-plan regression gate (VERDICT r01 item 8): per-query ceilings
  * on the operators that define scale shape, so plan rot fails CI.
  * Ceilings are deliberately loose (≈2× the audited PLANS.md values) —
  * they exist to catch category regressions (a lineage pile-up, a
  * broadcast decaying to SMJ, a nested-loop pair join reappearing), not
  * to pin exact plans across Spark upgrades.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def stats(name: String): PlanStats =
    Explain.audit(Registry.all.find(_.name == name).get.run(spark, dir))

  test("q30 label-propagation lineage stays truncated") {
    val s = stats("q30_dedup_corpus")
    // Pre-fix this plan had 472 scans / 493 shuffles; post-fix it is 8/7.
    assert(s.scans <= 20, s"q30 scans regressed: $s")
    assert(s.shuffles <= 20, s"q30 shuffles regressed: $s")
  }

  test("q21 embedding near-dups never regresses to a quadratic pair join") {
    val s = stats("q21_embedding_neardups")
    assert(s.nestedLoops == 0, s"q21 must stay LSH-bucketed: $s")
  }

  test("q12 customer report keeps dims broadcast; only the fact-fact join merges") {
    val s = stats("q12_customer_report")
    assert(s.broadcast >= 5, s"q12 dimension joins must broadcast: $s")
    assert(s.smj <= 2, s"q12 should sort-merge only lineitem⋈orders: $s")
  }

  test("q01 pricing summary stays a single-scan aggregate") {
    val s = stats("q01_pricing_summary")
    assert(s.scans <= 2 && s.shuffles <= 2, s"q01 must stay scan+agg: $s")
  }

  test("q17 minhash pipeline stays banded (no pair-space blowup)") {
    val s = stats("q17_minhash_neardups")
    assert(s.nestedLoops == 0 && s.scans <= 20, s"q17 regressed: $s")
  }

  test("q32 sessionization stays windowed (single shuffle, no state op)") {
    val s = stats("q32_event_sessions")
    assert(s.shuffles <= 2, s"q32 should shuffle once on user_id: $s")
  }
}
