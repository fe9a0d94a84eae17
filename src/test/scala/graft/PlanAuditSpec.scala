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

  test("q23 as-of join stays an equi-join + window (no range nested loop)") {
    val s = stats("q23_asof_latest_order")
    assert(s.nestedLoops == 0, s"q23 must not regress to a range nested loop: $s")
    assert(s.shuffles <= 8, s"q23 shuffles regressed: $s")
  }

  test("q28 IVF search keeps the probe join broadcast") {
    val s = stats("q28_knn_ivf")
    assert(s.broadcast >= 1, s"q28 probe join must broadcast: $s")
    assert(s.nestedLoops == 0, s"q28 must stay cell-bucketed: $s")
  }

  test("q22/q41 multimodal stay single-scan and join-free (no blob re-join)") {
    // r3 verdict item 4: the old shape re-joined `source` on media_id —
    // broadcast at test scale, a full-blob shuffle beyond broadcast range.
    Seq("q22_media_meta_stats", "q41_frame_sample_stats").foreach { name =>
      val s = stats(name)
      assert(s.scans <= 2, s"$name must stay single-scan: $s")
      assert(s.broadcast == 0 && s.smj == 0 && s.nestedLoops == 0,
        s"$name must not re-join the media table: $s")
      assert(s.shuffles <= 2, s"$name shuffles regressed: $s")
    }
  }

  test("q20 multi-table ANN broadcasts candidates and never pair-scans") {
    val s = stats("q20_knn_ann")
    assert(s.nestedLoops == 0, s"q20 must stay bucket-joined: $s")
    assert(s.broadcast >= 2, s"q20 candidate/query joins must broadcast: $s")
  }

  test("q42/q43/q44 stay narrow (no joins beyond the declared shape)") {
    val s42 = stats("q42_wav_decode_stats")
    assert(s42.scans <= 1 && s42.shuffles == 0,
      s"q42 must stay a single-scan mapPartitions pipeline: $s42")
    val s66 = stats("q66_png_decode_stats")
    assert(s66.scans <= 1 && s66.shuffles == 0,
      s"q66 must stay a single-scan mapPartitions pipeline: $s66")
    val s69 = stats("q69_jpeg_decode_stats")
    assert(s69.scans <= 1 && s69.shuffles == 0,
      s"q69 must stay a single-scan mapPartitions pipeline: $s69")
    val s43 = stats("q43_repetition_quality")
    assert(s43.shuffles <= 6 && s43.nestedLoops == 0, s"q43 regressed: $s43")
    val s44 = stats("q44_quantization_fidelity")
    assert(s44.scans <= 1 && s44.shuffles == 0 && s44.broadcast == 0,
      s"q44 must stay a pure per-row projection: $s44")
  }

  test("round-2 queries keep their audited shuffle budgets (PLANS.md)") {
    // Ceilings ≈2× the audited Exchange counts (AQE prints each logical
    // shuffle twice); a category regression (an extra join shuffle, a
    // window losing its partitioning reuse) blows through 2×.
    val budgets = Seq(
      "q34_ratings_summary" -> 8, // audited 4
      "q35_hash_split" -> 4, // audited 2
      "q36_contamination" -> 8, // audited 6 (incl. broadcast build)
      "q37_stratified_sample" -> 4, // audited 2
      "q38_top_tokens" -> 8, // audited 4
      "q39_sequence_packing" -> 4, // audited 2
      "q40_pii_scrub" -> 4) // audited 2
    budgets.foreach { case (name, ceiling) =>
      val s = stats(name)
      assert(s.shuffles <= ceiling, s"$name shuffles regressed: $s (ceiling $ceiling)")
      assert(s.nestedLoops == 0, s"$name grew a nested-loop join: $s")
    }
  }

  test("q45 decontamination keeps the eval shingle set broadcast") {
    val s = stats("q45_ngram_decontamination")
    // The training side must never shuffle its shingles for the probe —
    // only the per-doc count and the final left join exchange (audited 8
    // incl. broadcast builds).
    assert(s.shuffles <= 12 && s.nestedLoops == 0 && s.smj == 0,
      s"q45 eval probe must stay broadcast: $s")
  }

  test("q233 substring decontamination keeps the eval gram set broadcast; " +
    "the islands window sees matched rows only") {
    val s = stats("q233_substring_decontamination")
    // Same seam as q45: the training side never shuffles its grams for
    // the probe; the exchanges are the post-probe islands window keyed
    // on doc_id, the run/per-doc aggregates, and the final left join.
    assert(s.shuffles <= 12 && s.nestedLoops == 0 && s.smj == 0,
      s"q233 eval probe must stay broadcast: $s")
  }

  test("q237 self substring dedup: gram-keyed equi-joins only — no pair " +
    "self-join, no nested loop, no single-partition funnel") {
    val s = stats("q237_self_substring_dedup")
    // Shape: scan + posexplode, gram-count agg, gram equi-join back,
    // doc-keyed islands window over matched rows, final left join. The
    // dup-gram side is corpus-derived (NOT broadcastable by contract),
    // so the probe is a shuffle equi-join — but never an occurrence-
    // pair enumeration: nestedLoops must stay 0 and the exchange count
    // bounded by the five keyed hops.
    assert(s.shuffles <= 14 && s.nestedLoops == 0 && s.singleParts == 0,
      s"q237 must stay gram/doc-keyed: $s")
  }

  test("q261 hierarchical-assign face: no single-partition funnel; nested " +
    "loops bounded to the √k-row super crossJoins") {
    val s = stats("q261_knn_ivf_hier")
    // The hierarchical assign's crossJoins broadcast the ⌈√k⌉-row
    // super-codebook (bounded, dies in map-side partial agg) — they are
    // the designed shape, not a pair-scan; what must never appear is a
    // corpus single-partition funnel or an unbounded nested-loop count
    // (each forced assign contributes ≤ 3: bound, dmin-candidates,
    // tie-pass — Lloyd iters + index + search probe ⇒ ceiling 12).
    assert(s.singleParts == 0, s"q261 must never funnel: $s")
    assert(s.nestedLoops <= 12,
      s"q261 nested loops must stay the bounded super crossJoins: $s")
  }

  test("q264 table-codebook face: the q261 ceilings hold with the codebook " +
    "read from parquet") {
    // The registry row returns a checkpointed frame (its temp model dir
    // is deleted on exit), which an executed-plan audit would see as a
    // bare RDD scan — so rebuild the same search shape here and audit
    // the LIVE plan: table-faced load, hierarchical dispatch forced,
    // the q28 search.
    import graft.analytics.{IvfIndex, Similarity}
    import org.apache.spark.sql.functions.col
    val corpus = Similarity.plantedKnnCorpus(
      graft.core.Tables.embeddings(spark, dir))
    val tmp = java.nio.file.Files.createTempDirectory("graft-audit-q264")
    try {
      val path = s"$tmp/model"
      IvfIndex.save(spark, IvfIndex.train(corpus, k = 16, iters = 2), path)
      IvfIndex.tableModelMinKOverride.withValue(Some(0)) {
        IvfIndex.literalAssignMaxKOverride.withValue(Some(0)) {
          IvfIndex.hierarchicalAssignMinKOverride.withValue(Some(0)) {
            val m = IvfIndex.load(spark, path)
            assert(m.tableBacked)
            val s = Explain.audit(IvfIndex.search(IvfIndex.index(corpus, m),
              corpus.filter(col("vec_id") < 10), m, k = 5, nprobe = 4))
            // The q261 ceilings, unchanged by the codebook's storage
            // face: crossJoins stay the bounded √k-row super broadcasts
            // (≤ 3 per forced assign; index + n=4 probe ⇒ 12), and a
            // corpus single-partition funnel stays forbidden.
            assert(s.singleParts == 0, s"q264 shape must never funnel: $s")
            assert(s.nestedLoops <= 12,
              s"q264 nested loops must stay the bounded super crossJoins: $s")
          }
        }
      }
    } finally graft.core.Fs.deleteRecursively(tmp)
  }

  test("q262 engine-probe face: LUT join SHUFFLES on cell (gate forced " +
    "open), no nested loop, no single-partition") {
    val s = stats("q262_knn_ivfpq_engine")
    // The whole point of the face: above the |Q| gate the cell join is
    // a shuffle join — a broadcast-only plan would mean the gate
    // silently stopped applying.
    assert(s.nestedLoops == 0 && s.singleParts == 0,
      s"q262 must stay cell-pruned: $s")
    assert(s.smj >= 1,
      s"q262's gated LUT join must shuffle on cell, not broadcast: $s")
  }

  test("q238 IVF-PQ search: probed-cell equi-join + broadcast LUTs — no " +
    "nested loop, no corpus single-partition") {
    val s = stats("q238_knn_ivfpq")
    // Candidates arrive via the cell EQUI-join against the broadcast
    // (query, cell, LUT) rows — the probed-cell filter IS the join key;
    // a crossJoin or nested loop here would scan every cell per query.
    assert(s.nestedLoops == 0 && s.singleParts == 0,
      s"q238 must stay cell-pruned: $s")
    assert(s.broadcast >= 1, s"q238 LUT rows must broadcast: $s")
  }

  test("q239 incremental IVF-PQ state search: pruned-bundle ADC + exact " +
    "tail, no nested loop beyond the broadcast-query tail, no corpus " +
    "single-partition") {
    val s = stats("q239_ivfpq_state")
    // The tail face is a broadcast-query crossJoin (one BNLJ against
    // the metadata-sized query frame — the q234/q236 shape); the bundle
    // face must stay a cell equi-join. More than the one tail BNLJ or
    // any single-partition funnel means the pruning seam rotted.
    assert(s.nestedLoops <= 1 && s.singleParts == 0,
      s"q239 must stay cell-pruned + broadcast-tail: $s")
  }

  test("q240 span removal: gram/doc-keyed joins + anti-join only — no " +
    "pair join, no single-partition funnel") {
    val s = stats("q240_self_substring_remove")
    assert(s.nestedLoops == 0 && s.singleParts == 0,
      s"q240 must stay gram/doc-keyed: $s")
  }

  test("q235 n-gram repetition stays per-doc windows + hash aggs — no " +
    "corpus single-partition, no pair join") {
    val s = stats("q235_ngram_repetition")
    assert(s.nestedLoops == 0 && s.singleParts == 0,
      s"q235 must stay doc-partitioned: $s")
    assert(s.scans <= 6 && s.shuffles <= 12, s"q235 shuffles regressed: $s")
  }

  test("q47 semantic dedup pairs only within probed cells — never a " +
    "global pair join") {
    val s = stats("q47_semantic_dedup")
    // Since r14 the plan carries BNLJs against the BROADCAST k-row
    // codebook (the exactness ball probe + the assign scoring — row ×
    // codebook, map-side, the joinNearestCells shape). The PAIR join
    // itself must stay keyed on `cell`: a pair-side nested loop would
    // be the O(n²) global join regressing, and it would show up as the
    // NLJ count jumping past the codebook probes.
    assert(s.nestedLoops <= 4, s"q47 grew a non-codebook nested loop: $s")
    assert(s.singleParts == 0, s"q47 must never single-partition: $s")
  }

  test("q48/q49/q50 keep their audited scale shapes") {
    // q48 canonical selection: clustering is pre-materialized
    // (checkpointed labels), so the final plan is join + one window —
    // audited 4 shuffles, no nested loops.
    val s48 = stats("q48_canonical_docs")
    assert(s48.shuffles <= 8 && s48.nestedLoops == 0, s"q48 regressed: $s48")
    // q49 bigram LM: count joins must stay hash joins (audited 18 incl.
    // AQE double-prints); nestedLoops == 2 is the intended single-row
    // vocab-size cross join (q46 pattern).
    val s49 = stats("q49_bigram_lm")
    assert(s49.shuffles <= 24 && s49.nestedLoops <= 2 && s49.smj == 0,
      s"q49 regressed: $s49")
    // q50 percentile gate: exactly one window exchange over the group key.
    val s50 = stats("q50_quality_gate")
    assert(s50.shuffles <= 4 && s50.nestedLoops == 0 && s50.broadcast == 0,
      s"q50 must stay a single-window plan: $s50")
  }

  test("q52 chunking stays a single-scan, shuffle-free projection") {
    val s = stats("q52_doc_chunks")
    assert(s.scans <= 1 && s.shuffles == 0 && s.broadcast == 0 && s.smj == 0,
      s"q52 must stay pure per-row map work: $s")
  }

  test("q53 window dedup joins only on the window key (no pair blowup)") {
    val s = stats("q53_window_dupes")
    assert(s.nestedLoops == 0, s"q53 must never pair-scan: $s")
    assert(s.shuffles <= 12, s"q53 shuffles regressed: $s") // audited 7
  }

  test("q54 vocab coverage broadcasts the vocabulary") {
    val s = stats("q54_vocab_coverage")
    assert(s.broadcast >= 1 && s.smj == 0 && s.nestedLoops == 0,
      s"q54 vocab join must stay broadcast: $s")
    assert(s.shuffles <= 10, s"q54 shuffles regressed: $s") // audited 5
  }

  test("q55 range join stays bin-bucketed — the non-equi never nested-loops") {
    val s = stats("q55_interval_shipments")
    assert(s.nestedLoops == 0, s"q55 must stay an equi-join on the bin id: $s")
    assert(s.shuffles <= 8, s"q55 shuffles regressed: $s")
  }

  test("q56 incremental dedup joins band signatures, never corpus pairs") {
    val s = stats("q56_incremental_neardups")
    assert(s.nestedLoops == 0, s"q56 must stay band-joined: $s")
    assert(s.scans <= 20, s"q56 scans regressed: $s")
  }

  test("q58 heavy hitters recount stays semi-join shaped") {
    val s = stats("q58_heavy_tokens")
    // The exact recount semi-joins a capacity-bounded candidate list;
    // the total rides pass 1 as a literal, so no single-row cross join.
    assert(s.nestedLoops == 0 && s.smj == 0, s"q58 regressed: $s")
    assert(s.shuffles <= 8, s"q58 shuffles regressed: $s")
  }

  test("q59 pivot stays a single-pass conditional aggregate") {
    val s = stats("q59_daily_event_pivot")
    assert(s.scans <= 2 && s.shuffles <= 4 && s.broadcast == 0 && s.nestedLoops == 0,
      s"q59 must stay one hash aggregate: $s")
  }

  test("q60/q61/q62 event battery keeps aggregate-only shapes") {
    // q60: one events agg + one days-sized global-stats window — a
    // second events pass for a stats subquery is the regression.
    val s60 = stats("q60_daily_anomalies")
    // scans=2 is the AQE stage double-print (q01's audited shape); a
    // genuine stats subquery re-pass would also add join/shuffle counts.
    assert(s60.scans <= 2 && s60.shuffles <= 4 && s60.smj == 0 && s60.nestedLoops == 0,
      s"q60 regressed: $s60")
    // q61: one shuffle by user, then a single-row rollup.
    val s61 = stats("q61_conversion_funnel")
    assert(s61.shuffles <= 4 && s61.nestedLoops == 0 && s61.broadcast == 0,
      s"q61 must stay a two-level aggregate: $s61")
    // q62: first-day agg + user-keyed join + cohort agg.
    val s62 = stats("q62_retention_cohorts")
    assert(s62.nestedLoops == 0 && s62.shuffles <= 8, s"q62 regressed: $s62")
  }

  test("q63 SCD2 history is one user-keyed shuffle reused by both windows") {
    val s = stats("q63_scd2_history")
    assert(s.shuffles <= 4 && s.nestedLoops == 0 && s.broadcast == 0 && s.smj == 0,
      s"q63 must stay window-only: $s")
  }

  test("q67 point-in-time join stays key-equi (interval test is residual only)") {
    val s = stats("q67_point_in_time")
    assert(s.nestedLoops == 0, s"q67 must never range-nested-loop: $s")
    assert(s.smj + s.broadcast >= 1, s"q67 must hash/merge join on the key: $s")
  }

  test("q64/q65 histogram and cube stay scan+aggregate (no global sort)") {
    // q64: rows bucket against collected quantile literals — a global
    // ntile sort (single-partition Exchange over the corpus) is the
    // regression, and singleParts is the counter that would catch it.
    val s64 = stats("q64_price_histogram")
    assert(s64.scans <= 2 && s64.shuffles <= 4 && s64.smj == 0 && s64.nestedLoops == 0,
      s"q64 must stay scan+agg: $s64")
    assert(s64.singleParts == 0, s"q64 must never single-partition the corpus: $s64")
    val s65 = stats("q65_cube_revenue")
    assert(s65.scans <= 2 && s65.shuffles <= 4 && s65.nestedLoops == 0,
      s"q65 must stay a single expand+agg pass: $s65")
  }

  test("q68 set ops stay hash semi/anti joins (1-row cross joins aside)") {
    val s = stats("q68_era_customer_setops")
    // INTERSECT/EXCEPT must plan as broadcast/hash semi+anti joins; the
    // nestedLoops are the TWO single-ROW summary cross joins combining
    // the three aggregates (q19 pattern; AQE prints each twice → 4),
    // and singleParts exchanges carry one row each.
    assert(s.broadcast >= 3, s"q68 set ops must hash-join: $s")
    assert(s.nestedLoops <= 4, s"q68 grew a real nested loop: $s")
  }

  test("q71 container metadata stays a single-scan mapPartitions pipeline") {
    val s = stats("q71_container_meta_stats")
    assert(s.scans <= 1 && s.shuffles == 0, s"q71 regressed: $s")
  }

  test("q72 profiler keeps the whole profile in one scan + one exchange") {
    val s = stats("q72_profile_lineitem")
    // singleParts carries the ONE-ROW profile/pivot exchanges (audited 4);
    // a per-column re-scan would blow scans through the ceiling.
    assert(s.scans <= 4 && s.shuffles <= 12, s"q72 must stay one-pass: $s")
  }

  test("q73 DSIR keeps the bucket models broadcast (corpus never self-joins)") {
    val s = stats("q73_dsir_resample")
    assert(s.broadcast >= 2 && s.smj == 0 && s.nestedLoops <= 2,
      s"q73 bucket-model joins must stay broadcast: $s")
    assert(s.shuffles <= 30, s"q73 shuffles regressed: $s") // audited 22
  }

  test("q74 BM25 keeps query terms/df/consts broadcast and the top-k salted") {
    val s = stats("q74_bm25_topdocs")
    assert(s.broadcast >= 4 && s.smj == 0 && s.nestedLoops <= 2,
      s"q74 postings restriction must stay broadcast: $s")
    assert(s.shuffles <= 40, s"q74 shuffles regressed: $s") // audited 31
  }

  test("q75 hybrid fusion stays a top-k-sized join over the two rankers") {
    val s = stats("q75_hybrid_search")
    // nestedLoops ≤4: the one-row consts join (q74) + the broadcast
    // query-probe loop (q19 pattern), AQE-doubled; smj ≤2 is the dls join.
    assert(s.nestedLoops <= 4 && s.smj <= 2, s"q75 regressed: $s")
    assert(s.shuffles <= 52, s"q75 shuffles regressed: $s") // audited 43
  }

  test("q76 gap-fill generates the grid per key — no global calendar join") {
    val s = stats("q76_weekly_gapfill")
    assert(s.nestedLoops == 0 && s.singleParts == 0,
      s"q76 must never cross-join a calendar or single-partition: $s")
    assert(s.scans <= 4 && s.shuffles <= 8, s"q76 regressed: $s") // audited 6
  }

  test("q77 salience joins vocab-sized totals; source totals stay broadcast") {
    val s = stats("q77_token_salience")
    assert(s.broadcast >= 2 && s.smj == 0 && s.nestedLoops <= 2,
      s"q77 totals joins must stay broadcast: $s")
    assert(s.shuffles <= 22, s"q77 shuffles regressed: $s") // audited 16
  }

  test("q78 moving windows reuse one priority-keyed sort (no extra exchange)") {
    val s = stats("q78_moving_revenue")
    assert(s.scans <= 2 && s.shuffles <= 6 && s.nestedLoops == 0 && s.singleParts == 0,
      s"q78 must stay agg + one reused window sort: $s") // audited 4
  }

  test("q79 PMI pairs join doc-keyed (work per doc², never corpus²)") {
    val s = stats("q79_pmi_pairs")
    // The pair generation must stay an equi-join on doc_id; nestedLoops≤2
    // is the one-row corpus-count crossJoin (q19-class), AQE-doubled.
    assert(s.nestedLoops <= 2 && s.smj == 0, s"q79 pair join regressed: $s")
    assert(s.shuffles <= 30, s"q79 shuffles regressed: $s") // audited 22
  }

  test("q80 classifier keeps the weight vector broadcast (inference is one agg)") {
    val s = stats("q80_quality_classifier")
    assert(s.broadcast >= 1 && s.smj == 0 && s.nestedLoops == 0,
      s"q80 weights join must stay broadcast: $s")
    assert(s.scans <= 2 && s.shuffles <= 8, s"q80 regressed: $s") // audited 6
  }

  test("q81 PageRank lineage stays one-round deep (localCheckpoint per iter)") {
    val s = stats("q81_term_pagerank")
    // Without the per-iteration checkpoint this plan grows ~10 join
    // rounds deep (the q30 lesson); the audited shape is pair-build +
    // final round + top-k only.
    assert(s.scans <= 16 && s.shuffles <= 40, s"q81 lineage regressed: $s")
    assert(s.nestedLoops == 0, s"q81 must stay equi-joined: $s")
  }

  test("q82 robust stats windows partition by key; stats joins broadcast") {
    val s = stats("q82_robust_outliers")
    assert(s.broadcast >= 2 && s.nestedLoops == 0 && s.singleParts == 0,
      s"q82 med/mad joins must broadcast, windows must stay keyed: $s")
    assert(s.shuffles <= 24, s"q82 shuffles regressed: $s") // audited 18
  }

  test("q83 source overlap self-joins on the shingle key only") {
    val s = stats("q83_source_overlap")
    assert(s.nestedLoops == 0, s"q83 must never pair sources cartesian: $s")
    assert(s.shuffles <= 24, s"q83 shuffles regressed: $s") // audited 18
  }

  test("q84 forward as-of stays a log-merge (no range nested loop)") {
    val s = stats("q84_asof_next_order")
    assert(s.nestedLoops == 0, s"q84 must not regress to a range loop: $s")
    assert(s.shuffles <= 8, s"q84 shuffles regressed: $s") // audited 4
  }

  test("q85 click chains compose two as-of log-merges, nothing quadratic") {
    val s = stats("q85_click_chains")
    assert(s.nestedLoops == 0 && s.smj == 0, s"q85 regressed: $s")
    assert(s.shuffles <= 14, s"q85 shuffles regressed: $s") // audited 10
  }

  test("q86 snapshot diff is one key-join pass (no sort, no loop)") {
    val s = stats("q86_snapshot_diff")
    assert(s.nestedLoops == 0, s"q86 must stay a single equi-join diff: $s")
    assert(s.scans <= 6 && s.shuffles <= 10, s"q86 regressed: $s") // audited 4/6
  }

  test("q87 FK audit: every edge anti-checks via hash joins, never a loop") {
    val s = stats("q87_fk_audit")
    // nestedLoops ≤12 are the six ONE-ROW crossJoins pairing each edge's
    // two scalar aggregates (AQE prints each twice); singleParts carries
    // the same one-row exchanges. A real nested-loop on table data would
    // also blow the shuffle ceiling.
    assert(s.nestedLoops <= 12 && s.singleParts <= 24, s"q87 regressed: $s")
    assert(s.broadcast >= 6, s"q87 dim joins must broadcast: $s")
  }

  test("q88 ranking windows reuse one source-keyed sort") {
    val s = stats("q88_quality_ranks")
    assert(s.scans <= 2 && s.shuffles <= 4 && s.nestedLoops == 0 && s.singleParts == 0,
      s"q88 must stay one keyed window pass: $s") // audited 2
  }

  test("q46 tf-idf broadcasts the term dictionary and the doc count") {
    val s = stats("q46_tfidf_terms")
    // nestedLoops == 2 is the intended single-row doc-count cross join
    // (the q19 pattern); the df join must stay a broadcast hash join.
    assert(s.broadcast >= 1 && s.smj == 0 && s.nestedLoops <= 2,
      s"q46 dictionary join must stay broadcast: $s")
    assert(s.shuffles <= 20, s"q46 shuffles regressed: $s")
  }

  test("q97 CMS builds one sketch row and probes it broadcast") {
    val s = stats("q97_cms_shingle_counts")
    // nestedLoops ≤ 2 is the intended ONE-ROW sketch crossJoin (the
    // q19/q46 single-row broadcast pattern — AQE prints it twice); a
    // real pair blowup would also blow the scan/shuffle ceilings.
    assert(s.nestedLoops <= 2 && s.scans <= 4 && s.shuffles <= 10,
      s"q97 regressed: $s") // audited 3 scans / 8 shuffles
  }

  test("q98 KMV pair estimates never rejoin the corpus") {
    val s = stats("q98_kmv_source_overlap")
    // The pairwise stage works over 20 sketch rows: corpus scans stay
    // bounded by the two sketch-build branches.
    assert(s.scans <= 4, s"q98 must compute pair stats from sketches alone: $s")
    assert(s.smj == 0, s"q98 regressed: $s")
  }

  test("q99 OLS trend is one keyed window + one hash aggregation") {
    val s = stats("q99_revenue_trend")
    assert(s.broadcast >= 1, s"q99 customer dim must broadcast: $s")
    assert(s.shuffles <= 6 && s.nestedLoops == 0 && s.singleParts == 0,
      s"q99 must stay sums-only: $s") // audited 4
  }

  test("q100 priority sample is a partial top-k, not a global sort") {
    val df = Registry.all.find(_.name == "q100_priority_sample").get.run(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q100 must select via partial top-k; plan:\n${plan.take(2000)}")
    val s = Explain.audit(df)
    assert(s.scans <= 2, s"q100 regressed: $s")
  }

  test("q101 skew profile: aggregations only, top-10 via partial top-k") {
    val df = Registry.all.find(_.name == "q101_key_skew").get.run(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q101 top-10 must be a partial top-k; plan:\n${plan.take(2000)}")
    val s = Explain.audit(df)
    assert(s.nestedLoops <= 8 && s.smj == 0,
      s"q101 must stay hash aggregations + one-row joins: $s")
  }

  test("q105/q107 rank statistics stay one aggregate + keyed windows") {
    Seq("q105_spearman_rank_corr", "q107_mann_whitney").foreach { name =>
      val s = stats(name)
      assert(s.broadcast >= 1, s"$name customer dim must broadcast: $s")
      assert(s.shuffles <= 12 && s.nestedLoops == 0 && s.singleParts == 0,
        s"$name regressed: $s") // audited 6 / 4 shuffles
    }
  }

  test("q106 triangles keep the co-occurrence derivation checkpointed") {
    // Pre-fix this plan re-derived the corpus pipeline per edge-list
    // reference: 542 shuffles / 189 scans. Post-fix: 28 / 0.
    val s = stats("q106_term_triangles")
    assert(s.shuffles <= 60, s"q106 lineage must stay truncated: $s")
    assert(s.scans <= 4, s"q106 must not re-derive the corpus: $s")
  }

  test("q108/q111 grid statistics checkpoint their count tables") {
    // Intended nested loops: broadcast one-row/cross frames (pair grids).
    val s8 = stats("q108_source_divergence")
    assert(s8.shuffles <= 60 && s8.scans <= 4, s"q108 regressed: $s8")
    val s11 = stats("q111_chi_square")
    assert(s11.shuffles <= 40 && s11.scans <= 4, s"q111 regressed: $s11")
  }

  test("q109/q113 corpus text passes stay scan+aggregate shaped") {
    val s9 = stats("q109_source_diversity")
    assert(s9.shuffles <= 12 && s9.nestedLoops == 0 && s9.singleParts == 0,
      s"q109 regressed: $s9") // audited 6
    val s13 = stats("q113_skipgram_pairs")
    assert(s13.shuffles <= 8 && s13.nestedLoops == 0,
      s"q113 window join must stay equi-shaped: $s13") // audited 4
  }

  test("q114 lead-lag stays a days-sized lag join (lags broadcast)") {
    val s = stats("q114_lead_lag_corr")
    // The lag table rides a broadcast nested loop by design (8 rows).
    assert(s.shuffles <= 20 && s.smj == 0, s"q114 regressed: $s")
  }

  test("q115 containment join stays an exact equi-join (no pair blowup)") {
    val s = stats("q115_containment_join")
    // Prefix-probe ⋈ posting-list is an equi-join on token; the n² pair
    // space must never appear as a nested loop. Audited 9 scans / 12
    // shuffles at sf0.001.
    assert(s.nestedLoops == 0, s"q115 must stay prefix-filtered: $s")
    assert(s.scans <= 20 && s.shuffles <= 24, s"q115 regressed: $s")
  }

  test("q116 KS drift collapses the corpus once, then works on the value grid") {
    val s = stats("q116_ks_drift")
    // The counts aggregate is localCheckpointed (scans=0 downstream);
    // the only intended nested loops are broadcast tiny frames (segment
    // list, one-row total), and singleParts windows sort the distinct-
    // value axis, not rows. Audited 28 shuffles / 4 NLJ / 4 singleParts.
    assert(s.scans <= 4, s"q116 must not re-derive the corpus: $s")
    assert(s.nestedLoops <= 6 && s.singleParts <= 6 && s.shuffles <= 56,
      s"q116 regressed: $s")
  }

  test("q117 PQ-ADC scans codes, broadcasts query LUTs, never a corpus NLJ") {
    val s = stats("q117_knn_pq_adc")
    // The only nested loops are the broadcast query-set joins (the q19
    // convention: LUT rows + re-rank queries, both user-sized). Audited
    // 4 scans / 4 shuffles / 2 NLJ at sf0.001.
    assert(s.nestedLoops <= 4, s"q117 corpus-sized join appeared: $s")
    assert(s.scans <= 8 && s.shuffles <= 8 && s.singleParts == 0,
      s"q117 regressed: $s")
  }

  test("q118 covariance stays one scan + one hash aggregation") {
    val s = stats("q118_embedding_covariance")
    // Map-side combine collapses each partition to ≤2,080 rows before the
    // exchange; nothing corpus-sized ever shuffles. Audited 2 scans /
    // 2 shuffles at sf0.001.
    assert(s.scans <= 4 && s.shuffles <= 4 && s.nestedLoops == 0 &&
      s.singleParts == 0, s"q118 regressed: $s")
  }

  test("q119 boilerplate coverage stays window equi-joins (no pair space)") {
    val s = stats("q119_boilerplate_coverage")
    // Windows join the flagged-window table on the window text — never a
    // doc×doc pair join. Audited 6 scans / 12 shuffles / 0 NLJ at sf0.001.
    assert(s.nestedLoops == 0, s"q119 regressed to a pair join: $s")
    assert(s.scans <= 12 && s.shuffles <= 24 && s.singleParts == 0,
      s"q119 regressed: $s")
  }

  test("q120 sliding WAU stays one scan + linear aggregates (no calendar join)") {
    val s = stats("q120_sliding_wau")
    // Audited 2 scans / 6 shuffles at sf0.001: distinct user-days,
    // explode, one dual-distinct aggregate; no join anywhere.
    assert(s.scans <= 4 && s.shuffles <= 12 && s.nestedLoops == 0 &&
      s.smj == 0 && s.singleParts == 0, s"q120 regressed: $s")
  }

  test("q121 gap profile reuses one user partitioning, no global sort") {
    val s = stats("q121_interarrival_bots")
    // Audited 3 scans / 6 shuffles at sf0.001: lag window + two rollups,
    // all keyed by user_id.
    assert(s.scans <= 6 && s.shuffles <= 12 && s.nestedLoops == 0 &&
      s.singleParts == 0, s"q121 regressed: $s")
  }

  test("q122 join forecast never materializes a joined row") {
    val s = stats("q122_join_cardinality")
    // Degree tables meet in keys-sized SMJ/hash joins; audited 7 scans /
    // 12 shuffles / 4 SMJ at sf0.001. The forecast must stay free of
    // corpus-sized joins: no nested loops, no single-partition funnels.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q122 regressed: $s")
    assert(s.scans <= 10 && s.shuffles <= 24, s"q122 regressed: $s")
  }

  test("q123 layout advisor is one corpus aggregate, pivoted in-plan") {
    val s = stats("q123_layout_advisor")
    // Audited 2 scans / 6 shuffles / 2 single-partition exchanges at
    // sf0.001 — the singleParts are the global one-row aggregate itself
    // (inherent and 1-row-sized), NOT a corpus funnel.
    assert(s.scans <= 4 && s.shuffles <= 12 && s.nestedLoops == 0,
      s"q123 regressed: $s")
    assert(s.singleParts <= 4, s"q123 must not re-execute per column: $s")
  }

  test("q124 novelty is explode + keyed aggregates, never a pair join") {
    val s = stats("q124_ngram_novelty")
    // Audited 4 scans / 8 shuffles at sf0.001. Novelty is a property of
    // the shingle->first-doc map: no doc-pair space may appear.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q124 regressed: $s")
    assert(s.scans <= 8 && s.shuffles <= 16, s"q124 regressed: $s")
  }

  test("q125 hard negatives stays a broadcast query-set scoring pass") {
    val s = stats("q125_hard_negatives")
    // The =!= self-exclusion makes the broadcast join a BNLJ by
    // construction (same audited shape as q19: one-row/query-set
    // broadcast, corpus streamed once per side of the planted union).
    assert(s.nestedLoops <= 2 && s.smj == 0, s"q125 regressed: $s")
    assert(s.scans <= 8 && s.shuffles <= 8 && s.singleParts == 0,
      s"q125 regressed: $s")
  }

  test("q126 attribution is a log-merge window, never an event self-join") {
    val s = stats("q126_touch_attribution")
    // Audited 2 scans / 4 shuffles at sf0.001: one user-keyed window pass
    // computes both as-of touches, then a days-sized rollup.
    assert(s.nestedLoops == 0 && s.smj == 0 && s.singleParts == 0,
      s"q126 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 8, s"q126 regressed: $s")
  }

  test("q127 seasonality is scan + 7-group aggregate + tiny window") {
    val s = stats("q127_weekday_seasonality")
    // Audited 2 scans / 4 shuffles / 2 single-partition exchanges at
    // sf0.001 — the singleParts carry the 7-ROW weekday frame for the
    // week-total window, not corpus data.
    assert(s.scans <= 4 && s.shuffles <= 8 && s.nestedLoops == 0,
      s"q127 regressed: $s")
    assert(s.singleParts <= 4, s"q127 single-partition use must stay 7-row-sized: $s")
  }

  test("q128 winnowing stays a doc-keyed window pass, never a pair space") {
    val s = stats("q128_winnow_fingerprints")
    // Audited 7 scans / 14 shuffles at sf0.001 (the fingerprint relation
    // feeds three aggregates; a deployment would persist it). The hard
    // invariants: no doc-pair join, no global sort.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q128 regressed: $s")
    assert(s.scans <= 14 && s.shuffles <= 28, s"q128 regressed: $s")
  }

  test("q129 split leakage rides one aggregate over one LSH pair DAG") {
    val s = stats("q129_split_leakage")
    // Audited 9 scans / 20 shuffles at sf0.001 — the endpoint explode +
    // single multi-distinct aggregate keeps the banded pair DAG evaluated
    // once (the naive counts/ends branches replicated it to 33/80).
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q129 regressed: $s")
    assert(s.scans <= 18 && s.shuffles <= 40, s"q129 regressed: $s")
  }

  test("q131 embargo split is scan + 3-group agg; NLJs are the one-row max-date broadcast") {
    val s = stats("q131_embargo_split")
    // Audited 4 scans / 6 shuffles / 2 one-row BNLJs (the max-date scalar
    // cross join — the same documented one-row-broadcast shape as q19).
    assert(s.nestedLoops <= 3 && s.singleParts <= 4, s"q131 regressed: $s")
    assert(s.scans <= 8 && s.shuffles <= 12, s"q131 regressed: $s")
  }

  test("q132 grouped top-k stays a two-phase aggregate, never a window sort") {
    val s = stats("q132_topk_supplier_items")
    // Audited 2 scans / 2 shuffles: partial ObjectHashAggregate ships ≤k
    // rows per (task, group); TopKSpec separately pins no-Window.
    assert(s.scans <= 4 && s.shuffles <= 4, s"q132 regressed: $s")
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q132 regressed: $s")
  }

  test("q133 pareto frontier stays a level-sweep window, never the quadratic NOT EXISTS") {
    val s = stats("q133_pareto_frontier")
    // Audited 2 scans / 6 shuffles: price-level aggregate + brand-keyed
    // running-max window; the O(n²) anti-join form must never reappear.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q133 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 12, s"q133 regressed: $s")
  }

  test("q134 cdc chunking is explode + doc-keyed windows + hash joins, no pair space") {
    val s = stats("q134_cdc_chunks")
    // Audited 5 scans / 11 shuffles at sf0.001: the chunk relation feeds
    // the per-doc and cross-doc aggregates; shuffle keys are md5 hashes.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q134 regressed: $s")
    assert(s.scans <= 10 && s.shuffles <= 22, s"q134 regressed: $s")
  }

  test("q135 pr curve windows ride the score-level table, not the corpus") {
    val s = stats("q135_pr_curve")
    // Audited 2 scans / 4 shuffles / 2 single-partition exchanges — the
    // singleParts carry the distinct-score LEVEL table (value-space
    // bounded; continuous scores get quantile-bucketed first).
    assert(s.nestedLoops == 0, s"q135 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 8 && s.singleParts <= 4,
      s"q135 regressed: $s")
  }

  test("q136 decayed revenue keeps the q03 join shape; decay adds no shuffle") {
    val s = stats("q136_decayed_revenue")
    // Audited 8 scans / 10 shuffles / 2 one-row BNLJs (max-date scalar).
    assert(s.nestedLoops <= 3 && s.smj == 0, s"q136 regressed: $s")
    assert(s.scans <= 16 && s.shuffles <= 20 && s.singleParts <= 4,
      s"q136 regressed: $s")
  }

  test("q137 vocab growth rides the checkpoint table, not a corpus window") {
    val s = stats("q137_vocab_growth")
    // Audited 4 scans / 12 shuffles / 2 singleParts (the checkpoint-table
    // cumulative window — corpus_size/50 rows, never the corpus).
    assert(s.nestedLoops == 0, s"q137 regressed: $s")
    assert(s.scans <= 8 && s.shuffles <= 24 && s.singleParts <= 4,
      s"q137 regressed: $s")
  }

  test("q138 quantile normalization: interval lookup stays broadcast against the level table") {
    val s = stats("q138_quantile_norm")
    // Audited 6 scans / 12 shuffles / 4 BNLJs — the BNLJs are the
    // broadcast rank→value interval join (value-space bounded) and the
    // one-row N scalar; group ranks are source-keyed windows.
    assert(s.nestedLoops <= 6 && s.smj == 0, s"q138 regressed: $s")
    assert(s.scans <= 12 && s.shuffles <= 24 && s.singleParts <= 8,
      s"q138 regressed: $s")
  }

  test("q139 session MRR reuses the q32 user-keyed window pass") {
    val s = stats("q139_session_mrr")
    // Audited 2 scans / 4 shuffles: gaps-and-islands + position windows
    // ride one user partitioning; the cohort aggregate is 5 groups.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q139 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 8, s"q139 regressed: $s")
  }

  test("q140 assoc rules: basket self-join bounded by session type sets") {
    val s = stats("q140_session_assoc_rules")
    // Audited 8 scans / 24 shuffles: the pair join is an equi-join on the
    // session id over ≤|types| rows per session — never an event-level
    // pair space; the 2 NLJs/singleParts are the ONE-ROW session-count
    // scalar broadcast (the review fix that removed the eager count job).
    assert(s.nestedLoops <= 3 && s.singleParts <= 4, s"q140 regressed: $s")
    assert(s.scans <= 16 && s.shuffles <= 48, s"q140 regressed: $s")
  }

  test("q141 capped balance is one user-keyed window pass (no imperative fold)") {
    val s = stats("q141_capped_balance")
    // Audited 2 scans / 2 shuffles: the prefix-min identity turns the
    // sequential max(0, bal+d) fold into windows + one aggregate.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q141 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 4, s"q141 regressed: $s")
  }

  test("q143 cohort LTV: cumulative axis rides the cohort-age table") {
    val s = stats("q143_cohort_ltv")
    // Audited 6 scans / 16 shuffles; the cumulative window partitions by
    // cohort over the weeks-sized (cohort × age) table.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q143 regressed: $s")
    assert(s.scans <= 12 && s.shuffles <= 32, s"q143 regressed: $s")
  }

  test("q144 dedup savings keeps the q30 clustering shape + token aggregates") {
    val s = stats("q144_dedup_savings")
    // Audited 8 scans / 7 shuffles (clustering labels pre-materialized,
    // the returned plan is joins + two per-source aggregates).
    assert(s.nestedLoops == 0, s"q144 regressed: $s")
    assert(s.scans <= 16 && s.shuffles <= 14, s"q144 regressed: $s")
  }

  test("q145 weighted median windows ride the price-level table") {
    val s = stats("q145_weighted_median")
    // Audited 2 scans / 4 shuffles — level aggregate + two group-keyed
    // windows over the value-space-bounded level table.
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q145 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 8, s"q145 regressed: $s")
  }

  test("q146 position attribution enumerates touches via a user-keyed join only") {
    val s = stats("q146_position_attribution")
    // Audited 10 scans / 15 shuffles; the touch join is user-keyed with
    // the lookback bound as residual — never a time-range nested loop.
    assert(s.nestedLoops == 0, s"q146 regressed: $s")
    assert(s.scans <= 20 && s.shuffles <= 30 && s.singleParts <= 4,
      s"q146 regressed: $s")
  }

  test("q147 SQL grouping sets plan like their DataFrame cousins (broadcast dims, expand+agg)") {
    val s = stats("q147_sql_grouping_sets")
    assert(s.broadcast >= 2 && s.nestedLoops == 0, s"q147 regressed: $s")
    assert(s.scans <= 12 && s.shuffles <= 12 && s.singleParts == 0,
      s"q147 regressed: $s")
  }

  test("q148 method eval keeps both pair pipelines index-joined") {
    val s = stats("q148_dedup_method_eval")
    // The 2 NLJs are the 4-row threshold table and one-row totals —
    // q19-class; neither pair pipeline may regress to all-pairs.
    assert(s.nestedLoops <= 4, s"q148 regressed: $s")
    assert(s.scans <= 20 && s.shuffles <= 48, s"q148 regressed: $s")
  }

  test("q149/q150 stay scan + broadcast-scalar + aggregate shapes") {
    val s149 = stats("q149_period_movers")
    assert(s149.nestedLoops <= 3 && s149.smj == 0, s"q149 regressed: $s149")
    assert(s149.scans <= 16 && s149.shuffles <= 24 && s149.singleParts <= 8,
      s"q149 regressed: $s149")
    val s150 = stats("q150_sla_aging")
    assert(s150.nestedLoops <= 3 && s150.smj == 0, s"q150 regressed: $s150")
    assert(s150.scans <= 8 && s150.shuffles <= 12 && s150.singleParts <= 4,
      s"q150 regressed: $s150")
  }

  test("q151/q152 RFM + PIT panel stay customer-rollup shapes") {
    val s151 = stats("q151_rfm_segments")
    // The rank windows order the CUSTOMERS-sized rollup (singleParts are
    // that table, never the fact scan); the NLJs are the one-row max-date
    // scalar.
    assert(s151.nestedLoops <= 3 && s151.smj == 0, s"q151 regressed: $s151")
    assert(s151.scans <= 8 && s151.shuffles <= 16 && s151.singleParts <= 8,
      s"q151 regressed: $s151")
    val s152 = stats("q152_pit_features")
    // The snapshot grid is a 4-row broadcast; the panel join must never
    // become a range self-join of the fact table.
    assert(s152.nestedLoops <= 3 && s152.smj == 0, s"q152 regressed: $s152")
    assert(s152.scans <= 8 && s152.shuffles <= 12 && s152.singleParts <= 4,
      s"q152 regressed: $s152")
  }

  test("q130 bpe pair stats collapse the corpus to vocab in one scan pass") {
    val s = stats("q130_bpe_pair_stats")
    // Audited 2 scans / 4 shuffles; the ranking window orders the
    // 26²-bounded pair table, so no corpus-sized single partition exists.
    assert(s.nestedLoops == 0, s"q130 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 8, s"q130 regressed: $s")
  }

  test("round-9 exact-candidate kernels keep PPJoin shape (q104/q115)") {
    // Audited r9: q104 21 shuffles / 9 scans, q115 22/9 — the positional
    // filters ride the candidate join; NO nested-loop pair space and no
    // SMJ (both self-join sides share one pinned token exchange and
    // broadcast at this SF).
    // r10: the inline-verify rewrite attaches the sorted hash sets to
    // the prefix rows with one doc_id equi-join — array payloads put it
    // over the broadcast threshold, so ONE SortMergeJoin is the correct
    // shape (it replaced TWO post-candidate verify joins; see
    // BASELINE.md round-10 table: 100× wall 232→75 s).
    val s104 = stats("q104_prefix_filter_join")
    assert(s104.nestedLoops == 0 && s104.smj <= 1, s"q104 regressed: $s104")
    assert(s104.scans <= 18 && s104.shuffles <= 42, s"q104 regressed: $s104")
    val s115 = stats("q115_containment_join")
    assert(s115.nestedLoops == 0 && s115.smj == 0, s"q115 regressed: $s115")
    assert(s115.scans <= 18 && s115.shuffles <= 44, s"q115 regressed: $s115")
  }

  test("round-9 relational additions stay aggregate/join-shaped (q156-q158)") {
    // q156: decorrelated Q17 — per-part agg + fact join; no correlated
    // re-scan shape (that would be a nested loop or a per-row subquery).
    val s156 = stats("q156_small_quantity_revenue")
    assert(s156.nestedLoops == 0, s"q156 regressed: $s156")
    assert(s156.scans <= 12 && s156.shuffles <= 16, s"q156 regressed: $s156")
    // q157: decorrelated Q21 — one order-keyed distinct-count aggregate
    // + join-back (the one SMJ is the order-keyed fact-fact join).
    val s157 = stats("q157_lone_late_supplier")
    assert(s157.nestedLoops == 0 && s157.smj <= 2, s"q157 regressed: $s157")
    assert(s157.scans <= 16 && s157.shuffles <= 26, s"q157 regressed: $s157")
    // q158: customer-grain agg + segment rank window + rollup.
    val s158 = stats("q158_revenue_gini")
    assert(s158.nestedLoops == 0 && s158.singleParts == 0, s"q158 regressed: $s158")
    assert(s158.scans <= 8 && s158.shuffles <= 12, s"q158 regressed: $s158")
  }

  test("round-9 text/ML additions keep corpus-linear shape (q159/q162-q164)") {
    // q159: bigram explode + model equi-join; the nestedLoops=2 is the
    // one-row vocab-count broadcast cross join (the q46 scalar shape),
    // never a doc-pair space.
    val s159 = stats("q159_bigram_xent")
    assert(s159.nestedLoops <= 3 && s159.smj == 0, s"q159 regressed: $s159")
    assert(s159.scans <= 16 && s159.shuffles <= 32, s"q159 regressed: $s159")
    // q162: two split-filtered passes + one rank window per lang.
    val s162 = stats("q162_conformal_calibration")
    assert(s162.nestedLoops == 0 && s162.singleParts == 0, s"q162 regressed: $s162")
    assert(s162.scans <= 12 && s162.shuffles <= 16, s"q162 regressed: $s162")
    // q163: user-grain aggregate + 2-row rollup; the nestedLoops=2 is
    // the one-row × one-row cohort cross join.
    val s163 = stats("q163_conversion_ztest")
    assert(s163.nestedLoops <= 3 && s163.smj == 0, s"q163 regressed: $s163")
    assert(s163.scans <= 8 && s163.shuffles <= 20, s"q163 regressed: $s163")
    // q164: one posexplode + hash aggregate, map-side-combined.
    val s164 = stats("q164_label_centroids")
    assert(s164.nestedLoops == 0 && s164.smj == 0 && s164.singleParts == 0,
      s"q164 regressed: $s164")
    assert(s164.scans <= 4 && s164.shuffles <= 8, s"q164 regressed: $s164")
  }

  test("round-9 tail additions stay scalar-broadcast + aggregate shapes (q166-q172)") {
    // Audited r9: every nestedLoops count below is the one-row scalar
    // broadcast cross join (q136 shape) — cutoff dates, corpus totals —
    // never a row-pair space; singleParts are one-row scalar frames or
    // metadata-sized windows.
    val s166 = stats("q166_dormant_customers")
    assert(s166.nestedLoops <= 4 && s166.smj == 0, s"q166 regressed: $s166")
    assert(s166.scans <= 20 && s166.shuffles <= 28, s"q166 regressed: $s166")
    val s168 = stats("q168_market_share")
    assert(s168.nestedLoops == 0 && s168.smj == 0, s"q168 must broadcast all five dims: $s168")
    assert(s168.scans <= 28 && s168.shuffles <= 28, s"q168 regressed: $s168")
    val s169 = stats("q169_bag_setops")
    assert(s169.nestedLoops <= 6, s"q169 regressed: $s169")
    assert(s169.scans <= 14 && s169.shuffles <= 26, s"q169 regressed: $s169")
    val s170 = stats("q170_image_phash_pairs")
    assert(s170.nestedLoops == 0 && s170.singleParts == 0,
      s"q170 must stay hash-bucketed, never all-pairs: $s170")
    assert(s170.scans <= 8 && s170.shuffles <= 8, s"q170 regressed: $s170")
    val s171 = stats("q171_audio_hash_pairs")
    assert(s171.nestedLoops == 0 && s171.singleParts == 0,
      s"q171 must stay hash-bucketed, never all-pairs: $s171")
    assert(s171.scans <= 8 && s171.shuffles <= 8, s"q171 regressed: $s171")
    val s172 = stats("q172_markov_holdout")
    assert(s172.nestedLoops <= 6 && s172.smj == 0, s"q172 regressed: $s172")
    assert(s172.scans <= 12 && s172.shuffles <= 38, s"q172 regressed: $s172")
  }

  test("model-eval battery stays window/aggregate-shaped (q173-q179)") {
    // q173/q174: one documents scan -> per-source rank window or 10-bin
    // hash aggregate; 2 shuffles each, nothing single-partitioned.
    val s173 = stats("q173_classifier_auc")
    assert(s173.nestedLoops == 0 && s173.singleParts == 0, s"q173 regressed: $s173")
    assert(s173.scans <= 4 && s173.shuffles <= 4, s"q173 regressed: $s173")
    val s174 = stats("q174_reliability_bins")
    assert(s174.nestedLoops == 0 && s174.singleParts == 0, s"q174 regressed: $s174")
    assert(s174.scans <= 4 && s174.shuffles <= 4, s"q174 regressed: $s174")
    // q178: the global BH window runs over the hypothesis table (one row
    // per source x lang cell — metadata-sized by construction), so its
    // singleParts=2 is the documented exception, bounded here.
    val s178 = stats("q178_bh_fdr")
    assert(s178.nestedLoops == 0 && s178.singleParts <= 2, s"q178 regressed: $s178")
    assert(s178.scans <= 4 && s178.shuffles <= 8, s"q178 regressed: $s178")
    // q175: KM windows partition by segment; the nestedLoops=2 is the
    // one-row cutoff-date broadcast (q136 scalar shape).
    val s175 = stats("q175_survival_curve")
    assert(s175.nestedLoops <= 2 && s175.smj == 0, s"q175 regressed: $s175")
    assert(s175.scans <= 12 && s175.shuffles <= 28, s"q175 regressed: $s175")
    // q176/q177: fact agg -> per-key window lags; zero NLJ, zero SMJ.
    val s176 = stats("q176_ewma_forecast")
    assert(s176.nestedLoops == 0 && s176.smj == 0 && s176.singleParts == 0,
      s"q176 regressed: $s176")
    assert(s176.scans <= 12 && s176.shuffles <= 16, s"q176 regressed: $s176")
    val s177 = stats("q177_cusum_drift")
    assert(s177.nestedLoops == 0 && s177.smj == 0 && s177.singleParts == 0,
      s"q177 regressed: $s177")
    assert(s177.scans <= 8 && s177.shuffles <= 12, s"q177 regressed: $s177")
    // q179: the one SMJ is the weekly-table self-join — calendar-bounded
    // rows, never fact data (the scale argument lives in the operator doc).
    val s179 = stats("q179_kendall_tau")
    assert(s179.nestedLoops == 0 && s179.smj <= 2, s"q179 regressed: $s179")
    assert(s179.scans <= 18 && s179.shuffles <= 28, s"q179 regressed: $s179")
  }

  test("policy/split/masking additions stay scan+aggregate shaped (q180-q182)") {
    // q180: events scan + 5-row broadcast action index + one keyed agg;
    // singleParts=2 is the k-row index window (metadata-sized).
    val s180 = stats("q180_offline_policy")
    assert(s180.nestedLoops == 0 && s180.smj == 0 && s180.singleParts <= 2,
      s"q180 regressed: $s180")
    assert(s180.scans <= 8 && s180.shuffles <= 16, s"q180 regressed: $s180")
    // q181: one scan, one hash aggregate — fold assignment is a projection.
    val s181 = stats("q181_group_kfold")
    assert(s181.nestedLoops == 0 && s181.singleParts == 0, s"q181 regressed: $s181")
    assert(s181.scans <= 4 && s181.shuffles <= 8, s"q181 regressed: $s181")
    // q182: token-position explode + doc-keyed agg; masking is stateless.
    val s182 = stats("q182_span_corruption")
    assert(s182.nestedLoops == 0 && s182.singleParts == 0, s"q182 regressed: $s182")
    assert(s182.scans <= 4 && s182.shuffles <= 4, s"q182 regressed: $s182")
  }

  test("drift/backtest additions stay aggregate+window shaped (q183/q184)") {
    // q183: fact scan -> (segment, bin) hash agg -> segment-partitioned
    // totals window; PSI arithmetic rides the 10-bin result.
    val s183 = stats("q183_psi_drift")
    assert(s183.nestedLoops == 0 && s183.smj == 0 && s183.singleParts == 0,
      s"q183 regressed: $s183")
    assert(s183.scans <= 8 && s183.shuffles <= 12, s"q183 regressed: $s183")
    // q184: the q176 window plan + one extra lag + key-sized aggregate.
    val s184 = stats("q184_forecast_backtest")
    assert(s184.nestedLoops == 0 && s184.smj == 0 && s184.singleParts == 0,
      s"q184 regressed: $s184")
    assert(s184.scans <= 12 && s184.shuffles <= 16, s"q184 regressed: $s184")
  }

  test("drift state + matryoshka recall keep their family shapes (q185/q186)") {
    // q185 returns a checkpointed snapshot (codegen=1 in the audit — the
    // q155/q103 state-family caveat); its live plans execute inside the
    // fold, whose kernel is the gated q183 (audited above). Pin only
    // that the snapshot read stays trivially flat.
    val s185 = stats("q185_drift_state")
    assert(s185.nestedLoops == 0 && s185.shuffles == 0, s"q185 regressed: $s185")
    // q186: two q19-shaped broadcast-query kNN passes — the nestedLoops
    // are the broadcast query-probe loops (q19-class, 2 per pass),
    // never a corpus×corpus product.
    val s186 = stats("q186_matryoshka_recall")
    assert(s186.nestedLoops <= 6, s"q186 regressed: $s186")
    assert(s186.scans <= 32 && s186.shuffles <= 28, s"q186 regressed: $s186")
  }

  test("linkage/allocation/DiD additions stay blocked-join + aggregate shaped (q187-q189)") {
    // q187: one equi-join on the block key — comparators ride the join's
    // codegen stage; NEVER an all-pairs product.
    val s187 = stats("q187_record_linkage")
    assert(s187.nestedLoops == 0 && s187.smj == 0 && s187.singleParts == 0,
      s"q187 regressed: $s187")
    assert(s187.scans <= 8 && s187.shuffles <= 4, s"q187 regressed: $s187")
    // q188: fact scan -> strata aggregate; singleParts=2 is the 5-row
    // strata window (metadata-sized).
    val s188 = stats("q188_neyman_allocation")
    assert(s188.nestedLoops == 0 && s188.singleParts <= 2, s"q188 regressed: $s188")
    assert(s188.scans <= 8 && s188.shuffles <= 12, s"q188 regressed: $s188")
    // q189: 4-cell aggregate; NLJ = the one-row date-bounds broadcast
    // (q136 scalar shape); singleParts bound the 4-row estimator window.
    val s189 = stats("q189_diff_in_diff")
    assert(s189.nestedLoops <= 2 && s189.smj == 0 && s189.singleParts <= 4,
      s"q189 regressed: $s189")
    assert(s189.scans <= 16 && s189.shuffles <= 24, s"q189 regressed: $s189")
  }

  test("gain/CV/bootstrap/shrinkage additions stay aggregate shaped (q190-q193)") {
    // q190 (r10 rewrite): distributed exact ntile — distinct-score
    // offset window + per-score rank join; NLJ = the one-row tot_rows
    // broadcast (q136 scalar shape); singleParts carry ONLY aggregated
    // inputs (the dedicated containment test below proves that).
    val s190 = stats("q190_gain_chart")
    assert(s190.nestedLoops <= 2 && s190.singleParts <= 8, s"q190 regressed: $s190")
    assert(s190.scans <= 8 && s190.shuffles <= 24, s"q190 regressed: $s190")
    // q191: per-fold window sort + aggregate, the q173/q107 shape.
    val s191 = stats("q191_cv_auc")
    assert(s191.nestedLoops == 0 && s191.singleParts == 0, s"q191 regressed: $s191")
    assert(s191.scans <= 4 && s191.shuffles <= 4, s"q191 regressed: $s191")
    // q192: one scan exploded xB -> B-group aggregate; CI windows ride
    // the 100-row replicate frame (singleParts bounded).
    val s192 = stats("q192_bootstrap_ci")
    assert(s192.nestedLoops == 0 && s192.singleParts <= 2, s"q192 regressed: $s192")
    assert(s192.scans <= 4 && s192.shuffles <= 8, s"q192 regressed: $s192")
    // q193: user-grain aggregate + one-row totals broadcast (q136 scalar
    // shape — the NLJ count).
    val s193 = stats("q193_eb_shrinkage")
    assert(s193.nestedLoops <= 2 && s193.smj == 0, s"q193 regressed: $s193")
    assert(s193.scans <= 6 && s193.shuffles <= 16, s"q193 regressed: $s193")
  }

  test("seasonal adjustment + elasticity stay aggregate shaped (q194/q195)") {
    // q194: daily aggregate + 7-row broadcast index (derived from the
    // same aggregate; singleParts=2 is the 7-row index window).
    val s194 = stats("q194_seasonal_adjust")
    assert(s194.nestedLoops == 0 && s194.smj == 0 && s194.singleParts <= 2,
      s"q194 regressed: $s194")
    assert(s194.scans <= 8 && s194.shuffles <= 20, s"q194 regressed: $s194")
    // q195: fact scan + broadcast part dim -> per-brand q99 aggregate.
    val s195 = stats("q195_price_elasticity")
    assert(s195.nestedLoops == 0 && s195.smj == 0 && s195.singleParts == 0,
      s"q195 regressed: $s195")
    assert(s195.scans <= 8 && s195.shuffles <= 8, s"q195 regressed: $s195")
  }

  test("TWAP/standardization/SLA additions stay aggregate+window shaped (q196-q198)") {
    val s196 = stats("q196_twap_vwap")
    assert(s196.nestedLoops == 0 && s196.smj == 0 && s196.singleParts == 0,
      s"q196 regressed: $s196")
    assert(s196.scans <= 8 && s196.shuffles <= 12, s"q196 regressed: $s196")
    val s197 = stats("q197_standardized_rates")
    assert(s197.nestedLoops == 0 && s197.smj == 0 && s197.singleParts == 0,
      s"q197 regressed: $s197")
    assert(s197.scans <= 8 && s197.shuffles <= 16, s"q197 regressed: $s197")
    val s198 = stats("q198_sla_p95_trend")
    assert(s198.nestedLoops == 0 && s198.singleParts == 0, s"q198 regressed: $s198")
    assert(s198.scans <= 8 && s198.shuffles <= 8, s"q198 regressed: $s198")
  }

  test("WOE/IV + curation funnel stay kernel-composed shapes (q199/q200)") {
    // q199: one scan -> 10-bin aggregate; singleParts=2 is the bin-frame
    // totals window (metadata-sized, the q178 exception).
    val s199 = stats("q199_woe_iv")
    assert(s199.nestedLoops == 0 && s199.singleParts <= 2, s"q199 regressed: $s199")
    assert(s199.scans <= 4 && s199.shuffles <= 8, s"q199 regressed: $s199")
    // q200: the q15 fingerprint shuffle + the q50 per-language window +
    // a sources rollup; dims broadcast, no pair space, no global funnel.
    val s200 = stats("q200_curation_funnel")
    assert(s200.nestedLoops == 0 && s200.smj == 0 && s200.singleParts == 0,
      s"q200 regressed: $s200")
    assert(s200.scans <= 16 && s200.shuffles <= 48, s"q200 regressed: $s200")
  }

  test("SPRT + kappa additions stay aggregate shaped (q201/q202)") {
    // q201: events scan -> day-grain aggregate -> one calendar-bounded
    // prefix window (singleParts = that trace window, days-sized).
    val s201 = stats("q201_sprt_trace")
    assert(s201.nestedLoops == 0 && s201.singleParts <= 2, s"q201 regressed: $s201")
    assert(s201.scans <= 4 && s201.shuffles <= 8, s"q201 regressed: $s201")
    // q202: the q50 window + the q80 explode/broadcast-model plans joined
    // on doc_id -> one 4-cell aggregate (singleParts = the 1-row cell frame).
    val s202 = stats("q202_rater_kappa")
    assert(s202.nestedLoops == 0 && s202.smj == 0 && s202.singleParts <= 2,
      s"q202 regressed: $s202")
    assert(s202.scans <= 8 && s202.shuffles <= 24, s"q202 regressed: $s202")
  }

  test("Theil-Sen + MI additions stay bounded-frame shaped (q203/q204)") {
    // q203: one checkpointed weekly aggregate (scans=0 post-checkpoint)
    // -> broadcast self pair-join over the calendar-bounded frame ->
    // per-segment rank window. The pair join must stay a broadcast HASH
    // join on the segment key (never a nested loop), and no global
    // single-partition funnel exists.
    val s203 = stats("q203_theilsen_trend")
    assert(s203.nestedLoops == 0 && s203.singleParts <= 2,
      s"q203 regressed: $s203")
    assert(s203.broadcast >= 2 && s203.shuffles <= 16,
      s"q203 regressed: $s203")
    // q204: one scan -> R*C cells aggregate; singleParts=2 is the
    // cells-frame total windows (metadata-sized, the q178 exception).
    val s204 = stats("q204_source_lang_mi")
    assert(s204.nestedLoops == 0 && s204.singleParts <= 3,
      s"q204 regressed: $s204")
    assert(s204.scans <= 4 && s204.shuffles <= 8, s"q204 regressed: $s204")
  }

  test("ANOVA + log-rank additions stay aggregate shaped (q205/q206)") {
    // q205: fact scan + broadcast dim -> k-group aggregate -> one k-row
    // fold; singleParts=2 is the k-row finisher.
    val s205 = stats("q205_spend_anova")
    assert(s205.nestedLoops == 0 && s205.singleParts <= 2,
      s"q205 regressed: $s205")
    assert(s205.scans <= 8 && s205.shuffles <= 8, s"q205 regressed: $s205")
    // q206: per-subject lifetime aggregate + one-row cutoff broadcast
    // (the q189 scalar-bound NLJ exception) -> calendar-bounded global
    // time windows (the q178 single-partition exception) -> 1-row fold.
    val s206 = stats("q206_logrank_test")
    assert(s206.nestedLoops <= 2 && s206.singleParts <= 4,
      s"q206 regressed: $s206")
    assert(s206.scans <= 12 && s206.shuffles <= 28, s"q206 regressed: $s206")
  }

  test("session nDCG rides the one user-keyed window pass (q207)") {
    val s207 = stats("q207_session_ndcg")
    assert(s207.nestedLoops == 0 && s207.singleParts == 0,
      s"q207 regressed: $s207")
    assert(s207.scans <= 4 && s207.shuffles <= 8, s"q207 regressed: $s207")
  }

  test("round-10 additions stay aggregate/broadcast shaped (q208/q209)") {
    // q208: corpus scan -> three chained map-side-combined hash aggs
    // (token counts -> frequency-of-frequencies -> source rollup); no
    // window, no sort, no pair space.
    val s208 = stats("q208_good_turing")
    assert(s208.nestedLoops == 0 && s208.singleParts == 0,
      s"q208 regressed: $s208")
    assert(s208.scans <= 2 && s208.shuffles <= 6, s"q208 regressed: $s208")
    // q209: filtered kNN — the equality filter IS the join key; the
    // query side broadcasts, ranking rides per-query window partitions.
    val s209 = stats("q209_filtered_knn")
    assert(s209.nestedLoops == 0 && s209.broadcast >= 1 &&
      s209.singleParts == 0, s"q209 regressed: $s209")
    assert(s209.scans <= 4 && s209.shuffles <= 4, s"q209 regressed: $s209")
  }

  test("q210 bucket quota sample: broadcast markers, no corpus funnel") {
    // The whole point of the operator: exact per-stratum quota selection
    // with NO per-stratum corpus sort — both marker joins broadcast, the
    // only windows run over the bucket-count table and the boundary
    // slice, and nothing single-partitions.
    val s = stats("q210_bucket_quota_sample")
    assert(s.broadcast >= 2, s"q210 marker joins must broadcast: $s")
    assert(s.nestedLoops == 0 && s.singleParts == 0 && s.smj == 0,
      s"q210 regressed: $s")
    // Audited: scans=3 shuffles=6 broadcast=3 (the marker localCheckpoint
    // keeps the corpus at exactly 3 passes: bucket-count, whole, boundary).
    assert(s.scans <= 6 && s.shuffles <= 12, s"q210 shuffles regressed: $s")
  }

  test("q212 Brier decomposition stays a bin-frame aggregate") {
    // Audited: scans=2 shuffles=4 singleParts=0 — corpus scan → (source,
    // bin) hash agg, then windows/rollup over the ≤10-bins-per-source
    // frame only.
    val s = stats("q212_brier_decomposition")
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q212 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 8, s"q212 regressed: $s")
  }

  test("q213 threshold sweep: 10-bin frame only past the first aggregate") {
    // Audited: scans=2 shuffles=4 singleParts=2 — the SinglePartition
    // exchanges carry the ≤10-row bin frame (the q199 precedent), never
    // the corpus.
    val s = stats("q213_threshold_sweep")
    assert(s.nestedLoops == 0 && s.singleParts <= 4, s"q213 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 8, s"q213 regressed: $s")
  }

  test("q214 Kruskal-Wallis: domain-frame windows, corpus scanned once") {
    // Audited: scans=0 (the one corpus aggregate materializes behind a
    // localCheckpoint), shuffles=10, singleParts=3 — the single-partition
    // exchanges carry the whole-dollar VALUE-DOMAIN frame (price-bounded
    // at any corpus scale), never corpus rows.
    val s = stats("q214_kruskal_wallis")
    assert(s.nestedLoops == 0 && s.singleParts <= 6, s"q214 regressed: $s")
    assert(s.scans <= 2 && s.shuffles <= 16, s"q214 regressed: $s")
  }

  test("q215/q216 stay single-aggregate shaped") {
    // q215 McNemar: one corpus scan -> source hash agg; no windows.
    val s215 = stats("q215_mcnemar_paired")
    assert(s215.nestedLoops == 0 && s215.singleParts == 0,
      s"q215 regressed: $s215")
    assert(s215.scans <= 3 && s215.shuffles <= 4, s"q215 regressed: $s215")
    // q216 mixture weights: corpus scan -> source agg -> sources-frame
    // windows (singleParts carry source cardinality only).
    val s216 = stats("q216_mixture_weights")
    assert(s216.nestedLoops == 0 && s216.singleParts <= 4,
      s"q216 regressed: $s216")
    assert(s216.scans <= 3 && s216.shuffles <= 6, s"q216 regressed: $s216")
  }

  test("q217/q218 decile tables inherit the distributed-ntile shape") {
    // Both ride ModelEval.distributedNtile (the q190 machinery, deep-
    // checked by the q190 corpus-single-partition test): NLJs are the
    // one-row tot broadcast; singleParts carry the distinct-score frame
    // and the 10-row decile frame.
    for (q <- Seq("q217_lorenz_deciles", "q218_qini_uplift")) {
      val s = stats(q)
      assert(s.nestedLoops <= 2 && s.singleParts <= 8, s"$q regressed: $s")
      assert(s.scans <= 6 && s.shuffles <= 24, s"$q regressed: $s")
    }
  }

  test("q219/q220 stay aggregate shaped") {
    // q219 Chao1: the q208 three-chained-hash-agg shape; no windows.
    val s219 = stats("q219_chao1_richness")
    assert(s219.nestedLoops == 0 && s219.singleParts == 0,
      s"q219 regressed: $s219")
    assert(s219.scans <= 3 && s219.shuffles <= 8, s"q219 regressed: $s219")
    // q220 runs test: the q177 per-group calendar-bounded window shape.
    val s220 = stats("q220_runs_test")
    assert(s220.nestedLoops == 0 && s220.singleParts == 0,
      s"q220 regressed: $s220")
    assert(s220.scans <= 6 && s220.shuffles <= 8, s"q220 regressed: $s220")
  }

  test("q221/q222 stay aggregate/vocab-window shaped") {
    // q221 Cochran-Armitage: scan -> k-category agg -> k-row frame
    // windows (singleParts carry <= k rows).
    val s221 = stats("q221_cochran_armitage")
    assert(s221.nestedLoops == 0 && s221.singleParts <= 4,
      s"q221 regressed: $s221")
    assert(s221.scans <= 3 && s221.shuffles <= 6, s"q221 regressed: $s221")
    // q222 coverage curve: the q211 per-source vocab-window shape —
    // no single-partition exchange anywhere.
    val s222 = stats("q222_coverage_curve")
    assert(s222.nestedLoops == 0 && s222.singleParts == 0,
      s"q222 regressed: $s222")
    assert(s222.scans <= 3 && s222.shuffles <= 6, s"q222 regressed: $s222")
  }

  test("q224/q225 stay aggregate shaped") {
    // q224 Holm: the q178 metadata-window shape (hypotheses frame only).
    val s224 = stats("q224_holm_fwer")
    assert(s224.nestedLoops == 0 && s224.singleParts <= 4,
      s"q224 regressed: $s224")
    assert(s224.scans <= 3 && s224.shuffles <= 6, s"q224 regressed: $s224")
    // q225 dedup growth: one fp-grain agg + 1-row stack (singleParts
    // carry the one rollup row).
    val s225 = stats("q225_dedup_growth")
    assert(s225.nestedLoops == 0 && s225.singleParts <= 4,
      s"q225 regressed: $s225")
    assert(s225.scans <= 3 && s225.shuffles <= 6, s"q225 regressed: $s225")
  }

  test("q226 CMH stays strata-frame shaped") {
    val s = stats("q226_cmh_stratified")
    assert(s.nestedLoops == 0 && s.singleParts <= 4, s"q226 regressed: $s")
    assert(s.scans <= 3 && s.shuffles <= 6, s"q226 regressed: $s")
  }

  test("q232 Jonckheere: grid windows, never a pair join") {
    // NLJs are the (domain x k) grid crossJoin + one-row sum broadcasts;
    // singleParts carry domain frames (the q214 rationale); scans=0
    // behind the localCheckpointed cells.
    val s = stats("q232_jonckheere")
    assert(s.nestedLoops <= 6 && s.singleParts <= 8, s"q232 regressed: $s")
    assert(s.scans <= 3 && s.shuffles <= 30, s"q232 regressed: $s")
  }

  test("q231 Mann-Kendall: calendar-bounded pair frame, no corpus sort") {
    // The q203 shape: weekly frame checkpointed (scans=0), per-key pair
    // join broadcast, plus the (key, value) tie aggregate.
    val s = stats("q231_mann_kendall")
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q231 regressed: $s")
    assert(s.scans <= 3 && s.shuffles <= 12, s"q231 regressed: $s")
  }

  test("q230 Mood's median: domain-frame median, no corpus sort") {
    // NLJs = the one-row median broadcast; singleParts carry the
    // price-bounded dollar domain (the q214 rationale); scans=0 behind
    // the localCheckpointed cells aggregate.
    val s = stats("q230_moods_median")
    assert(s.nestedLoops <= 2 && s.singleParts <= 6, s"q230 regressed: $s")
    assert(s.scans <= 3 && s.shuffles <= 12, s"q230 regressed: $s")
  }

  test("q229 overdispersion stays aggregate shaped") {
    val s = stats("q229_overdispersion")
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q229 regressed: $s")
    assert(s.scans <= 6 && s.shuffles <= 8, s"q229 regressed: $s")
  }

  test("q228 Friedman: per-block rank windows, treatment-frame rollup") {
    // Blocks are calendar-bounded; the rank window partitions by block
    // (k rows each); singleParts carry the treatment frame.
    val s = stats("q228_friedman_test")
    assert(s.nestedLoops == 0 && s.singleParts <= 4, s"q228 regressed: $s")
    assert(s.scans <= 6 && s.shuffles <= 10, s"q228 regressed: $s")
  }

  test("q227 Hill tail: bounded-heap aggregate, no corpus window") {
    // The TopK Aggregator partial-aggregates; no single-partition
    // exchange anywhere (the window form would corpus-sort per group).
    val s = stats("q227_hill_tail")
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q227 regressed: $s")
    assert(s.scans <= 6 && s.shuffles <= 6, s"q227 regressed: $s")
  }

  test("q211 Zipf slope: vocab-bounded window, no corpus sort") {
    // Audited: scans=2 shuffles=4 (token agg + per-source vocab window +
    // the R-row OLS aggregate). The rank window's input is the
    // VOCABULARY table; a corpus-sized funnel would show as singleParts.
    val s = stats("q211_zipf_slope")
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q211 regressed: $s")
    assert(s.scans <= 4 && s.shuffles <= 8, s"q211 regressed: $s")
  }

  test("q190 gain chart never single-partitions a corpus-sized input") {
    // The r9 verdict's one `weak` plan: the old form ran ntile(10) over
    // a GLOBAL window — a corpus-sized single-partition sort. The fixed
    // form derives the same ranks distributively, so every remaining
    // SinglePartition exchange must carry an AGGREGATED (cardinality-
    // bounded) input: the distinct-score offset window and the 10-row
    // decile windows. This walks the final AQE plan and asserts exactly
    // that containment — a raw-scan single-partition funnel fails here.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case r: ReusedExchangeExec => p +: flatten(r.child)
      case _ => p +: p.children.flatMap(flatten)
    }
    val df = Registry.all.find(_.name == "q190_gain_chart").get.run(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("ntile"),
      "q190 must not fall back to the global ntile window")
    val offenders = flatten(plan).collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition &&
        !flatten(e.child).exists(_.isInstanceOf[BaseAggregateExec]) => e
    }
    assert(offenders.isEmpty,
      s"q190 has a single-partition exchange over un-aggregated input:\n" +
        offenders.mkString("\n"))
  }

  test("q241/q245 quality + readability stay single-scan zero-shuffle " +
    "projections") {
    // Both are pure per-row array transforms — the moment either grows a
    // shuffle or a join, someone broke the codegen-flat contract.
    Seq("q241_gopher_quality", "q245_readability").foreach { name =>
      val s = stats(name)
      assert(s.scans <= 1 && s.shuffles == 0 && s.nestedLoops == 0,
        s"$name must stay a per-row projection: $s")
    }
  }

  test("q242 ACF: day-domain frames only after the daily aggregate") {
    // Audited 6 shuffles / 2 NLJ (the one-row totals broadcast) / 4
    // singleParts (days-domain lead window + scalar totals — the q190
    // rationale: bounded by the calendar, never the corpus). scans=0
    // behind the localCheckpointed daily cells.
    val s = stats("q242_revenue_acf")
    assert(s.scans <= 1 && s.shuffles <= 12, s"q242 regressed: $s")
    assert(s.nestedLoops <= 4 && s.singleParts <= 8, s"q242 regressed: $s")
  }

  test("q243 Brown-Forsythe: value-domain cells, no pair join") {
    // Audited 7 shuffles / 0 NLJ / 2 singleParts (the two scalar folds);
    // the median windows and the z-join run on (group, value) cells.
    val s = stats("q243_levene_dispersion")
    assert(s.scans <= 1 && s.shuffles <= 14, s"q243 regressed: $s")
    assert(s.nestedLoops == 0 && s.singleParts <= 4, s"q243 regressed: $s")
  }

  test("q244 Dunn: rank frames on the value domain; the pair join stays " +
    "on the k-row group frame") {
    // Audited 18 shuffles / 2 NLJ (the k-row g1<g2 pair join — metadata-
    // sized by contract) / 5 singleParts (value-domain rank window +
    // scalar tie fold).
    val s = stats("q244_dunn_posthoc")
    assert(s.scans <= 1 && s.shuffles <= 36, s"q244 regressed: $s")
    assert(s.nestedLoops <= 4 && s.singleParts <= 10, s"q244 regressed: $s")
  }

  test("q247 RAKE: doc-keyed phrase windows + vocab-sized joins, " +
    "never a pair join or corpus funnel") {
    // Audited 16 shuffles / 0 NLJ / 0 singleParts: posexplode + doc
    // window, two hash aggregates, vocab joins (broadcast at this SF),
    // top-K. scans=0 behind the localCheckpointed token frame.
    val s = stats("q247_rake_keywords")
    assert(s.scans <= 1 && s.shuffles <= 32, s"q247 regressed: $s")
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q247 regressed: $s")
  }

  test("q248 Page trend: block-grid windows only after the cell " +
    "aggregate") {
    // Audited 6 shuffles / 2 singleParts (the grid-frame treatment
    // index + scalar fold — (b*k)-row frames, the q214 rationale).
    val s = stats("q248_page_trend")
    assert(s.scans <= 8 && s.shuffles <= 12, s"q248 regressed: $s")
    assert(s.nestedLoops == 0 && s.singleParts <= 4, s"q248 regressed: $s")
  }

  test("q249/q250 dispersion screens stay aggregate shaped") {
    // q249: scan -> k-group aggregate -> one k-row fold (audited 4
    // shuffles / 2 singleParts — the scalar folds).
    val s249 = stats("q249_bartlett_variance")
    assert(s249.scans <= 4 && s249.shuffles <= 8, s"q249 regressed: $s249")
    assert(s249.nestedLoops == 0 && s249.singleParts <= 4,
      s"q249 regressed: $s249")
    // q250: (group, value) cells + per-group integer argmax — no
    // window, no single-partition exchange at all.
    val s250 = stats("q250_grubbs_outlier")
    assert(s250.scans <= 1 && s250.shuffles <= 10, s"q250 regressed: $s250")
    assert(s250.nestedLoops == 0 && s250.singleParts == 0,
      s"q250 regressed: $s250")
  }

  test("q252-q254 independence/paired screens stay domain-bounded") {
    // q252: value-domain cells + pooled cum windows (singleParts carry
    // the price-bounded frame); q253: subject agg then |d|-domain ranks;
    // q254: per-key calendar lag + fold, zero singleParts.
    val s252 = stats("q252_cvm_two_sample")
    assert(s252.scans <= 4 && s252.shuffles <= 12 && s252.nestedLoops == 0 &&
      s252.singleParts <= 4, s"q252 regressed: $s252")
    val s253 = stats("q253_wilcoxon_signed_rank")
    assert(s253.scans <= 2 && s253.shuffles <= 12 && s253.nestedLoops == 0 &&
      s253.singleParts <= 4, s"q253 regressed: $s253")
    val s254 = stats("q254_von_neumann")
    assert(s254.scans <= 4 && s254.shuffles <= 12 && s254.nestedLoops == 0 &&
      s254.singleParts == 0, s"q254 regressed: $s254")
  }

  test("q255/q256 calibration + CI stay domain-bounded") {
    // q255: bins³ lattice NLJs on ≤10-row metadata frames (the q232
    // grid rationale) behind the checkpointed bin frame; q256: score-
    // domain placement windows, zero NLJ/singleParts.
    val s255 = stats("q255_isotonic_calibration")
    assert(s255.scans <= 1 && s255.shuffles <= 20 && s255.nestedLoops <= 8 &&
      s255.singleParts <= 4, s"q255 regressed: $s255")
    val s256 = stats("q256_delong_auc_ci")
    assert(s256.scans <= 2 && s256.shuffles <= 8 && s256.nestedLoops == 0 &&
      s256.singleParts == 0, s"q256 regressed: $s256")
  }

  test("q257 rater panel stays a unit-grain aggregate") {
    // Three hash-derived rater frames union -> per-unit counts -> one
    // scalar fold; the only singleParts are the scalar exchanges.
    val s = stats("q257_krippendorff_alpha")
    assert(s.scans <= 6 && s.shuffles <= 8 && s.nestedLoops == 0 &&
      s.singleParts <= 4, s"q257 regressed: $s")
  }

  test("q260 frequent paths: per-user lead windows + path-frame top-K") {
    val s = stats("q260_frequent_paths")
    assert(s.scans <= 2 && s.shuffles <= 8 && s.nestedLoops == 0 &&
      s.singleParts == 0, s"q260 regressed: $s")
  }

  test("q259 calibration z stays a two-sum group fold") {
    val s = stats("q259_spiegelhalter_z")
    assert(s.scans <= 2 && s.shuffles <= 4 && s.nestedLoops == 0 &&
      s.singleParts == 0, s"q259 regressed: $s")
  }

  test("q258 isotropy stays the q118 fixed-width explode shape") {
    val s = stats("q258_embedding_isotropy")
    assert(s.scans <= 2 && s.shuffles <= 8 && s.nestedLoops == 0 &&
      s.singleParts == 0, s"q258 regressed: $s")
  }

  test("q246 changepoint: per-key calendar windows, dims broadcast, " +
    "never a single-partition funnel") {
    val s = stats("q246_revenue_changepoint")
    assert(s.broadcast >= 2, s"q246 dims must broadcast: $s")
    assert(s.scans <= 8 && s.shuffles <= 16, s"q246 regressed: $s")
    assert(s.nestedLoops == 0 && s.singleParts == 0, s"q246 regressed: $s")
  }

  test("q268/q270 flat scans: ONE designed broadcast crossJoin each, " +
    "never a funnel; q269/q271 IVF composites stay cell EQUI-joins") {
    // The flat faces (binary Hamming, brute MIPS) are full scans BY
    // DESIGN — their one BroadcastNestedLoopJoin is the gated
    // query-side broadcast, not a pair-scan regression; what must never
    // appear is a SECOND crossJoin or a single-partition funnel. The
    // counter reads the AQE plan string, which renders the same join in
    // both its Final and Initial sections — so one designed join
    // audits as ≤ 2 lines (the executed plan itself holds exactly one
    // BroadcastNestedLoopJoin, verified by hand this round).
    val bits = stats("q268_knn_bits")
    assert(bits.nestedLoops <= 2 && bits.singleParts == 0,
      s"q268 must stay one designed crossJoin: $bits")
    val mips = stats("q270_mips_exact")
    assert(mips.nestedLoops <= 2 && mips.singleParts == 0,
      s"q270 must stay one designed crossJoin: $mips")
    // The IVF composites prune through the cell EQUI-join — a nested
    // loop here means the probed-cells join decayed to a pair scan.
    val ivfBits = stats("q269_knn_ivfbits")
    assert(ivfBits.nestedLoops == 0 && ivfBits.singleParts == 0,
      s"q269 must stay cell-equi-joined: $ivfBits")
    val mipsAnn = stats("q271_mips_ivfsq")
    assert(mipsAnn.nestedLoops == 0 && mipsAnn.singleParts == 0,
      s"q271 must stay cell-equi-joined: $mipsAnn")
  }

  test("q274/q275/q276 state verbs keep the family plan shape: " +
    "equi-joined filtered faces, one designed tail crossJoin, " +
    "anti-joined tombstones, never a funnel") {
    // q274: the filter column joins BESIDE the cell on the bundle AND
    // is the tail's equi-join key — NO crossJoin anywhere in the plan
    // (the stratum restriction replaces the tail's pair scan).
    val f = stats("q274_sq_state_filtered")
    assert(f.nestedLoops == 0 && f.singleParts == 0, s"q274 regressed: $f")
    // q275/q276: the exact tail is the one designed broadcast-query
    // crossJoin (audits ≤ 2 under the AQE Final+Initial double-render);
    // the bundle stays a cell equi-join, and q276's tombstone
    // anti-joins must stay hash/broadcast joins — a third nested loop
    // or any single-partition funnel means a seam rotted.
    val m = stats("q275_mips_state")
    assert(m.nestedLoops <= 2 && m.singleParts == 0, s"q275 regressed: $m")
    val d = stats("q276_sq_state_delete")
    assert(d.nestedLoops <= 2 && d.singleParts == 0, s"q276 regressed: $d")
  }
}
