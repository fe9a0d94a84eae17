package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.core.Tables.embeddings(spark, dir)

  test("brute-force knn returns k ranked neighbors per query, self excluded") {
    val out = Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 5), k = 3)
    val rows = out.collect()
    assert(rows.length == 15)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(Array(1, 2, 3)))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
      // ranks follow descending score
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Double]("score_r")).sliding(2)
        .forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("ANN multi-probe LSH achieves reasonable recall@5 vs exact") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceKnn(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.annKnn(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    // 4-bit buckets + hamming-1 probes cover 5/16 of the space per query on
    // random data; top neighbors are likelier than random to share buckets.
    assert(recall >= 0.3, s"ANN recall@5 = $recall")
    assert(ann.size <= exact.size) // never returns more than k per query
  }

  test("cosineNearDups is symmetric-free and thresholded") {
    val pairs = Similarity.cosineNearDups(emb, threshold = 0.4).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Double]("cos_r") >= 0.4 - 1e-4)
    }
  }

  test("IVF index assigns every vector and search achieves good recall@5") {
    val model = IvfIndex.train(emb, k = 8, iters = 2)
    assert(model.centroids.length == 8)
    val indexed = IvfIndex.index(emb, model)
    assert(indexed.filter(col("cell").isNull).count() == 0)
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceKnn(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = IvfIndex.search(indexed, queries, model, k = 5, nprobe = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall@5 = $recall") // probing 3/8 cells
  }

  test("IVF model round-trips through parquet and searches identically") {
    val model = IvfIndex.train(emb, k = 8, iters = 2)
    val path = tmpDir("ivf-model") + "/model"
    IvfIndex.save(spark, model, path)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.centroids == model.centroids, "centroids must round-trip exactly")
    val queries = emb.filter(col("vec_id") < 5)
    def run(m: IvfIndex.Model) =
      IvfIndex.search(IvfIndex.index(emb, m), queries, m, k = 3).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
        .sorted
    assert(run(loaded).sameElements(run(model)))
  }

  test("IVF model load recovers a crashed save's backup") {
    val model = IvfIndex.train(emb, k = 4, iters = 1)
    val path = tmpDir("ivf-crash") + "/model"
    IvfIndex.save(spark, model, path)
    // Simulate a death between rename(live→bak) and rename(tmp→live): the
    // live dir is gone, only the backup remains.
    val p = new org.apache.hadoop.fs.Path(path)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.rename(p, new org.apache.hadoop.fs.Path(p.getParent, s".bak_${p.getName}")))
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.centroids == model.centroids, "load must restore the .bak")
  }

  test("hyperplanes are deterministic for a fixed seed") {
    assert(Similarity.hyperplanes(4, 8) == Similarity.hyperplanes(4, 8))
    assert(Similarity.hyperplanes(4, 8, seed = 1) != Similarity.hyperplanes(4, 8, seed = 2))
    // flat form follows the same seed stream as the nested form
    assert(Similarity.hyperplanesFlat(4, 8).toSeq ==
      Similarity.hyperplanes(4, 8).flatten)
  }

  test("LSH near-dup path matches the exact baseline pair-for-pair at a weak threshold") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("cos_r"))
    val exact = Similarity.cosineNearDups(emb, threshold = 0.35).collect().map(key).sorted
    val lsh = Similarity.lshCosineNearDups(emb, threshold = 0.35).collect().map(key).sorted
    assert(lsh.sameElements(exact),
      s"LSH candidates must cover every true pair: exact=${exact.length} lsh=${lsh.length}")
  }

  test("gated q21: planted twins verify exactly and LSH prunes >95% of the pair space") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("cos_r"))
    val corpus = Similarity.plantedTwinCorpus(emb).cache()
    try {
      val n = corpus.count()
      val gated = Similarity.lshCosineNearDups(corpus, Similarity.GatedThreshold,
        Similarity.GatedTables, Similarity.GatedBits).collect()
      // The true pairs at 0.9 are exactly the planted twins (natural max ≈ 0.48).
      assert(gated.length == 50, s"expected the 50 planted pairs, got ${gated.length}")
      gated.foreach { r =>
        assert(r.getAs[Long]("b_id") == r.getAs[Long]("a_id") + 100000L, r.toString)
        assert(r.getAs[Double]("cos_r") >= 0.99, s"planted twin drifted: $r")
      }
      // Pair-for-pair (incl. rounded score) against the exact O(n²) baseline.
      val exact = Similarity.cosineNearDups(corpus, Similarity.GatedThreshold)
        .collect().map(key).sorted
      assert(gated.map(key).sorted.sameElements(exact), "gated output must be exact")
      // The pruning demonstration: candidate multiset ≪ pair space.
      val candidates = Similarity.lshCandidatePairs(corpus,
        Similarity.GatedTables, Similarity.GatedBits).count()
      val pairSpace = n * (n - 1) / 2
      assert(candidates.toDouble / pairSpace < 0.05,
        s"gated config must prune >95%: $candidates of $pairSpace")
    } finally corpus.unpersist(blocking = false)
  }

  test("LSH near-dup plan has no quadratic nested-loop pair join (gated config)") {
    val df = Similarity.lshCosineNearDups(Similarity.plantedTwinCorpus(emb),
      Similarity.GatedThreshold, Similarity.GatedTables, Similarity.GatedBits)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"candidate generation must be an equi-join on (table, bucket):\n$plan")
  }

  test("shuffled-verify LSH path (no broadcast) matches the broadcast path") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("cos_r"))
    val bcast = Similarity.lshCosineNearDups(emb, 0.35).collect().map(key).sorted
    val shuffled = Similarity.lshCosineNearDups(emb, 0.35, broadcastVectors = false)
      .collect().map(key).sorted
    assert(shuffled.sameElements(bcast),
      s"cluster-scale path diverged: ${bcast.length} vs ${shuffled.length}")
  }

  test("similarity paths survive an empty corpus (typed empty results, no crash)") {
    val empty = emb.filter(col("vec_id") < 0)
    assert(Similarity.lshCosineNearDups(empty, 0.35).count() == 0)
    assert(Similarity.annKnn(empty, empty, k = 5).count() == 0)
  }

  test("a ragged vector hashes to null buckets instead of corrupting candidates") {
    import spark.implicits._
    val mixed = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)) // ragged: shorter than the inferred dim
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.lshCosineNearDups(mixed, threshold = 0.99,
      nTables = 4, bitsPerTable = 2)
    val ids = pairs.collect().flatMap(r => Seq(r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(ids.toSet == Set(1L, 2L), "identical full-length vectors pair; ragged row is inert")
  }

  test("LSH prunes aggressively in its design regime (high threshold, wide tables)") {
    // 16-bit tables on the same corpus: bucket collisions for unrelated
    // pairs are ~2^-16 per table, so the candidate set is a tiny fraction
    // of the 124,750-pair space — the shape that carries to 100 TB where
    // near-dup thresholds are high.
    val n = emb.count()
    val candidates = Similarity.lshCandidatePairs(emb, nTables = 8, bitsPerTable = 16).count()
    assert(candidates < n * (n - 1) / 2 / 20,
      s"wide tables should prune >95%: $candidates of ${n * (n - 1) / 2}")
  }

  test("int8 quantization fidelity is near-exact and survives zero vectors") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizationFidelityFrame(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // Real vector: dequantized cosine within float-ish error of 1.
    assert(out(1L)._1 > 0.999, out(1L).toString)
    assert(out(1L)._2 <= 1.0 / 127 / 2 + 1e-9, "max error must be bounded by scale/2")
    // Zero vector: scale 0 must not divide — dequantize is identity,
    // fidelity is 1.0 BY DEFINITION (the raw cosine would be 0/0 = NaN,
    // which can never hash-match an oracle), and max error exactly 0.
    assert(out(2L)._1 == 1.0, out(2L).toString)
    assert(out(2L)._2 == 0.0, out(2L).toString)
  }

  test("q125 hard negatives: twins excised, ranks dense, ceiling respected") {
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.knnHardNegatives(spark, dir).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    for ((q, rows) <- byQuery) {
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      for (r <- rows) {
        val n = r.getAs[Long]("neighbor_id")
        assert(r.getAs[Double]("score_r") < 0.9)
        assert(!(n >= 100000L + q * 10 && n < 100000L + q * 10 + 5),
          s"own twin $n leaked into query $q's negatives")
      }
    }
    // The negatives are the natural-corpus kNN: q19's brute-force top-5
    // restricted to the same ceiling must agree on the neighbor sets.
    val brute = Similarity.bruteForceKnn(
      graft.core.Tables.embeddings(spark, dir).withColumn("embedding",
        col("embedding").cast("array<double>")),
      graft.core.Tables.embeddings(spark, dir).withColumn("embedding",
        col("embedding").cast("array<double>")).filter(col("vec_id") < 10), k = 5)
      .collect().groupBy(_.getAs[Long]("query_id"))
    for ((q, rows) <- byQuery) {
      val expected = brute(q).map(_.getAs[Long]("neighbor_id")).toSet
      val got = rows.map(_.getAs[Long]("neighbor_id")).toSet
      // Twins of OTHER queries may legitimately enter if they beat the
      // natural neighbors; on this corpus they do not (cos ≈ natural).
      assert(got == expected, s"query $q: $got vs brute $expected")
    }
  }

  test("semantic-dedup cell law: derived k scales with the corpus count") {
    // The k ∝ n contract (SemDeDup pair work n·(n/k)): ten times the
    // corpus must derive ~ten times the cells, so Σ|cell|² stays linear.
    val kSmall = Similarity.derivedCellCount(10_000L)
    val kBig = Similarity.derivedCellCount(100_000L)
    assert(kSmall == 20, s"10k rows at target 512 → 20 cells, got $kSmall")
    assert(kBig == 196, s"100k rows at target 512 → 196 cells, got $kBig")
    assert(kBig >= 9 * kSmall && kBig <= 11 * kSmall,
      s"derived k must track n: $kSmall vs $kBig")
    // Degenerate corpora still get a positive cell count.
    assert(Similarity.derivedCellCount(0L) == 1)
    assert(Similarity.derivedCellCount(1L) == 1)
  }

  test("derived-k semantic dedup drops exactly the planted twins (no tuning)") {
    val corpus = Similarity.plantedTwinCorpus(
      graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001"))
    // No k anywhere: the operator counts the corpus and applies the cell
    // law itself. Every twin (id ≥ 100000, the larger of its pair) must
    // drop; every base vector must survive.
    val kept = Similarity.semanticDedup(corpus, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    val twins = all.filter(_ >= 100000L)
    assert(twins.nonEmpty, "fixture must plant twins")
    assert(kept == all -- twins,
      s"derived-k dedup must drop the ${twins.size} twins and nothing else")
  }

  // ------------------------------------------------------ matryoshkaRecall

  test("matryoshkaRecall: per-query recall is bounded, deterministic, and high on the planted corpus") {
    val out = Similarity.matryoshkaRecall(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("k"), r.getAs[Long]("n_overlap"),
          r.getAs[Long]("recall_ppm")))).toMap
    assert(out.size == 10, "one row per planted query")
    out.values.foreach { case (k, ov, ppm) =>
      assert(k == 5L && ov >= 0L && ov <= 5L)
      assert(ppm == 1000000L * ov / 5L)
    }
    // The planted twins dominate BOTH rankings by a ~0.5 cosine margin,
    // so 16-dim truncation must keep recall perfect on this corpus.
    assert(out.values.forall(_._2 == 5L),
      s"expected full recall on planted margins, got $out")
    // Determinism: a second run returns the identical map.
    val again = Similarity.matryoshkaRecall(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("k"), r.getAs[Long]("n_overlap"),
          r.getAs[Long]("recall_ppm")))).toMap
    assert(again == out)
  }

  test("filteredKnn (q209): neighbors stay inside the query's stratum " +
    "and equal brute force over the pre-filtered corpus") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 4)
    val got = Similarity.filteredKnn(emb, queries, k = 3, filterCol = "label")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // (a) every neighbor shares its query's label.
    got.foreach { case ((q, _), n) =>
      assert(labels(n) == labels(q), s"neighbor $n left query $q's stratum")
    }
    // (b) per query, identical to brute force over the filtered corpus.
    (0L until 4L).foreach { q =>
      val expect = Similarity.bruteForceKnn(
        emb.filter(col("label") === labels(q)), queries.filter(col("vec_id") === q),
        k = 3).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
          r.getAs[Long]("neighbor_id")).toMap
      expect.foreach { case (key, n) =>
        assert(got(key) == n, s"rank mismatch at $key: ${got(key)} vs $n")
      }
    }
  }

  // ------------------------------------------ embeddingIsotropy (q258)
  test("isotropy: aligned sets score ~1e12 pico, balanced opposites ~0") {
    import spark.implicits._
    val emb = Seq(
      ("same", 1L, Seq(1.0f, 0.0f)), ("same", 2L, Seq(2.0f, 0.0f)),
      ("same", 3L, Seq(5.0f, 0.0f)),
      ("anti", 4L, Seq(1.0f, 0.0f)), ("anti", 5L, Seq(-1.0f, 0.0f)),
      ("zero", 6L, Seq(0.0f, 0.0f)), ("zero", 7L, Seq(0.0f, 3.0f)))
      .toDF("label", "vec_id", "embedding")
    val out = Similarity.embeddingIsotropy(emb).collect()
      .map(r => r.getAs[String]("label") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("iso_pico"))).toMap
    // All unit vectors identical -> ||mean||^2 = 1 (1e12 pico exactly).
    assert(out("same") == ((3L, 1000000000000L)))
    // Perfectly opposed pair -> mean 0.
    assert(out("anti") == ((2L, 0L)))
    // Zero-norm vector dropped; the survivor alone is fully aligned.
    assert(out("zero") == ((1L, 1000000000000L)))
  }
}
