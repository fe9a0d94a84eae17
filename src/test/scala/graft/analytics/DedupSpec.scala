package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.core.Tables.documents(spark, dir)

  /** Brute-force shingle-set Jaccard pairs ≥ threshold — the exact oracle
    * (same shingle space as the LSH signatures).
    */
  private def brutePairs(threshold: Double): Set[(Long, Long)] = {
    val sets = docs.select(col("doc_id"), Dedup.shingleHashSet(col("text")).as("ws"))
    sets.alias("a")
      .join(sets.select(col("doc_id").as("b_id"), col("ws").as("b_ws")),
        col("doc_id") < col("b_id"))
      .withColumn("j",
        size(array_intersect(col("ws"), col("b_ws"))).cast("double") /
          size(array_union(col("ws"), col("b_ws"))).cast("double"))
      .filter(col("j") >= threshold)
      .select("doc_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash LSH finds high-similarity pairs with exact verification") {
    // Plant near-dups: every doc gets a copy with three words appended —
    // shingle-set jaccard stays high, so ground truth is dense and known.
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zzz qqq xxx")).as("text")))
    val sets = planted.select(col("doc_id"), Dedup.shingleHashSet(col("text")).as("ws"))
    val exact = sets.alias("a")
      .join(sets.select(col("doc_id").as("b_id"), col("ws").as("b_ws")),
        col("doc_id") < col("b_id"))
      .withColumn("j",
        size(array_intersect(col("ws"), col("b_ws"))).cast("double") /
          size(array_union(col("ws"), col("b_ws"))).cast("double"))
      .filter(col("j") >= 0.7)
      .select("doc_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minHashNearDups(planted, threshold = 0.7)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted corpus must contain near-dups at j>=0.7")
    // Verified candidates are always a subset of the exact pair set…
    assert(found.subsetOf(exact))
    // …and at j >= 0.7 with 16 bands × 4 rows the per-pair miss probability
    // is (1-0.7^4)^16 ≈ 1.3% — require high recall.
    val recall = found.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (${found.size}/${exact.size})")
  }

  test("clusters: label propagation finds connected components exactly") {
    val ids = (1L to 8L).toDF("doc_id")
    // components: {1,2,3} (chain), {4,5}, {6}, {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (7L, 8L)).toDF("a_id", "b_id")
    val got = Dedup.clusters(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L, 8L -> 7L))
  }

  test("clusters: driver union-find arm == distributed label-prop arm") {
    val ids = (1L to 9L).toDF("doc_id")
    // A 5-chain (worst case for round counts), a pair, singletons.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
      .toDF("a_id", "b_id")
    def run() = Dedup.clusters(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driverArm = run() // small fixture → under the cap
    val loopArm = Dedup.ccDriverMaxRowsOverride.withValue(Some(0L)) { run() }
    assert(driverArm == loopArm)
    assert(driverArm == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("clusters: reliable-checkpoint mode matches localCheckpoint labels exactly") {
    val ids = (1L to 8L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (7L, 8L)).toDF("a_id", "b_id")
    // Force the distributed loop arm — the checkpoint dichotomy lives
    // there; the driver union-find arm never checkpoints.
    def run() = Dedup.ccDriverMaxRowsOverride.withValue(Some(0L)) {
      Dedup.clusters(ids, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val viaLocal = run() // no checkpoint dir configured → localCheckpoint path
    val ckptDir = tmpDir("reliable-ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir)
    val viaReliable = run() // dir configured → checkpoint(eager) path
    assert(viaReliable == viaLocal)
    // Prove the reliable path actually engaged: the dir received RDD data.
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .anyMatch(p => p.getFileName.toString.startsWith("rdd-"))
    assert(wrote, s"expected reliable checkpoint data under $ckptDir")
  }

  test("dedupedCorpus keeps exactly one canonical doc per twin cluster") {
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
    val kept = Dedup.dedupedCorpus(planted, threshold = 0.7)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    // every kept id is an original (the min of its twin pair)…
    assert(keptIds.forall(_ < 100000L))
    // …and plants are gone while distinct originals survive (some originals
    // may merge with each other if they are natural near-dups).
    assert(keptIds.nonEmpty && kept.count() <= docs.count())
  }

  test("minhash signatures are deterministic across runs") {
    val s1 = Dedup.minHashSignatures(docs).orderBy("doc_id").collect()
    val s2 = Dedup.minHashSignatures(docs).orderBy("doc_id").collect()
    assert(s1.sameElements(s2))
  }

  test("simhash matches the portable md5-60bit reference values") {
    // Pinned against an independent Python implementation of the oracle's
    // definition (lower → RE2-\s tokens → distinct word-3-gram shingles →
    // top 60 md5 bits → ±1 votes). If the kernel drifts from these, the
    // q18 DuckDB oracle drifts identically-sized but opposite: hash gate
    // breaks. Covers multi-whitespace runs and case folding.
    val expected = Map(
      "a b c d" -> 10698662606082120L,
      "spark merge join filter scan window" -> 308507677141763602L,
      "Tab\tand  Newline\nmix case" -> 345901431351435771L)
    val d = expected.keys.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.simHashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    expected.keys.toSeq.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == expected(t), s"signature drift for '$t'")
    }
  }

  test("simhash: identical texts share signatures, near texts are close") {
    val d = Seq(
      (1L, "spark merge join filter scan window"),
      (2L, "spark merge join filter scan window"),  // identical
      (3L, "spark merge join filter scan windows"), // one token changed
      (4L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val sigs = Dedup.simHashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("simhash near-dup pairs report exact hamming and respect the cap") {
    val pairs = Dedup.simHashNearDups(docs, maxHamming = 3).collect()
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
    // identical-doc sanity: a doc unioned with itself re-keyed → hamming 0
    val dup = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val found = Dedup.simHashNearDups(dup, maxHamming = 0)
      .filter(col("b_id") === col("a_id") + 10000)
    assert(found.count() == docs.count())
  }

  test("canonical selection flags the best-quality member, id-tiebroken") {
    // Two clusters plus a singleton; quality = text length. Cluster
    // {1,2,3}: doc 2 is longest → canonical. Cluster {10,11}: equal
    // lengths → smaller id (10) wins the tiebreak.
    val d = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "aaa"),
      (10L, "bb"), (11L, "cc"),
      (20L, "solo")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val labels = Dedup.clusters(d.select(col("doc_id")), pairs)
    val out = Dedup.canonicalSelection(d, labels, length(col("text"))).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Int]("is_canonical"))).toMap
    assert(out == Map(
      1L -> (1L, 0), 2L -> (1L, 1), 3L -> (1L, 0),
      10L -> (10L, 1), 11L -> (10L, 0),
      20L -> (20L, 1)))
    // Exactly one canonical per cluster, always.
    val perCluster = out.values.groupBy(_._1).map { case (_, vs) => vs.count(_._2 == 1) }
    assert(perCluster.forall(_ == 1))
  }

  test("windowDupes counts cross-doc duplicated windows exactly") {
    // doc 1: 12 tokens → 5 distinct 8-windows. doc 2: verbatim copy →
    // every window shared. doc 3: disjoint vocabulary → nothing shared.
    // doc 4: shorter than the window → zero windows. doc 5: doc 1's last
    // 8 tokens + 4 fresh → exactly its first window is shared.
    val t1 = (1 to 12).map(i => s"w$i").mkString(" ")
    val t5 = ((5 to 12).map(i => s"w$i") ++ (1 to 4).map(i => s"x$i")).mkString(" ")
    val d = Seq(
      (1L, t1), (2L, t1), (3L, (1 to 12).map(i => s"z$i").mkString(" ")),
      (4L, "a b c"), (5L, t5)).toDF("doc_id", "text")
    val out = Dedup.windowDupes(d, w = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Double]("dup_ratio")))).toMap
    assert(out(1L) == ((5L, 5L, 1.0)))
    assert(out(2L) == ((5L, 5L, 1.0)))
    assert(out(3L) == ((5L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
    assert(out(5L) == ((5L, 1L, 0.2)))
  }

  test("incrementalNearDups equals brute-force cross pairs, never intra-side") {
    // Same split as gated q56: every 5th doc is the batch.
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val got = Dedup.incrementalNearDups(batch, base, threshold = 0.7)
      .select("batch_id", "base_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (b, s) => b % 5 == 0 && s % 5 != 0 },
      "no intra-batch or intra-base pair may appear")
    val cross = brutePairs(0.7).collect {
      case (a, b) if a % 5 == 0 && b % 5 != 0 => (a, b)
      case (a, b) if b % 5 == 0 && a % 5 != 0 => (b, a)
    }
    assert(cross.nonEmpty, "harness corpus must contain cross-side near-dups")
    assert(got == cross, s"got ${got.size} pairs, exact cross set has ${cross.size}")
  }

  test("sortedNeighborhoodPairs equals the rank-window ground truth; twins found") {
    import spark.implicits._
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
    val got = Dedup.sortedNeighborhoodPairs(planted, window = 5,
      minJaccardMicro = 500000L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("dist"), r.getAs[Long]("jaccard_micro"))).toSet

    // Driver-side ground truth from the SAME definition: per first-char
    // partition, sort by (40-char key, id), pair ranks ≤ 5 apart, keep
    // integer-micro word-set Jaccard ≥ 0.5.
    val rows = planted.collect().map(r => (r.getLong(0), r.getString(1)))
    def wset(t: String) = t.split(" ").filter(_.nonEmpty).toSet
    val want = rows.map { case (id, t) => (id, t.take(40), wset(t)) }
      .groupBy(_._2.take(1)).values.flatMap { part =>
        val sorted = part.sortBy { case (id, k, _) => (k, id) }
        for {
          i <- sorted.indices; d <- 1 to 5; if i + d < sorted.length
          (aId, _, aWs) = sorted(i); (bId, _, bWs) = sorted(i + d)
          jm = 1000000L * aWs.intersect(bWs).size / aWs.union(bWs).size
          if jm >= 500000L
        } yield (aId, bId, d.toLong, jm)
      }.toSet
    assert(got == want, s"got ${got.size} pairs, ground truth ${want.size}")
    // Every planted twin shares its 40-char block key with its original
    // — the window must surface them all (the blocking-efficacy claim).
    val twinPairs = got.collect {
      case (a, b, _, _) if b == a + 1000000L => a
      case (a, b, _, _) if a == b + 1000000L => b
    }
    assert(twinPairs.size == docs.count(),
      s"all twins must be found, got ${twinPairs.size}")
  }

  test("prefixFilterPairs is COMPLETE: equals brute-force word-set Jaccard") {
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
    val got = Dedup.prefixFilterPairs(planted, minJaccardMicro = 500000L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("jaccard_micro"))).toSet

    // Brute-force ALL pairs with integer-micro word-set Jaccard ≥ 0.5 —
    // prefix filtering claims exactness, so the sets must be EQUAL (no
    // recall loss like LSH, no boundary loss like sorted neighborhoods).
    val rows = planted.collect().map(r => (r.getLong(0), r.getString(1)))
    def wset(t: String) = t.split(" ").filter(_.nonEmpty).toSet
    val sets = rows.map { case (id, t) => (id, wset(t)) }
    val want = (for {
      i <- sets.indices; j <- sets.indices; if sets(i)._1 < sets(j)._1
      (aId, aWs) = sets(i); (bId, bWs) = sets(j)
      jm = 1000000L * aWs.intersect(bWs).size / aWs.union(bWs).size
      if jm >= 500000L
    } yield (aId, bId, jm)).toSet
    assert(got == want, s"got ${got.size} pairs, brute force ${want.size}")
    assert(want.nonEmpty, "planted twins must qualify at 0.5")
  }

  test("containmentPairs is COMPLETE and directional: equals brute-force containment") {
    // Plant quote-inclusions: a tiny excerpt (first 4 tokens) of each doc
    // becomes its own document — C(excerpt→doc) = 1 while Jaccard is tiny,
    // the exact pair class the symmetric joins cannot see.
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, 4), ' ')").as("text")))
    val got = Dedup.containmentPairs(planted, minContainMicro = 900000L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("containment_micro"))).toSet

    val rows = planted.collect().map(r => (r.getLong(0), r.getString(1)))
    def wset(t: String) = t.split(" ").filter(_.nonEmpty).toSet
    val sets = rows.map { case (id, t) => (id, wset(t)) }
    // Brute force is over ORDERED pairs (containment is directional).
    val want = (for {
      i <- sets.indices; j <- sets.indices; if sets(i)._1 != sets(j)._1
      (aId, aWs) = sets(i); (bId, bWs) = sets(j)
      cm = 1000000L * aWs.intersect(bWs).size / aWs.size
      if cm >= 900000L
    } yield (aId, bId, cm)).toSet
    assert(got == want, s"got ${got.size} pairs, brute force ${want.size}")
    val planted1 = got.filter { case (a, b, c) => a >= 1000000L && c == 1000000L }
    assert(planted1.nonEmpty, "planted excerpts must surface at containment 1.0")
  }

  test("containment hand case: subset scores 1.0 one way, |b∩a|/|b| the other") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, minContainMicro = 500000L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("containment_micro"), r.getAs[Long]("jaccard_micro"))).toMap
    assert(out((2L, 1L)) == (1000000L, 500000L),
      "the subset doc is fully contained; jaccard only 4/8")
    assert(out((1L, 2L)) == (500000L, 500000L),
      "the superset doc is half-contained in the subset")
  }

  /** Driver-side recompute of the winnowing selection for one token
    * sequence — the independent oracle for [[Dedup.winnowFingerprints]].
    */
  private def h40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(5).map(b => f"$b%02x").mkString, 16)
  }

  private def winnowByHand(toks: Seq[String]): Set[Long] = {
    val k = Dedup.WinnowK
    val w = Dedup.WinnowW
    val m = 1L << 20
    val keys = toks.sliding(k).toSeq.zipWithIndex.map { case (g, pos) =>
      h40(g.mkString(" ")) * m + (m - 1 - pos)
    }
    keys.sliding(w).map(_.min).toSet
  }

  test("winnowing: fingerprint selection matches a by-hand window-minimum recompute") {
    val toks = Seq("the", "quick", "brown", "fox", "jumps", "over", "the",
      "lazy", "dog", "while", "the", "cat", "naps", "nearby", "today")
    val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(df).collect()
      .map(_.getAs[Long]("mk")).toSet
    assert(got == winnowByHand(toks))
  }

  test("winnowing: a shared run of w+k-1 tokens guarantees a shared fingerprint") {
    val run = (1 to 7).map(i => s"shared$i") // exactly WinnowW + WinnowK - 1
    val a = (1 to 9).map(i => s"lefta$i") ++ run ++ (1 to 9).map(i => s"righta$i")
    // Different left-context length: the guarantee must hold even though
    // the run sits at different positions in the two docs (the hash
    // dominates the packed key, so the same in-run gram wins both windows).
    val b = (1 to 11).map(i => s"leftb$i") ++ run ++ (1 to 9).map(i => s"rightb$i")
    val df = Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))).toDF("doc_id", "text")
    val m = 1L << 20
    val byDoc = Dedup.winnowFingerprints(df).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("mk") / m).toSet).toMap
    val sharedHashes = byDoc(1L).intersect(byDoc(2L))
    assert(sharedHashes.nonEmpty,
      "winnowing's detection guarantee: a w+k-1 token run must surface in both docs")
    // And every shared hash really is one of the run's own grams (the
    // contexts are disjoint, so no other gram can coincide).
    val runHashes = run.sliding(Dedup.WinnowK).map(g => h40(g.mkString(" "))).toSet
    assert(sharedHashes.subsetOf(runHashes))
  }

  /** Driver-side recompute of CDC chunk boundaries for one token list. */
  private def cdcChunksByHand(toks: Seq[String]): Seq[Seq[String]] = {
    val k = Dedup.CdcK
    val bnd = toks.indices.map { p =>
      p >= k - 1 && h40(toks.slice(p - k + 1, p + 1).mkString(" ")) % Dedup.CdcD == 0
    }
    val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    toks.indices.foreach { p =>
      cur += toks(p)
      if (bnd(p)) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer() }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  test("cdc chunks: chunk partition matches a by-hand boundary recompute") {
    // Fixed pseudo-random tokens: enough that some window hash ≡ 0 mod 16.
    val toks = (1 to 300).map(i => s"w${(i * 2654435761L) % 997}")
    val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(df).collect()
      .map(r => r.getAs[Long]("chunk") -> r.getAs[Long]("chunk_len"))
      .sortBy(_._1).map(_._2).toSeq
    val want = cdcChunksByHand(toks).map(_.length.toLong)
    assert(got == want, s"chunk lengths diverge: got $got want $want")
    assert(want.length > 5, "fixture must actually chunk (several boundaries)")
  }

  test("cdc chunks: boundaries are shift-resistant (one insertion, chunks mostly shared)") {
    val toks = (1 to 400).map(i => s"w${(i * 2246822519L) % 1009}")
    val shifted = "inserted" +: toks
    val df = Seq((1L, toks.mkString(" ")), (2L, shifted.mkString(" ")))
      .toDF("doc_id", "text")
    val byDoc = Dedup.cdcChunks(df).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("chunk_hash")).toSet).toMap
    val inter = byDoc(1L).intersect(byDoc(2L))
    val minChunks = math.min(byDoc(1L).size, byDoc(2L).size)
    // A fixed-stride chunking would share ~nothing after a front insert;
    // CDC re-synchronizes at the first content boundary past the edit.
    assert(inter.size >= minChunks - 3,
      s"only ${inter.size} of $minChunks chunks survive a front insertion")
    assert(inter.size >= 5)
    // And the summary agrees: token totals conserved per doc.
    val sums = Dedup.cdcSummary(spark, dir).collect()
    sums.foreach { r =>
      assert(r.getAs[Long]("n_chunks") >= 1)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("n_shared_chunks") <= r.getAs[Long]("n_chunks"))
    }
  }

  test("dedup savings: doc counts reconcile with q30 and twins halve the corpus") {
    val dir = "/root/testdata/sf0.001"
    val savings = Dedup.dedupSavings(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"),
          r.getAs[Long]("tokens_before"), r.getAs[Long]("tokens_after"),
          r.getAs[Long]("token_savings_ppm"))).toMap
    val q30 = Dedup.dedupCorpusSummary(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"))).toMap
    assert(savings.view.mapValues(v => (v._1, v._2)).toMap == q30,
      "savings doc counts must equal the q30 dedup summary")
    savings.values.foreach { case (nb, na, tb, ta, ppm) =>
      assert(na <= nb / 2, "every doc has a planted twin, so kept <= half")
      assert(ta < tb)
      assert(ppm >= 400000L && ppm < 1000000L,
        s"twin removal should save roughly half the token mass, got $ppm")
    }
  }

  test("dedup method eval: operating points are monotone and exactly bounded") {
    val rows = Dedup.dedupMethodEval(spark, dir).collect()
      .sortBy(_.getAs[Int]("max_hamming"))
    assert(rows.map(_.getAs[Int]("max_hamming")).toSeq == Seq(0, 1, 2, 3))
    val nTrue = rows.head.getAs[Long]("n_true")
    assert(rows.map(_.getAs[Long]("n_true")).distinct.length == 1)
    rows.foreach { r =>
      val (p, h) = (r.getAs[Long]("n_pred"), r.getAs[Long]("n_hit"))
      assert(h <= p && h <= nTrue)
      assert(r.getAs[Long]("precision_ppm") <= 1000000L)
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_pred") <= b.getAs[Long]("n_pred"),
        "widening the radius can only add predictions")
      assert(a.getAs[Long]("n_hit") <= b.getAs[Long]("n_hit"))
    }
    assert(rows.last.getAs[Long]("n_pred") > 0,
      "the corpus has near-identical docs; radius 3 must fire")
  }

  test("winnowing summary: density bounds hold corpus-wide") {
    val w = Dedup.WinnowW
    val rows = Dedup.winnowSummary(spark, dir).collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val nGrams = r.getAs[Long]("n_grams")
      val nFp = r.getAs[Long]("n_fp")
      val nWin = nGrams - (w - 1)
      if (nWin >= 1) {
        assert(nFp >= 1 && nFp <= nWin,
          s"doc ${r.getAs[Long]("doc_id")}: $nFp fingerprints vs $nWin windows")
        // One selection can be the minimum of at most w consecutive windows.
        assert(nFp * w >= nWin,
          s"doc ${r.getAs[Long]("doc_id")}: density below the 1/w floor")
      } else assert(nFp == 0)
      assert(r.getAs[Long]("n_shared_fp") <= nFp)
    }
  }
}
