package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, dir)

  test("hash split is deterministic, exhaustive, and subset-consistent") {
    val assigned = docs.select(col("doc_id"), TrainingData.hashSplit(col("doc_id")).as("split"))
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == docs.count())
    // ~75/12.5/12.5 within loose tolerance on 500 docs
    assert(counts("train") > counts.values.sum * 6 / 10)
    // Same rows → same assignment on a subset (per-row projection).
    val subset = docs.filter(col("doc_id") < 100)
      .select(col("doc_id"), TrainingData.hashSplit(col("doc_id")).as("split"))
    val joined = assigned.alias("a").join(subset.alias("s"), "doc_id")
      .filter(col("a.split") =!= col("s.split"))
    assert(joined.count() == 0)
  }

  test("contamination check flags exactly the verbatim planted half") {
    val out = TrainingData.contaminationCheck(spark, dir).collect()
    assert(out.nonEmpty)
    val totalEval = out.map(_.getAs[Long]("n_eval")).sum
    val totalContam = out.map(_.getAs[Long]("n_contaminated")).sum
    val expectedEval = docs.filter(col("doc_id") % 10 === 0).count()
    val expectedContam = docs.filter(col("doc_id") % 20 === 0).count()
    assert(totalEval == expectedEval)
    assert(totalContam == expectedContam,
      s"only the unmutated half may match: $totalContam vs $expectedContam")
  }

  test("Bloom-prefiltered contamination equals the plain join and prunes in-scan") {
    val eval = docs.filter(col("doc_id") % 10 === 0)
      .select(col("source"),
        when(col("doc_id") % 20 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" clean"))).as("text"))
    val atScale = TrainingData.contaminationAtScale(docs.select(col("text")), eval)
    // Exactness: Bloom has no false negatives and the confirming join
    // kills false positives — compare against the plain distinct+join.
    val plainFp = docs.select(graft.analytics.TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
    val plain = eval.select(col("source"),
        graft.analytics.TextAnalysis.fingerprint(col("text")).as("efp"))
      .join(plainFp, col("efp") === col("fp"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_eval"), count(col("fp")).as("n_contaminated"))
    assert(atScale.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    // The probe is a pushable predicate: the corpus-side filter shows up
    // as a might_contain in the physical plan (the in-scan prune that
    // spares the corpus shuffle at 100 TB). The equality assertion above
    // already drove THIS QueryExecution to its final AQE plan.
    assert(atScale.queryExecution.executedPlan.toString.contains("might_contain"),
      "bloom probe must appear in the physical plan")
  }

  test("ngram overlap counts exactly the shared distinct trigrams") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),        // shares "beta gamma delta"
      (2L, "alpha beta gamma delta epsilon"), // shares 2 eval trigrams
      (3L, "x y z w"),                        // disjoint vocabulary
      (4L, "a b")                             // too short for any trigram
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "beta gamma delta epsilon soup")
    ).toDF("doc_id", "text")
    val out = TrainingData.ngramOverlap(train, eval).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(1L) == ((1L, 1)))
    assert(out(2L) == ((2L, 1))) // "beta gamma delta" + "gamma delta epsilon"
    assert(out(3L) == ((0L, 0)))
    assert(out(4L) == ((0L, 0))) // short doc: present in output, clean
    assert(out.size == 4)
  }

  test("substringOverlap merges consecutive matched grams into exact runs") {
    val train = Seq(
      // Shares the 9-token run "one two three four five six seven eight
      // nine" with eval doc 10 -> 7 consecutive matched trigrams ->
      // max_run = 7 + 3 - 1 = 9 >= 8: contaminated.
      (1L, "zz one two three four five six seven eight nine qq"),
      // Two DISJOINT short matches ("one two three", "seven eight nine")
      // -> two runs of 3 tokens each; 6 shared tokens total but no run
      // >= 8: clean (the case q45's any-gram rule cannot distinguish).
      (2L, "one two three kk mm seven eight nine"),
      (3L, "x y z w"), // disjoint vocabulary
      (4L, "a b")      // too short for any trigram
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    val out = TrainingData.substringOverlap(train, eval).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))).toMap
    assert(out(1L) == ((7L, 1L, 9L, 1)))
    assert(out(2L) == ((2L, 2L, 3L, 0)))
    assert(out(3L) == ((0L, 0L, 0L, 0)))
    assert(out(4L) == ((0L, 0L, 0L, 0)))
    assert(out.size == 4)
  }

  test("substringOverlap: a gram repeated at non-adjacent positions forms " +
    "separate runs, not one inflated run") {
    val train = Seq(
      (1L, "one two three zz one two three")).toDF("doc_id", "text")
    val eval = Seq((10L, "one two three")).toDF("doc_id", "text")
    val r = TrainingData.substringOverlap(train, eval).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 3L,
      s"expected two 3-token runs, got $r")
  }

  test("q45 splits are disjoint and counts are brute-force-consistent") {
    // The gated query derives train/eval from the q35 hash split; spot-
    // check 25 train docs against a driver-side recomputation over the
    // full eval shingle set (the oracle does the same in SQL at sf0.01).
    val assigned = docs.select(col("doc_id"), col("text"),
      TrainingData.hashSplit(col("doc_id")).as("split"))
    def tris(text: String): Set[String] = {
      val w = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val evalSet = assigned.filter(col("split") === "test")
      .collect().flatMap(r => tris(r.getString(1))).toSet
    val got = TrainingData.ngramDecontamination(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainDocs = assigned.filter(col("split") === "train").collect()
    assert(got.size == trainDocs.length)
    trainDocs.take(25).foreach { r =>
      val expected = (tris(r.getString(1)) & evalSet).size.toLong
      assert(got(r.getLong(0)) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("stratified sample keeps exact per-stratum quotas, deterministically") {
    val s1 = TrainingData.stratifiedSample(docs, col("lang"), col("doc_id"), 5)
    val quotas = s1.groupBy("lang").count().collect().map(_.getLong(1))
    assert(quotas.forall(_ == 5L), s"every stratum must yield 5: ${quotas.toSeq}")
    val s2 = TrainingData.stratifiedSample(docs, col("lang"), col("doc_id"), 5)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(s2.select("doc_id").collect().map(_.getLong(0)).sorted))
  }

  test("sequence packing conserves tokens and respects the per-source offsets") {
    val packed = TrainingData.packSequences(spark, dir, budget = 256).collect()
    assert(packed.nonEmpty)
    // Token conservation: packed totals == corpus totals per source.
    val packedBySource = packed.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("seq_tokens")).sum).toMap
    val corpusBySource = docs
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .groupBy("source").sum("n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packedBySource == corpusBySource, "packing must not drop or invent tokens")
    // Every full (non-terminal) sequence overlaps its budget sensibly:
    // fill ratios are positive and sequence ids are dense from 0.
    packed.groupBy(_.getAs[String]("source")).foreach { case (_, seqs) =>
      val ids = seqs.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head == 0L && ids.sameElements(ids.head to ids.last))
      assert(seqs.forall(_.getAs[Double]("fill_ratio") > 0.0))
    }
  }

  test("PII scrub redacts exactly the planted emails") {
    val out = TrainingData.piiScrub(spark, dir).collect()
    val redacted = out.map(_.getAs[Long]("n_redacted")).sum
    val expected = docs.filter(col("doc_id") % 7 === 0).count()
    assert(redacted == expected, s"redacted $redacted of $expected planted")
    // Chars removed is positive wherever something was redacted ("<EMAIL>"
    // is shorter than every planted address).
    out.foreach { r =>
      assert((r.getAs[Long]("n_redacted") > 0) == (r.getAs[Long]("chars_removed") > 0))
    }
  }

  test("bigram LM scores match an in-memory reference; short docs survive") {
    val d = Seq(
      (1L, "a b a b c"),
      (2L, "a b"),
      (3L, "c c c"),
      (4L, "solo"),   // one token → zero bigrams
      (5L, "")        // zero tokens
    ).toDF("doc_id", "text")
    // Independent reference: plain Scala counts + the same smoothing.
    val docToks = Map(
      1L -> Seq("a", "b", "a", "b", "c"), 2L -> Seq("a", "b"),
      3L -> Seq("c", "c", "c"), 4L -> Seq("solo"), 5L -> Seq.empty[String])
    val c1 = docToks.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val v = c1.size
    val bgs = docToks.map { case (id, ts) => id -> ts.sliding(2).filter(_.size == 2)
      .map(_.mkString(" ")).toSeq }
    val c2 = bgs.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
    def nll(bg: String): Long = {
      val p = (c2(bg) + 1.0) / (c1(bg.split(' ').head) + v)
      math.floor(-math.log(p) * TrainingData.LmUnat + 0.5).toLong
    }
    val expected = bgs.map { case (id, ss) => id -> (ss.size.toLong, ss.map(nll).sum) }
    val got = TrainingData.bigramLmScores(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_unats"))).toMap
    assert(got == expected)
  }

  test("bigram LM floor-boundary margin is safe at every harness SF") {
    // The q49 output is all-integer BECAUSE each micro-nat value is
    // floor(-ln(p)·1e6 + 0.5) — exact as long as no bigram's scaled nll
    // sits within ln's cross-engine ulp slack (~1e-10 here) of an integer
    // boundary. Assert a 1e-8 margin corpus-wide so a testdata regen that
    // lands on a boundary fails THIS named test, not a driver hash diff.
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val ds = graft.core.Tables.documents(spark, s"/root/testdata/$sf")
      val uni = ds.select(explode(graft.functions.shingleStrings(col("text"), 1)).as("t"))
      val c1 = uni.groupBy("t").agg(count(lit(1)).as("c1"))
      val v = c1.count().toDouble
      val bg = ds.select(explode(graft.functions.shingleStrings(col("text"), 2)).as("s"))
      val x = bg.groupBy("s").agg(count(lit(1)).as("c2"))
        .join(c1, substring_index(col("s"), " ", 1) === col("t"))
        .select((-log((col("c2") + lit(1.0)) / (col("c1") + lit(v))) * TrainingData.LmUnat
          + lit(0.5)).as("x"))
        .select(abs(col("x") - round(col("x"), 0)).as("margin"))
        .agg(min("margin")).head().getDouble(0)
      assert(x > 1e-8, s"$sf: floor-boundary margin $x too small for exact parity")
    }
  }

  test("percentile gate keeps the top quartile per group, exactly") {
    val d = Seq(
      ("en", 1L, 10L), ("en", 2L, 20L), ("en", 3L, 30L), ("en", 4L, 40L),
      ("en", 5L, 50L),
      ("fr", 6L, 5L), ("fr", 7L, 5L),  // tie → id breaks it
      ("de", 8L, 7L)                   // singleton group: pr 0 → dropped
    ).toDF("lang", "doc_id", "n_toks")
    val out = TrainingData.percentileGate(
      d, col("lang"), col("n_toks"), col("doc_id"), keepFrom = 0.75)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("kept")).toMap
    // en: pr = (rn−1)/4, keep pr ≥ 0.75 → rn ≥ 4 → docs 4 and 5 (the
    // boundary doc IS kept). fr: pr ∈ {0, 1}, tie broken by id → doc 7.
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1,
      6L -> 0, 7L -> 1, 8L -> 0))
  }

  test("mixture sample flattens large domains and keeps small ones whole") {
    val out = TrainingData.mixtureSample(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, quota, sampled) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("quota"), r.getAs[Long]("n_sampled"))
      assert(quota == math.floor(3.0 * math.sqrt(n.toDouble)).toLong)
      assert(sampled == math.min(n, quota),
        s"domain must sample min(n=$n, quota=$quota), got $sampled")
    }
    // The flattening must actually bite somewhere: the harness corpus has
    // domains on both sides of the quota curve.
    assert(out.exists(r => r.getAs[Long]("n_sampled") < r.getAs[Long]("n_docs")))
    assert(out.exists(r => r.getAs[Long]("n_sampled") == r.getAs[Long]("n_docs")))
  }

  test("top tokens per language are ranked with total tie-breaks") {
    val out = TrainingData.topTokensPerLang(spark, dir).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == 10, s"$lang should have 10 ranked tokens")
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (na, nb) = (a.getAs[Long]("n"), b.getAs[Long]("n"))
          assert(na > nb || (na == nb &&
            a.getAs[String]("token") < b.getAs[String]("token")))
        case _ => ()
      }
    }
  }

  test("chunkDocs: stride coverage, boundary shapes, portable chunk hashes") {
    val t1 = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val d = Seq(
      (1L, t1),
      (2L, "only two"),
      (3L, ""), // empty → no chunks
      (4L, "   ") // whitespace-only → no chunks
    ).toDF("doc_id", "text")
    val out = TrainingData.chunkDocs(d, window = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id")) ->
        ((r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_hash"))))
      .toMap
    // doc 1: starts 0,3,6,9 → sizes 4,4,4,1; every token covered.
    assert(out.keys.count(_._1 == 1L) == 4)
    assert((0 to 3).map(c => out((1L, c))._1) == Seq(4, 4, 4, 1))
    // doc 2: a single short chunk.
    assert(out.keys.count(_._1 == 2L) == 1 && out((2L, 0))._1 == 2)
    // empty docs vanish rather than producing empty chunks.
    assert(!out.keys.exists(k => k._1 == 3L || k._1 == 4L))
    // chunk identity is md5 of the space-joined window — engine-portable.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out((1L, 1))._2 == md5hex("t4 t5 t6 t7"))
    assert(out((1L, 3))._2 == md5hex("t10"))
    assert(out((2L, 0))._2 == md5hex("only two"))
    // Overlap variant: window 4, stride 2 → chunks share a 2-token seam.
    val ov = TrainingData.chunkDocs(d.filter(col("doc_id") === 1L), window = 4, stride = 2)
      .collect().map(r => r.getAs[Int]("chunk_id") -> r.getAs[Int]("n_tokens")).toMap
    assert(ov == Map(0 -> 4, 1 -> 4, 2 -> 4, 3 -> 4, 4 -> 2))
  }

  test("classifierScore: exact integer logits against hand-computed feature weights") {
    // "x y" → features: x, y, "x y" (unigrams + the one bigram). Compute
    // each feature's bucket with the same kernel and a weights table
    // that scores those buckets ±known values; everything else 0.
    val docs = Seq((1L, "x y"), (2L, "x x")).toDF("doc_id", "text")
    def bucket(f: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % TrainingData.ClfBuckets
    }
    val w = Map(bucket("x") -> 7L, bucket("y") -> -3L,
      bucket("x y") -> 10L, bucket("x x") -> 1L)
    val weights = (0L until TrainingData.ClfBuckets.toLong)
      .map(b => (b, w.getOrElse(b, 0L))).toDF("b", "weight")
    val out = TrainingData.classifierScore(docs, weights)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feats"), r.getAs[Long]("logit_units"),
          r.getAs[Long]("mean_units")))).toMap
    // doc 1: x(7) + y(-3) + "x y"(10) = 14 over 3 feats → mean 4
    assert(out(1L) == ((3L, 14L, 4L)))
    // doc 2: x(7)·2 + "x x"(1) = 15 over 3 feats → mean 5
    assert(out(2L) == ((3L, 15L, 5L)))
  }

  test("classifierScore: negative logits divide toward zero (engine parity)") {
    val docs = Seq((1L, "p q")).toDF("doc_id", "text")
    def bucket(f: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % TrainingData.ClfBuckets
    }
    val w = Map(bucket("p") -> -4L, bucket("q") -> -2L, bucket("p q") -> -1L)
    val weights = (0L until TrainingData.ClfBuckets.toLong)
      .map(b => (b, w.getOrElse(b, 0L))).toDF("b", "weight")
    val r = TrainingData.classifierScore(docs, weights).collect().head
    // -7 over 3 feats: truncation gives -2 (DuckDB // agrees; floor is -3).
    assert(r.getAs[Long]("logit_units") == -7L && r.getAs[Long]("mean_units") == -2L)
  }

  test("prioritySample: keys are hash div weight; heavier weight never hurts") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def md560(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    // Weight 1 everywhere: key must equal the raw 60-bit hash (and the
    // zero/negative weight floor must clamp to 1, not divide by zero).
    val flat = TrainingData.prioritySample(docs, 10, weight = lit(0L)).collect()
    flat.foreach { r =>
      assert(r.getAs[Long]("key") == md560(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("w") == 1L)
    }
    // The sample IS the 10 smallest hashes under flat weights.
    val wantFlat = (1L to 50L).sortBy(md560).take(10).toSet
    assert(flat.map(_.getAs[Long]("doc_id")).toSet == wantFlat)
    // Monotonicity: boosting one excluded doc's weight enough must pull
    // it in (key = h div w is decreasing in w), without perturbing the
    // keys of any other doc.
    val outsider = (1L to 50L).sortBy(md560).last
    val boosted = TrainingData.prioritySample(docs, 10,
      weight = org.apache.spark.sql.functions
        .when(col("doc_id") === outsider, lit(1L << 60)).otherwise(lit(1L))).collect()
    assert(boosted.map(_.getAs[Long]("doc_id")).contains(outsider),
      "a dominant weight must guarantee inclusion")
    // Deterministic: same inputs, same sample, stable ranks 1..10.
    assert(boosted.map(_.getAs[Int]("sel_rank")).sorted.toSeq == (1 to 10))
  }

  test("split leakage: planted cross-split and same-split near-dups land in the right rows") {
    // Find concrete ids per split using the operator's own assignment.
    val splitOf = spark.range(1, 200).select(col("id").as("doc_id"),
        TrainingData.hashSplit(col("doc_id")).as("sp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("sp")).toMap
    val trainIds = splitOf.collect { case (id, "train") => id }.toSeq.sorted
    val valId = splitOf.collectFirst { case (id, "val") => id }.get
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"alt$i").mkString(" ")
    val docs = Seq(
      trainIds(0) -> base, // near-dup (identical) of the val doc → cross row
      valId -> base,
      trainIds(1) -> other, // identical pair inside train → same-split row
      trainIds(2) -> other,
      trainIds(3) -> (1 to 40).map(i => s"solo$i").mkString(" ") // no partner
    ).toDF("doc_id", "text")
    val got = TrainingData.splitLeakage(docs).collect().map(r =>
      (r.getAs[String]("split_lo"), r.getAs[String]("split_hi")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_lo"),
          r.getAs[Long]("n_docs_hi"))).toMap
    assert(got == Map(
      ("train", "val") -> ((1L, 1L, 1L)),
      ("train", "train") -> ((1L, 2L, 2L))))
  }

  test("embargo split: buckets partition the orders with disjoint, ordered date ranges") {
    val orders = graft.core.Tables.orders(spark, dir)
    val total = orders.count()
    val rows = TrainingData.embargoSplit(spark, dir).collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_orders"), r.getAs[java.sql.Date]("d_min"),
          r.getAs[java.sql.Date]("d_max"))).toMap
    assert(rows.keySet == Set("train", "embargo", "eval"))
    assert(rows.values.map(_._1).sum == total, "every order lands in exactly one bucket")
    val (_, _, trainMax) = rows("train")
    val (_, embMin, embMax) = rows("embargo")
    val (_, evalMin, evalMax) = rows("eval")
    assert(trainMax.before(embMin), "train ends strictly before the embargo")
    assert(embMax.before(evalMin), "the embargo ends strictly before eval")
    // Widths: eval is the trailing 60 days, the purged gap at most 7.
    def days(a: java.sql.Date, b: java.sql.Date) =
      (b.toLocalDate.toEpochDay - a.toLocalDate.toEpochDay).toInt
    assert(days(evalMin, evalMax) <= 59)
    assert(days(embMin, embMax) <= 6)
    assert(days(embMax, evalMin) >= 1)
  }

  test("split leakage: pair totals reconcile with the q17 pair set on the corpus") {
    val docs = graft.core.Tables.documents(spark, dir)
    val allPairs = Dedup.minHashNearDups(docs, threshold = 0.7, maxBucketSize = None).count()
    val rows = TrainingData.splitLeakage(docs).collect()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == allPairs,
      "every near-dup pair is attributed to exactly one split-pair row")
    rows.foreach { r =>
      assert(r.getAs[String]("split_lo") <= r.getAs[String]("split_hi"))
      assert(r.getAs[Long]("n_docs_lo") >= 1L && r.getAs[Long]("n_docs_hi") >= 1L)
    }
  }

  test("conformal calibration: threshold is the exact order statistic (q162)") {
    val dir = "/root/testdata/sf0.001"
    val rows = TrainingData.conformalCalibration(spark, dir).collect()
    assert(rows.nonEmpty)
    // Driver recompute: per lang, the val-split scores sorted; threshold =
    // the ceil(0.9*(n+1))-th smallest (capped at n); coverage recounted on
    // the test split.
    val all = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def split(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val nib = (h(0) >> 4) & 0xf
      if (nib <= 0xb) "train" else if (nib <= 0xd) "val" else "test"
    }
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val cal = all.filter(t => t._2 == lang && split(t._1) == "val")
        .sortBy(t => (t._3, t._1)).map(_._3)
      val n = cal.length
      val target = math.min(((n + 1) * 9 + 9) / 10, n)
      assert(r.getAs[Long]("n_cal") == n.toLong)
      assert(r.getAs[Long]("threshold") == cal(target - 1),
        s"$lang threshold is not the rank-$target order statistic")
      val ev = all.filter(t => t._2 == lang && split(t._1) == "test").map(_._3)
      assert(r.getAs[Long]("n_eval") == ev.length.toLong)
      assert(r.getAs[Long]("n_covered") ==
        ev.count(_ <= r.getAs[Long]("threshold")).toLong)
    }
  }

  test("logistic IRLS recovers a planted noisy teacher (q160 trainer)") {
    // 400 rows, one signal feature x; teacher: y = (10x + u > 12) with
    // deterministic noise u ∈ {0..7} — learnable, provably not separable
    // (x ∈ (0.5, 1.2) flips on u), so coefficients stay finite.
    val rows = (0 until 400).map { i =>
      val x = i / 200.0 // 0 .. 2
      val u = (i * 2654435761L >>> 13) % 8 // deterministic pseudo-noise
      val y = if (10 * x + u > 12) 1.0 else 0.0
      (y, 1.0, x)
    }
    val feat = rows.toDF("y", "x0", "x1")
    val fit = TrainingData.logisticTrain(feat, Seq("x0", "x1"))
    // Step-halved Newton: deviance never increases, ever.
    fit.deviances.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"deviance rose: $a -> $b")
    }
    assert(fit.deviances.last < fit.deviances.head * 0.7,
      "training must actually reduce deviance")
    // The signal coefficient is positive (higher x ⇒ higher P(y=1))
    // and the fit classifies far above the majority class.
    assert(fit.coefficients(1) > 0, "signal coefficient sign")
    val majority = math.max(fit.nPos, fit.n - fit.nPos)
    assert(fit.nCorrect.toDouble / fit.n > majority.toDouble / fit.n + 0.1,
      s"accuracy ${fit.nCorrect}/${fit.n} must beat majority $majority")
    // Stationarity at the optimum: tiny gradient.
    assert(fit.gradInfNorm < 1e-3 * fit.n, s"gradient ${fit.gradInfNorm}")
  }

  // ----------------------------------------------------- groupKFold (q181)

  private def md5Head8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("groupKFold: fold is a pure function of the group — no group straddles folds") {
    val rows = Seq(
      ("s1", "en", 10L), ("s1", "en", 20L), ("s1", "de", 5L),
      ("s2", "en", 7L), ("s2", "en", 3L), ("s3", "fr", 9L))
      .toDF("source", "lang", "n_chars")
    val out = TrainingData.groupKFold(rows,
      concat(col("source"), lit("/"), col("lang")), 5).collect()
    // Sum of per-fold distinct groups must equal the global distinct
    // count (4) — a group split across folds would double-count.
    assert(out.map(_.getAs[Long]("n_groups")).sum == 4L)
    assert(out.map(_.getAs[Long]("n_docs")).sum == 6L)
    assert(out.map(_.getAs[Long]("total_chars")).sum == 54L)
    // Cross-check one fold id against a reference md5.
    val expected = md5Head8("fold:s1/en") % 5
    val f = out.filter(_.getAs[Long]("n_groups") > 0)
    assert(out.exists(_.getAs[Long]("fold") == expected))
  }

  test("groupKFold: assignment is stable under corpus growth") {
    val base = Seq(("s1", "en", 1L), ("s2", "de", 2L))
      .toDF("source", "lang", "n_chars")
    val grown = base union Seq(("s1", "en", 3L)).toDF("source", "lang", "n_chars")
    def foldOf(df: org.apache.spark.sql.DataFrame) =
      TrainingData.groupKFold(df,
        concat(col("source"), lit("/"), col("lang")), 5)
        .collect().map(r => r.getAs[Long]("fold")).toSet
    assert(foldOf(grown).subsetOf(foldOf(base)) || foldOf(base).subsetOf(foldOf(grown)))
  }

  // ---------------------------------------------- spanCorruptionStats (q182)

  test("spanCorruptionStats: matches a reference mask walk, spans <= masked") {
    val oneDoc = Seq((7L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TrainingData.spanCorruptionStats(oneDoc).collect().head
    // Reference walk with the same hash channel.
    val masked = (1 to 40).map(p => md5Head8(s"7:$p") % 100 < 15)
    val nMasked = masked.count(identity).toLong
    val nSpans = masked.zipWithIndex.count { case (m, i) =>
      m && (i == 0 || !masked(i - 1)) }.toLong
    assert(r.getAs[Long]("n_tokens") == 40L)
    assert(r.getAs[Long]("n_masked") == nMasked)
    assert(r.getAs[Long]("n_spans") == nSpans)
    assert(r.getAs[Long]("n_spans") <= r.getAs[Long]("n_masked"))
    assert(r.getAs[Long]("corruption_ppm") == 1000000L * nMasked / 40L)
  }

  test("spanCorruptionStats: token-less docs are excluded, not fabricated") {
    val d = Seq((1L, "a b c"), (2L, "   ")).toDF("doc_id", "text")
    val out = TrainingData.spanCorruptionStats(d).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L))
  }

  // --------------------------------------------------------- curationFunnel

  test("curationFunnel: stages only shrink; totals reconcile with the kernels") {
    val out = TrainingData.curationFunnel(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n0, n1, n2, n3) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"),
        r.getAs[Long]("n2"), r.getAs[Long]("n3"))
      assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= 0,
        s"funnel must be monotone: $r")
      assert(r.getAs[Long]("retention_ppm") == 1000000L * n3 / n0)
    }
    // S2 keeps the top quartile per language of S1: the global S2 total
    // must be ~25% of S1 (within per-language rounding).
    val t1 = out.map(_.getAs[Long]("n1")).sum
    val t2 = out.map(_.getAs[Long]("n2")).sum
    assert(t2 * 10 >= t1 * 2 && t2 * 10 <= t1 * 4,
      s"quartile gate should keep ~25%: $t1 -> $t2")
  }

  test("hashQuotaSample selects row-for-row what the per-stratum rank sort selects") {
    // 10k rows over 3 skewed strata forces multi-row md5 buckets, so the
    // boundary-bucket residual ranking (not just whole-bucket keeps) is
    // exercised; quotas hit all three regimes: deep inside the hash order
    // (5k of 8k), near-total (190 of 200), and over-quota (keep all).
    val rows = spark.range(10000).selectExpr(
      "CASE WHEN id < 8000 THEN 'big' WHEN id < 9800 THEN 'mid' ELSE 'tiny' END AS src",
      "id AS k")
    val quotas = Seq(("big", 5000L), ("mid", 190L), ("tiny", 400L))
      .toDF("src", "take")
    val fast = TrainingData.hashQuotaSample(rows, Seq("src"), col("k"), quotas)
      .select("src", "k")
    val ranked = rows
      .withColumn("h", md5(col("k").cast("string").cast("binary")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("h"), col("k"))))
      .join(quotas, "src").filter(col("rk") <= col("take"))
      .select("src", "k")
    assert(fast.count() == 5000 + 190 + 200)
    assert(fast.except(ranked).count() == 0 && ranked.except(fast).count() == 0,
      "bucket refinement must equal the rank-sort selection exactly")
    // Per-stratum quota exactness (tiny is over-quota: all 200 kept).
    val per = fast.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("big" -> 5000L, "mid" -> 190L, "tiny" -> 200L))
  }

  test("hashQuotaSample: zero quota and empty stratum degenerate cleanly") {
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("src", "k")
    val quotas = Seq(("a", 0L), ("b", 5L), ("ghost", 3L)).toDF("src", "take")
    val got = TrainingData.hashQuotaSample(rows, Seq("src"), col("k"), quotas)
      .select("src", "k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("b", 3L)), s"zero-quota stratum must vanish: $got")
  }

  // ------------------------------------------------- mixtureWeights (q216)

  test("mixtureWeights: alpha < 1 up-samples the tail, down-samples the head") {
    val rows = Seq(("big", 1000000L), ("small", 1000L)).toDF("src", "toks")
    val out = TrainingData.mixtureWeights(rows, "src", "toks")
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val (big, small) = (out("big"), out("small"))
    // Natural share of the tail is ~999 ppm; smoothed weight must exceed it.
    assert(small.getAs[Long]("w_ppm") > small.getAs[Long]("p_ppm"))
    assert(big.getAs[Long]("w_ppm") < big.getAs[Long]("p_ppm"))
    assert(small.getAs[Long]("boost_ppm") > 1000000L)
    assert(big.getAs[Long]("boost_ppm") < 1000000L)
    // pow_micro matches the JVM's own exp/ln composition exactly.
    assert(big.getAs[Long]("pow_micro") ==
      math.floor(math.exp(0.7 * math.log(1000000.0)) * 1e6 + 0.5).toLong)
    // Weights sum to 1e6 within the k-source truncation slack.
    assert(math.abs(out.values.map(_.getAs[Long]("w_ppm")).sum - 1000000L) <= 2L)
  }

  test("mixtureWeights: alpha = 1 reproduces the natural shares") {
    val rows = Seq(("a", 750L), ("b", 250L)).toDF("src", "toks")
    val out = TrainingData.mixtureWeights(rows, "src", "toks", alphaTenths = 10)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    out.values.foreach { r =>
      assert(math.abs(r.getAs[Long]("w_ppm") - r.getAs[Long]("p_ppm")) <= 1L)
      assert(math.abs(r.getAs[Long]("boost_ppm") - 1000000L) <= 10L)
    }
  }

  test("mixtureWeights: an empty source carries zero weight, null boost") {
    val rows = Seq(("a", 100L), ("z", 0L)).toDF("src", "toks")
    val out = TrainingData.mixtureWeights(rows, "src", "toks")
      .filter(col("src") === "z").collect().head
    assert(out.getAs[Long]("w_ppm") == 0L)
    assert(out.isNullAt(out.fieldIndex("boost_ppm")))
  }

  test("q237 self substring dedup: cross-doc span, within-doc repeat, " +
    "clean doc, strict majority flag") {
    val x = (1 to 12).map(i => s"x$i").mkString(" ") // shared 12-token span
    val y = (1 to 8).map(i => s"y$i").mkString(" ")  // 8-token self-repeat
    val docs = Seq(
      // A: 5 + 12 + 8 = 25 tokens; the shared span covers 12 (<= half).
      (1L, s"a1 a2 a3 a4 a5 $x a6 a7 a8 a9 a10 a11 a12 a13"),
      // B: 3 + 12 + 5 = 20 tokens; 12 duplicated > half -> flagged.
      (2L, s"b1 b2 b3 $x b4 b5 b6 b7 b8"),
      // C: clean.
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      // D: y ... (10-token gap > k) ... y — TWO islands of 8, within-doc.
      (4L, s"$y d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 $y")
    ).toDF("doc_id", "text")
    val got = TrainingData.selfSubstringDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toMap
    // A 12-token shared span = 5 consecutive duplicated 8-grams = ONE
    // merged island of max-min+8 = 12 tokens.
    assert(got(1L) == ((25L, 1L, 12L, 12L, 0)), s"doc A: ${got(1L)}")
    assert(got(2L) == ((20L, 1L, 12L, 12L, 1)), s"doc B: ${got(2L)}")
    assert(got(3L) == ((10L, 0L, 0L, 0L, 0)), s"doc C: ${got(3L)}")
    assert(got(4L) == ((26L, 2L, 16L, 8L, 1)), s"doc D: ${got(4L)}")
  }

  test("q240 removal artifact: duplicated spans are cut, clean docs pass " +
    "through verbatim (canonical token form)") {
    val x = (1 to 12).map(i => s"x$i").mkString(" ")
    val y = (1 to 8).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 $x a6 a7 a8 a9 a10 a11 a12 a13"),
      (2L, s"b1 b2 b3 $x b4 b5 b6 b7 b8"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (4L, s"$y d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 $y")
    ).toDF("doc_id", "text")
    val got = TrainingData.selfSubstringRemove(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((25L, 13L,
      "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12 a13")), s"doc A: ${got(1L)}")
    assert(got(2L) == ((20L, 8L, "b1 b2 b3 b4 b5 b6 b7 b8")), s"doc B: ${got(2L)}")
    assert(got(3L) == ((10L, 10L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")),
      s"doc C: ${got(3L)}")
    assert(got(4L) == ((26L, 10L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")),
      s"doc D: ${got(4L)}")
  }

  test("q237 islands chain ADJACENT intervals (position gap exactly k) " +
    "into one fully-covered span, and break beyond it") {
    // doc 1 = P ++ Q back to back: the P-gram matches at pos 0 (shared
    // with doc 2), the Q-gram at pos 8 (shared with doc 3); straddling
    // grams are unique. Gap 8 == k means intervals [0,7] and [8,15]
    // ADJOIN — every token 0..15 sits in a duplicated 8-gram, so they
    // must merge into ONE 16-token span (a break there would double-
    // count nothing but split a contiguous removal region).
    val p = (1 to 8).map(i => s"p$i").mkString(" ")
    val q = (1 to 8).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p $q u1 u2 u3 u4"),                      // 20 tokens
      (2L, s"z1 z2 $p z3 z4 z5 z6 z7 z8 z9 z10"),      // 18 tokens
      (3L, s"$q w1 w2 w3 w4 w5 w6")                    // 14 tokens
    ).toDF("doc_id", "text")
    val got = TrainingData.selfSubstringDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toMap
    assert(got(1L) == ((20L, 1L, 16L, 16L, 1)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((18L, 1L, 8L, 8L, 0)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((14L, 1L, 8L, 8L, 1)), s"doc 3: ${got(3L)}")
  }
}
