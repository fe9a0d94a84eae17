package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token helpers handle trailing spaces and empties") {
    val d = Seq((1L, "a b  c "), (2L, "")).toDF("id", "text")
    val out = d.select(col("id"),
      size(TextAnalysis.tokens(col("text"))).as("n"),
      size(TextAnalysis.tokenSet(col("text"))).as("nd")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((3, 3)))
    assert(out(2L) == ((0, 0)))
  }

  test("shingleSet builds distinct word n-grams, short docs yield none") {
    val d = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val out = d.select(col("id"), TextAnalysis.shingleSet(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)
  }

  test("regex tokenizer splits letter/digit/punct runs") {
    val d = Seq((1L, "abc123 def!")).toDF("id", "text")
    // abc | 123 | def | !  → 4
    assert(d.select(TextAnalysis.regexTokenCount(col("text"))).head().getInt(0) == 4)
  }

  test("langId picks marker-dominant language with fixed tie priority") {
    val d = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "el perro la casa los gatos que"),
      (4L, "xyzzy plugh qwert")).toDF("id", "text")
    val out = d.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val d = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "other")).toDF("id", "text")
    val fps = d.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("repetition signals separate boilerplate from varied text") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam ham"), // 8 toks, top 7
      (2L, "eight distinct tokens all appearing exactly once here"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((8L, 0.25, 0.875)), out(1L).toString) // 2/8 distinct, 7/8 top
    assert(out(2L) == ((8L, 1.0, 0.125)), out(2L).toString) // all distinct
    assert(out(3L) == ((0L, 0.0, 0.0)), "empty doc must yield zeros, not nulls")
  }

  test("quality score rewards mid-length stopword-bearing text") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs"),
      (2L, "x")).toDF("id", "text")
    val out = d.select(col("id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) < 0.5)
  }

  test("tf-idf ranks rare terms above common ones with term tie-breaks") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry cherry")
    ).toDF("doc_id", "text")
    // N=3; df: apple 2, banana 2, cherry 2 → idf = ln(4/3) for all, so
    // ranking reduces to tf desc then term asc — hand-checkable.
    val idf = math.log(4.0 / 3.0)
    val out = TextAnalysis.tfIdf(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getLong(2), r.getDouble(4)))
      .toMap
    assert(out((1L, 1)) == (("apple", 2L, math.rint(2 * idf * 1e4) / 1e4)))
    assert(out((1L, 2))._1 == "banana")
    assert(out((2L, 1)) == (("banana", 1L, math.rint(idf * 1e4) / 1e4))) // tie: banana < cherry
    assert(out((2L, 2))._1 == "cherry")
    assert(out((3L, 1)) == (("cherry", 3L, math.rint(3 * idf * 1e4) / 1e4)))
    // top-3 of a 2-term doc yields 2 rows, not a padded third
    assert(!out.contains((2L, 3)))
  }

  test("shingle_strings keeps duplicates and order; n=1 is the token stream") {
    val d = Seq((1L, "A  b\tc d a b")).toDF("doc_id", "text")
    val two = d.select(graft.functions.shingleStrings(col("text"), 2).as("s"))
      .head().getSeq[String](0)
    assert(two == Seq("a b", "b c", "c d", "d a", "a b")) // dup "a b" kept
    val one = d.select(graft.functions.shingleStrings(col("text"), 1).as("s"))
      .head().getSeq[String](0)
    assert(one == Seq("a", "b", "c", "d", "a", "b"))
    val short = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(graft.functions.shingleStrings(col("text"), 3).as("s"))
      .head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("vocabCoverage: hand-checked coverage with deterministic tie-breaks") {
    // Global counts: a=3, b=3, c=2, d=1. k=2 → vocab {a, b}: c ties with
    // nobody, but a and b tie at 3 and both fit; the k boundary falls
    // between b (rank 2) and c (rank 3).
    val d = Seq(
      (1L, "en", "a a b c"),
      (2L, "en", "b d"),
      (3L, "fr", "a b c")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.vocabCoverage(d, k = 2).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_covered"),
          r.getAs[Double]("coverage")))).toMap
    assert(out("en") == ((6L, 4L, 0.666667))) // a,a,b,b covered of 6
    assert(out("fr") == ((3L, 2L, 0.666667))) // a,b covered of 3
    // Tie at the boundary: with k=3, c (count 2) enters before d —
    // count-desc then token-asc ordering is what both engines compute.
    val k3 = TextAnalysis.vocabCoverage(d, k = 3).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_covered")).toMap
    assert(k3("en") == 5L && k3("fr") == 3L)
  }

  test("pmiPairs: perfectly-associated pairs outrank independent ones; support gate holds") {
    // (a,b) co-occur in all 4 docs; (a,c) in 2 of 4; (a,d) only once —
    // below min support 2, so it must not appear at all.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "a b"), (4L, "a b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairsOf(docs, minPairDocs = 2, k = 10).collect()
    val pairs = out.map(r => (r.getAs[String]("term_x"), r.getAs[String]("term_y")) ->
      r.getAs[Long]("pmi_unats")).toMap
    assert(!pairs.contains(("a", "d")) && !pairs.contains(("b", "d")),
      "sub-support pairs must be gated out")
    // pmi(a,b) = ln(4·4/(4·4)) = 0; pmi(b,c) = ln(4·2/(4·2)) = 0;
    // pmi(a,c)=0 too — all independent-or-perfect here, so check exact values.
    assert(pairs(("a", "b")) == 0L)
    // (c appears in 2 docs, always with a and b): ln(4·2/(4·2)) = 0.
    assert(pairs(("a", "c")) == 0L && pairs(("b", "c")) == 0L)
    // Now make one pair anti-associated: e and f never co-occur → absent.
    val docs2 = Seq(
      (1L, "e x"), (2L, "f x"), (3L, "e x"), (4L, "f x"))
      .toDF("doc_id", "text")
    val out2 = TextAnalysis.pmiPairsOf(docs2, minPairDocs = 2, k = 10)
      .collect().map(r => (r.getAs[String]("term_x"), r.getAs[String]("term_y")) ->
        r.getAs[Long]("pmi_unats")).toMap
    assert(!out2.contains(("e", "f")), "never-co-occurring pair absent")
    // pmi(e,x) = ln(4·2/(2·4)) = 0 — e always rides with the global x.
    assert(out2(("e", "x")) == 0L)
  }

  test("pmiPairs: positive association scores ln-exactly in micro-nats") {
    // g,h co-occur in both their docs, each appearing nowhere else;
    // corpus of 4 docs → pmi = ln(4·2/(2·2)) = ln 2.
    val docs = Seq(
      (1L, "g h"), (2L, "g h"), (3L, "z y"), (4L, "z y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairsOf(docs, minPairDocs = 2, k = 10)
      .collect().map(r => (r.getAs[String]("term_x"), r.getAs[String]("term_y")) ->
        r.getAs[Long]("pmi_unats")).toMap
    val ln2unats = math.floor(math.log(2.0) * 1e6 + 0.5).toLong
    assert(out(("g", "h")) == ln2unats && out(("y", "z")) == ln2unats)
  }

  test("fuzzy token pairs: blocking is exact-recall vs brute force, verify is lev=1") {
    val dir = "/root/testdata/sf0.001"
    val blocked = TextAnalysis.fuzzyTokenPairs(spark, dir).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"))).toSet
    assert(blocked.nonEmpty, "typo-augmented vocab must yield pairs")
    // Brute-force ground truth over the same augmented vocabulary.
    val base = graft.core.Tables.documents(spark, dir)
      .select(explode(graft.functions.shingleStrings(col("text"), 1)).as("t"))
      .distinct()
    val aug = base
      .unionAll(base.filter(length(col("t")) >= 4).select(expr("substring(t, 2)").as("t")))
      .unionAll(base.filter(length(col("t")) >= 4)
        .select(expr("substring(t, 1, length(t) - 1)").as("t")))
      .distinct()
    val brute = aug.toDF("a").crossJoin(aug.toDF("b"))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked == brute,
      s"missed: ${(brute -- blocked).take(5)}; extra: ${(blocked -- brute).take(5)}")
  }

  test("skipgramPairs: window bounds and duplicate tokens count exactly") {
    import spark.implicits._
    val dir = tmpDir("skipgram")
    Seq((1L, "a b c d", "s"), (2L, "a b a", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def pairs(w: Int) = TextAnalysis.skipgramPairs(spark, dir, window = w, k = 100)
      .collect().map(r => (r.getAs[String]("term_a"), r.getAs[String]("term_b")) ->
        r.getAs[Long]("n_cooc")).toMap
    // window=1: adjacency only. Doc2 "a b a" adds (a,b) and (b,a).
    assert(pairs(1) == Map(("a", "b") -> 2L, ("b", "c") -> 1L,
      ("c", "d") -> 1L, ("b", "a") -> 1L))
    // window=3: all ordered pairs within distance 3; doc2 adds (a,a) at
    // distance 2 — self-pairs at nonzero distance are real skip-grams.
    val w3 = pairs(3)
    assert(w3(("a", "d")) == 1L && w3(("a", "c")) == 1L && w3(("a", "a")) == 1L)
    assert(w3(("a", "b")) == 2L, "duplicate-token doc keeps both (a,b) hits")
    assert(!w3.contains(("d", "a")), "pairs are ordered left-to-right only")
  }

  test("sourceDiversity: degenerate and uniform slices hit exact entropy poles") {
    import spark.implicits._
    val dir = tmpDir("srcdiv2")
    Seq(
      (1L, "spam spam spam spam", "mono"),  // one type, entropy 0
      (2L, "alpha beta gamma delta", "uni")) // uniform over 4 types: ln 4
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.sourceDiversity(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_hapax"), r.getAs[Long]("ttr_micro"),
          r.getAs[Long]("hapax_micro"), r.getAs[Long]("entropy_nanonats")))).toMap
    assert(out("mono") == ((4L, 1L, 0L, 250000L, 0L, 0L)))
    // Uniform over 4: each term contributes floor(0.25·ln4·1e9 + 0.5).
    val perTerm = math.floor(0.25 * math.log(4.0) * 1e9 + 0.5).toLong
    assert(out("uni") == ((4L, 4L, 4L, 1000000L, 1000000L, 4 * perTerm)))
  }

  test("sourceDivergence: identical sources score 0, disjoint ones cap at 2·ln2") {
    import spark.implicits._
    val dir = tmpDir("srcdiv")
    // s1 ≡ s2 token-for-token; s3 shares no vocabulary with either.
    Seq(
      (1L, "alpha beta beta gamma", "s1"),
      (2L, "alpha beta beta gamma", "s2"),
      (3L, "delta epsilon zeta eta", "s3"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.sourceDivergence(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_shared_terms"), r.getAs[Long]("jsd_nanonats")))).toMap
    val (sharedIdent, jsdIdent) = out(("s1", "s2"))
    assert(jsdIdent == 0L, "identical distributions diverge by exactly zero")
    assert(sharedIdent == 3L, "alpha/beta/gamma are the shared types")
    val (shared13, jsd13) = out(("s1", "s3"))
    assert(shared13 == 0L && jsd13 > 0L)
    assert(jsd13 <= math.ceil(2 * math.log(2) * 1e9).toLong,
      "JSD (un-halved) is bounded by 2·ln2")
    assert(out(("s1", "s3"))._2 == out(("s2", "s3"))._2,
      "identical sources diverge identically from a third")
  }

  test("q124 novelty: first doc is all-novel and novel counts tile the gram space") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.shingleNovelty(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("novelty_ppm") <= 1000000L)
    }
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // The smallest doc_id cannot have seen any earlier shingle.
    val first = byId(byId.keySet.min)
    assert(first.getAs[Long]("novelty_ppm") == 1000000L)
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_shingles"))
    // Every distinct shingle in the corpus is novel in exactly one doc.
    val distinctShingles = graft.core.Tables.documents(spark, dir)
      .select(explode(graft.analytics.Dedup.shingleHashSet(col("text"))).as("h"))
      .agg(countDistinct(col("h"))).collect().head.getLong(0)
    assert(out.map(_.getAs[Long]("n_novel")).sum == distinctShingles,
      "sum of per-doc novel counts == corpus distinct shingle count " +
        "(string grams and 64-bit hash grams agree at this density)")
  }

  test("bpe pair stats: hand-computed weighted adjacent-pair table") {
    import spark.implicits._
    // Vocab after filtering: abab×1, ab×3, baba×1 ("X9"/"7q"/"a" drop:
    // non-alphabetic or single char). Pair occurrences weighted by word
    // frequency: ab = 2(abab) + 3(ab) + 1(baba) = 6, ba = 1 + 2 = 3.
    val docs = Seq(
      (1L, "abab ab ab X9 a"),
      (2L, "ab baba 7q")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(docs, topK = 20).collect().map(r =>
      (r.getAs[Int]("rank"), r.getAs[String]("pair"),
        r.getAs[Long]("n_words"), r.getAs[Long]("total_count"))).toSeq
    assert(got == Seq((1, "ab", 3L, 6L), (2, "ba", 2L, 3L)),
      s"got $got")
    // The rank-1 row IS the next BPE merge — determinism is the contract.
  }

  test("vocab growth: hand-computed checkpoint curve") {
    import spark.implicits._
    // cp1 = docs 1,2 (CkptDocs=50); cp2 = doc 51.
    val docs = Seq((1L, "a b a"), (2L, "b c"), (51L, "c d d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => r.getAs[Long]("cp") ->
        (r.getAs[Long]("docs_cum"), r.getAs[Long]("tokens_cum"),
          r.getAs[Long]("vocab_cum"), r.getAs[Long]("ttr_ppm"))).toMap
    assert(got == Map(
      1L -> ((2L, 5L, 3L, 600000L)),
      2L -> ((3L, 8L, 4L, 500000L))))
  }

  test("vocab growth: corpus curve terminates at the exact corpus totals") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, dir)
    val rows = TextAnalysis.vocabGrowthDocs(spark, dir).collect()
      .sortBy(_.getAs[Long]("cp"))
    assert(rows.length >= 2, "fixture spans several checkpoints")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("vocab_cum") <= b.getAs[Long]("vocab_cum"))
      assert(a.getAs[Long]("tokens_cum") < b.getAs[Long]("tokens_cum"))
    }
    val tok = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
    val last = rows.last
    assert(last.getAs[Long]("tokens_cum") == tok.count())
    assert(last.getAs[Long]("vocab_cum") ==
      tok.agg(countDistinct(col("t"))).collect().head.getLong(0))
  }

  test("bpe pair stats: corpus ranking is consistent and bounded") {
    val rows = TextAnalysis.bpePairStats(spark, "/root/testdata/sf0.001", topK = 20)
      .collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    val totals = rows.map(_.getAs[Long]("total_count")).toSeq
    assert(totals == totals.sortBy(-_), "rows ordered by descending weight")
    rows.foreach { r =>
      assert(r.getAs[String]("pair").length == 2)
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("total_count"))
    }
  }

  test("bigram cross-entropy: common transitions score low, rare high (q159)") {
    import spark.implicits._
    // 10 docs of the dominant pattern "a b a b …", one rare-transition
    // doc. Under the corpus bigram LM, the dominant docs' transitions
    // are high-probability (low surprisal); the rare doc's are near the
    // smoothing floor (high surprisal). A 1-token doc has no bigrams and
    // must be absent, not crash.
    val docs = ((1 to 10).map(i => (i.toLong, "a b a b a b a b")) ++
      Seq((90L, "q z w v q z"), (99L, "solo"))).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropyOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("xent_sum_unats"),
          r.getAs[Long]("xent_mean_unats"))).toMap
    assert(!out.contains(99L), "a bigram-free doc is excluded")
    assert(out(1L)._1 == 7 && out(90L)._1 == 5)
    assert(out(90L)._3 > out(1L)._3 * 2,
      s"rare transitions must out-surprise the dominant pattern: $out")
    // mean is the truncating integer division of the exact sum.
    out.values.foreach { case (n, s, m) => assert(m == s / n) }
    // Driver recompute of one cell: P(b|a) over the corpus —
    // c(a,b) counts "a b" transitions, c(a·) all transitions from a,
    // V the corpus vocabulary; surprisal = floor(ln((c1+V)/(c12+1))·1e6+0.5).
    val v = 7 // corpus vocabulary: a b q z w v solo
    def cell(c1: Int, c12: Int): Long =
      math.floor(math.log((c1 + v).toDouble / (c12 + 1)) * 1e6 + 0.5).toLong
    // "a b" ×4/doc (c12=40, c1("a")=40); "b a" ×3/doc (c12=30, c1("b")=30).
    assert(out(1L)._2 == 4 * cell(40, 40) + 3 * cell(30, 30),
      "dominant doc total decomposes into its two transition cells")
  }

  test("Good–Turing profile (q208): identities hold and one source " +
    "matches a full driver recompute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.goodTuringProfile(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("n3"),
          r.getAs[Long]("missing_mass_ppm"))).toMap
    assert(out.nonEmpty)
    out.values.foreach { case (n, v, n1, n2, n3, mm) =>
      assert(v >= n1 + n2 + n3 && n >= v, "count identities")
      assert(mm == 1000000L * n1 / n, "missing mass is the exact quotient")
    }
    // Driver recompute of the first source from raw tokens.
    val src = out.keys.min
    val counts = graft.core.Tables.documents(spark, dir)
      .filter(col("source") === src).select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = counts.values.sum
    val byR = counts.values.groupBy(identity).view.mapValues(_.size.toLong)
    assert(out(src) == ((n, counts.size.toLong,
      byR.getOrElse(1L, 0L), byR.getOrElse(2L, 0L), byR.getOrElse(3L, 0L),
      1000000L * byR.getOrElse(1L, 0L) / n)),
      s"driver recompute mismatch for $src: ${out(src)}")
  }

  test("Zipf slope (q211): full driver recompute for one source; heads bounded, slopes negative") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.zipfSlope(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // Structural: every head is min(vocab, R) rows and natural text slopes down.
    val vocab = graft.core.Tables.documents(spark, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("source").agg(countDistinct("t").as("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (src, r) =>
      assert(r.getAs[Long]("n_ranks") == math.min(vocab(src), TextAnalysis.ZipfHead.toLong))
      assert(r.getAs[Long]("zipf_slope_micro") < 0L, s"$src slope must be negative")
      val r2 = r.getAs[Long]("fit_r2_ppm")
      assert(r2 >= 0L && r2 <= 1000000L, s"$src r2 out of range: $r2")
    }
    // Full recompute of one source in plain JVM arithmetic.
    val src = out.keys.min
    val counts = graft.core.Tables.documents(spark, dir)
      .filter(col("source") === src).select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val head = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(TextAnalysis.ZipfHead)
    val xs = head.indices.map(i => math.floor(math.log((i + 1).toDouble) * 1000).toLong)
    val ys = head.map { case (_, n) => math.floor(math.log(n.toDouble) * 1000).toLong }
    val nr = head.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(b => b * b).sum)
    val num = nr.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val det = nr.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val dety = nr.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
    val r = out(src)
    assert((r.getAs[Long]("sx"), r.getAs[Long]("sy"), r.getAs[Long]("sxy"),
      r.getAs[Long]("sxx"), r.getAs[Long]("syy")) == ((sx, sy, sxy, sxx, syy)),
      s"sufficient stats mismatch for $src")
    assert(r.getAs[Long]("zipf_slope_micro") ==
      math.floor(num / det * 1e6 + 0.5).toLong)
    assert(r.getAs[Long]("fit_r2_ppm") ==
      math.floor(num * num / (det * dety) * 1e6).toLong)
  }

  test("Zipf slope (q211): milli-nat floors sit clear of their boundaries") {
    // The q159/q195 floor-at-the-edge audit: floor(ln(k)·1000) is only
    // engine-portable when ln(k)·1000 is not within double-rounding
    // distance of an integer. Check every rank 1..R and every head
    // frequency observed at every harness SF (k = 1 hits 0 EXACTLY in
    // both engines — excluded by the k ≥ 2 guard).
    def margin(k: Long): Double = {
      val v = math.log(k.toDouble) * 1000
      math.abs(v - math.rint(v))
    }
    (2 to TextAnalysis.ZipfHead).foreach { k =>
      assert(margin(k) > 1e-7, s"rank $k milli-nat sits on a floor boundary")
    }
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val freqs = graft.core.Tables.documents(spark, dir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy("source", "t").count()
        .filter(col("count") >= 2)
        .select("count").distinct().collect().map(_.getLong(0))
      freqs.foreach { n =>
        assert(margin(n) > 1e-7, s"frequency $n milli-nat sits on a floor boundary ($dir)")
      }
    }
  }

  // ------------------------------------------------------ richness (q219)

  test("richnessOf: hand Chao1 / jackknife / coverage values") {
    // "a a b c": D=3, N=4, n1=2 (b,c), n2=1 (a).
    // chao1 = 3 + 2*1/(2*2) = 3.5; jack1 = 5; coverage = 1 - 2/4 = 0.5.
    val docs = Seq(("s", "a a b c")).toDF("source", "text")
    val out = TextAnalysis.richnessOf(docs).collect().head
    assert((out.getAs[Long]("n_tokens"), out.getAs[Long]("d_obs"),
      out.getAs[Long]("n1"), out.getAs[Long]("n2")) == ((4L, 3L, 2L, 1L)))
    assert(out.getAs[Long]("chao1_micro") == 3500000L)
    assert(out.getAs[Long]("jack1") == 5L)
    assert(out.getAs[Long]("coverage_ppm") == 500000L)
  }

  // ------------------------------------------------- coverageCurve (q222)

  test("coverageCurve: hand R90/R99 on a 9-1 split") {
    // "a"x9 "b"x1: rank 1 covers 90% exactly (10*9 >= 9*10), rank 2
    // needed for 99%.
    val docs = Seq(("s", ("a " * 9 + "b").trim)).toDF("source", "text")
    val out = TextAnalysis.coverageCurve(docs).collect().head
    assert((out.getAs[Long]("vocab"), out.getAs[Long]("n_tokens")) == ((2L, 10L)))
    assert((out.getAs[Long]("r90"), out.getAs[Long]("r99")) == ((1L, 2L)))
    assert(out.getAs[Long]("r90_vocab_ppm") == 500000L)
    assert(out.getAs[Long]("r99_vocab_ppm") == 1000000L)
  }

  test("coverageCurve: uniform corpus needs 90% of the vocabulary") {
    // 10 tokens once each: cum at rank k is k/10 -> r90 = 9, r99 = 10.
    val docs = Seq(("s", (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("source", "text")
    val out = TextAnalysis.coverageCurve(docs).collect().head
    assert((out.getAs[Long]("r90"), out.getAs[Long]("r99")) == ((9L, 10L)))
  }

  // -------------------------------------------- sourceOverlap (q83, r10)

  test("sourceOverlap: bitmask form equals the self-join form row-for-row") {
    val dir = "/root/testdata/sf0.001"
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_shared"), r.getAs[Long]("jaccard_u"))).toMap
    val fast = key(TextAnalysis.sourceOverlap(spark, dir))
    val ss = graft.core.Tables.documents(spark, dir)
      .select(col("source"),
        explode(TextAnalysis.shingleSet(col("text"), 3)).as("sh"))
    val slow = key(TextAnalysis.sourceOverlapJoin(ss))
    assert(fast.nonEmpty && fast == slow,
      s"bitmask rewrite drifted: fast=${fast.size} slow=${slow.size}")
  }

  test("sourceOverlap: >63 sources dispatches to the join fallback and " +
    "still answers exactly (r12 verdict)") {
    // 70 sources blow the LONG bitmask; sourceOverlap must take the
    // self-join path end-to-end (read from dir → explode → fallback)
    // and match the directly-computed join form. Sources share shingle
    // space in overlapping pairs so the answer is non-trivial.
    import spark.implicits._
    val dir = tmpDir("overlap-wide")
    val docs = (0 until 70).flatMap { s =>
      // Each source holds its own trigram plus its neighbor's: adjacent
      // sources overlap, distant ones are disjoint.
      Seq((s.toLong * 2, s"own$s alpha$s beta$s gamma$s", s"src$s"),
        (s.toLong * 2 + 1, s"own${(s + 1) % 70} alpha${(s + 1) % 70} " +
          s"beta${(s + 1) % 70} gamma${(s + 1) % 70}", s"src$s"))
    }.toDF("doc_id", "text", "source")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("jaccard_u")).toMap
    val ss = docs.select(col("source"),
      explode(TextAnalysis.shingleSet(col("text"), 3)).as("sh"))
    val direct = TextAnalysis.sourceOverlapJoin(ss).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("jaccard_u")).toMap
    assert(out.nonEmpty && out == direct,
      s"fallback drifted: out=${out.size} direct=${direct.size}")
    // Each 4-word doc yields 2 trigrams, so source s's set is
    // {T(s), T(s+1)} (4 shingles); adjacent sources share one doc's
    // trigrams: jaccard = 2e6 / (4 + 4 - 2).
    assert(out(("src0", "src1")) == 333333L)
    assert(out.keys.forall { case (a, b) => a < b })
  }

  // --------------------------------------- repetitionSignals (q235, r13)

  test("ngramRepetitionSignals: hand-verified top-gram and overlap-safe " +
    "duplicate-gram coverage") {
    val docs = Seq(
      // "a b a b a": 2-grams (a b, b a, a b, b a) -> top = "a b" (count
      // 2, lexicographic tie-break over "b a"); chars = 2*3*1e6 / 9.
      // 3-grams: "a b a"@0, "b a b"@1, "a b a"@2 -> "a b a" dup at
      // 0 and 2; intervals [0,2] and [2,4] OVERLAP at position 2 ->
      // union covers 5 words, not 6: ppm = 1e6 exactly.
      (1L, "a b a b a"),
      // Two disjoint islands: "x y z"@0/@5 dup -> [0,2] + [5,7] =
      // 6 of 8 words covered; top 2-gram "x y" count 2, len 3,
      // chars 15 -> 400000.
      (2L, "x y z q w x y z"),
      // No repetition at all: top gram count 1, dup coverage 0.
      (3L, "p q r s"),
      // Degenerate repetition: "a a a a" -> top 2-gram "a a" count 3,
      // nominal chars 3*3=9 > total 7 -> capped at 1e6; 3-gram "a a a"
      // dup at 0,1 -> union [0,3] = full coverage.
      (4L, "a a a a"),
      (5L, "solo"), // 1 word: no grams anywhere
      (6L, "")      // empty: all zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("top_count"), r.getAs[Long]("top_char_ppm"),
        r.getAs[Long]("dup_words"), r.getAs[Long]("dup_word_ppm")))).toMap
    assert(out(1L) == ((5L, 2L, 2L * 3 * 1000000 / 9, 5L, 1000000L)))
    assert(out(2L) == ((8L, 2L, 400000L, 6L, 750000L)))
    assert(out(3L) == ((4L, 1L, 1L * 3 * 1000000 / 7, 0L, 0L)))
    assert(out(4L) == ((4L, 3L, 1000000L, 4L, 1000000L)))
    assert(out(5L) == ((1L, 0L, 0L, 0L, 0L)))
    assert(out(6L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(out.size == 6)
  }

  // -------------------------------------------------- dedupGrowth (q225)

  test("dedupGrowth: full level counts exact dupes; levels nest") {
    val docs = Seq((1L, "x x"), (2L, "x x"), (3L, "x  x"), (4L, "y"),
      (5L, "Y"), (6L, "z")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupGrowth(docs).collect()
      .map(r => r.getAs[Long]("level_pct") -> r).toMap
    // Normalization folds case/whitespace: fps = {x x}x3, {y}x2, {z}.
    val full = out(100L)
    assert(full.getAs[Long]("n_docs") == 6L)
    assert(full.getAs[Long]("n_distinct") == 3L)
    assert(full.getAs[Long]("dup_ppm") == 500000L)
    // Nesting: counts monotone in the level.
    assert(out(25L).getAs[Long]("n_docs") <= out(50L).getAs[Long]("n_docs"))
    assert(out(50L).getAs[Long]("n_docs") <= 6L)
  }

  test("dedupGrowth: per-level counts equal an independent filter+distinct") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.dedupGrowth(docs).collect()
      .map(r => r.getAs[Long]("level_pct") -> r).toMap
    val base = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      (conv(substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))
        .cast("binary")), 1, 8), 16, 10).cast("long") % 1000000L).as("u"))
    Seq(25L -> 250000L, 50L -> 500000L, 100L -> 1000000L).foreach {
      case (pct, t) =>
        val in = base.filter(col("u") < t)
        assert(out(pct).getAs[Long]("n_docs") == in.count())
        assert(out(pct).getAs[Long]("n_distinct") ==
          in.select("fp").distinct().count(),
          s"distinct mismatch at level $pct")
    }
  }

  test("richnessOf: fully-repeated corpus estimates no unseen types") {
    // No singletons -> chao1 = D, jack1 = D, coverage = 1.
    val docs = Seq(("s", "x x y y")).toDF("source", "text")
    val out = TextAnalysis.richnessOf(docs).collect().head
    assert(out.getAs[Long]("chao1_micro") == 2000000L)
    assert(out.getAs[Long]("jack1") == 2L)
    assert(out.getAs[Long]("coverage_ppm") == 1000000L)
  }

  // ------------------------------------------ gopherQualityRules (q241)
  test("gopher rules: a clean long document passes all seven") {
    // 52 words, mean length in [3,10], 'the'+'and' stopwords, all alpha.
    val body = ("the quick brown fox and " + ("sturdy lexical token " * 16)).trim
    val d = Seq((1L, body)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherQualityRules(d).collect().head
    assert(r.getAs[Long]("n_words") == 53L)
    assert(r.getAs[Long]("stopword_hits") == 2L)
    assert(r.getAs[Long]("alpha_ppm") == 1000000L)
    assert(r.getAs[Long]("rule_mask") == 127L)
    assert(r.getAs[Long]("pass") == 1L)
  }

  test("gopher rules: each failing signal clears exactly its mask bit") {
    val stops = "the and that have " // 4 stopwords, passes rule 7
    val short = Seq((1L, stops + "one two three")).toDF("doc_id", "text")
    val r1 = TextAnalysis.gopherQualityRules(short).collect().head
    assert((r1.getAs[Long]("rule_mask") & 1L) == 0L) // word count < 50
    assert((r1.getAs[Long]("rule_mask") & 64L) == 64L)
    // Symbol-heavy: each word paired with a '#' and an ellipsis.
    val symbols = Seq((2L, ("word# ... " * 30).trim)).toDF("doc_id", "text")
    val r2 = TextAnalysis.gopherQualityRules(symbols).collect().head
    assert(r2.getAs[Long]("symbol_ppm") > 100000L)
    assert((r2.getAs[Long]("rule_mask") & 4L) == 0L)
    // Bullet lines: 10 bullet lines of one line each.
    val bullets = Seq((3L, (1 to 10).map(i => s"- item $i").mkString("\n")))
      .toDF("doc_id", "text")
    val r3 = TextAnalysis.gopherQualityRules(bullets).collect().head
    assert(r3.getAs[Long]("bullet_ppm") == 1000000L)
    assert((r3.getAs[Long]("rule_mask") & 8L) == 0L)
    // Ellipsis-ended lines over the 30% cap.
    val ell = Seq((4L, "alpha beta...\ngamma delta…\nplain line"))
      .toDF("doc_id", "text")
    val r4 = TextAnalysis.gopherQualityRules(ell).collect().head
    assert(r4.getAs[Long]("ellipsis_ppm") == 666666L)
    assert((r4.getAs[Long]("rule_mask") & 16L) == 0L)
    // Numeric soup fails the 80%-alphabetic rule.
    val nums = Seq((5L, "123 456 789 012 345 abc")).toDF("doc_id", "text")
    val r5 = TextAnalysis.gopherQualityRules(nums).collect().head
    assert(r5.getAs[Long]("alpha_ppm") == 166666L)
    assert((r5.getAs[Long]("rule_mask") & 32L) == 0L)
  }

  test("gopher rules: empty and whitespace-only docs emit zero signals") {
    val d = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityRules(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getAs[Long]("n_words") == 0L)
      assert(out(id).getAs[Long]("pass") == 0L)
    }
  }

  // ------------------------------------------- fleschReadability (q245)
  test("flesch: hand-computed sentence/syllable counts and scores") {
    // "the cat sat. it ran away! done?" -> 3 sentences, 7 words.
    // Syllables (vowel-group runs): the=1 cat=1 sat=1 it=1 ran=1
    // away=2(a, ay) done=2(o, e) -> 9.
    val d = Seq((1L, "the cat sat. it ran away! done?")).toDF("doc_id", "text")
    val r = TextAnalysis.fleschReadability(d).collect().head
    assert(r.getAs[Long]("n_words") == 7L)
    assert(r.getAs[Long]("n_sentences") == 3L)
    assert(r.getAs[Long]("n_syllables") == 9L)
    // RE = 206.835 - 1.015*(7/3) - 84.6*(9/7) = 95.69333...
    val ease = 206.835 - 1.015 * 7.0 / 3.0 - 84.6 * 9.0 / 7.0
    assert(r.getAs[Long]("ease_micro") ==
      math.floor(ease * 1000000.0 + 0.5).toLong)
    val grade = 0.39 * 7.0 / 3.0 + 11.8 * 9.0 / 7.0 - 15.59
    assert(r.getAs[Long]("grade_micro") ==
      math.floor(grade * 1000000.0 + 0.5).toLong)
  }

  // ---------------------------------------------- rakeKeywords (q247)
  test("rake: hand-computed degree/frequency scores and phrase ranking") {
    val docs = Seq(
      (1L, "gradient descent of the gradient method"),
      (2L, "gradient descent in a noisy gradient descent loop"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeywords(docs).collect()
      .map(r => r.getAs[String]("phrase") -> r).toMap
    // gradient: freq 4, degree 2+2+2+4 = 10 -> 2500000;
    // descent: freq 3, degree 2+2+4 = 8 -> 2666666.
    assert(out("gradient descent").getAs[Long]("score_micro") == 5166666L)
    assert(out("gradient descent").getAs[Long]("n_occ") == 2L)
    assert(out("gradient method").getAs[Long]("score_micro") == 4500000L)
    assert(out("noisy gradient descent loop").getAs[Long]("score_micro")
      == 13166666L)
    assert(out("noisy gradient descent loop").getAs[Long]("n_words") == 4L)
  }

  test("rake: candidates over the phrase-length cap are discarded " +
    "entirely, including their word-stat contributions") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // 5-word run, over the cap
      (2L, "alpha beta of gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeywords(docs).collect()
      .map(r => r.getAs[String]("phrase") -> r).toMap
    assert(!out.contains("alpha beta gamma delta epsilon"))
    // Word stats must come from capped candidates only: alpha freq 1
    // (doc2), degree 2 -> 2000000; beta the same; gamma freq 1, deg 1.
    assert(out("alpha beta").getAs[Long]("score_micro") == 4000000L)
    assert(out("gamma").getAs[Long]("score_micro") == 1000000L)
  }

  test("flesch: punctuation-free text is one sentence; empty docs drop") {
    val d = Seq((1L, "plain words only here"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.fleschReadability(d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_sentences") == 1L)
    // Every word floors at >= 1 syllable even without vowels.
    val cons = Seq((3L, "zzz bcd fgh")).toDF("doc_id", "text")
    assert(TextAnalysis.fleschReadability(cons).collect()
      .head.getAs[Long]("n_syllables") == 3L)
  }
}
