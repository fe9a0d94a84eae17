package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Near-duplicate detection at corpus scale: MinHash + banded LSH and
  * 64-bit SimHash. Plan shape:
  *
  *   per-row native signature kernel (no shuffle — signatures are pure
  *   functions of one document, see [[graft.functions.SketchKernels]]) →
  *   band/bucket explode → self-join on (band, signature) finds
  *   candidates → exact verification only on candidates.
  *
  * The candidate join is the only O(pairs) step and it only sees colliding
  * buckets — the whole point of LSH: at 100 TB you never materialize the
  * n² pair space. The hash family is deterministic (seeded XXH64), so
  * signatures are stable across runs and cluster layouts.
  */
object Dedup {

  val NumHashes = 64
  val NumBands = 16 // 4 rows per band → LSH threshold ≈ (1/16)^(1/4) ≈ 0.5

  /** Word n-gram shingle size. 3-grams keep LSH buckets discriminative
    * even on low-vocabulary corpora (word *sets* would collide massively).
    */
  val ShingleN = 3

  /** Distinct 64-bit shingle hashes for a text column — one native
    * byte-scan per row ([[graft.functions.SketchKernels]]): no shingle
    * strings, no explode, no shuffle. Downstream Jaccard over hash sets
    * equals Jaccard over shingle sets modulo 64-bit collisions (~1e-11 at
    * this density).
    */
  def shingleHashSet(textCol: Column): Column =
    graft.functions.shingleHashes(textCol, ShingleN)

  /** MinHash signatures: one row per doc with a 64-lane `sig` array — a
    * pure per-row projection (signatures are functions of one document, so
    * the plan has no shuffle at any scale).
    */
  def minHashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    docs.select(col(idCol), graft.functions.minHashSignature(col(textCol), ShingleN).as("sig"))

  /** LSH candidate pairs: docs sharing at least one band signature.
    * Symmetric pairs deduped to a < b.
    *
    * `maxBucketSize` is the mega-bucket guard: a (band, sig) bucket of B
    * docs yields B² candidate pairs, so one degenerate bucket can dominate
    * the whole job. Buckets larger than the cap are dropped from candidate
    * generation (their members almost always still collide in another,
    * smaller band) — the standard bounded-LSH trade. Pass None for exact
    * banded behavior.
    */
  /** `(id, band, sig)` band signatures of a MinHash-signature frame —
    * THE band space every LSH consumer shares (the within-corpus
    * candidate join and the cross-side incremental join must band
    * identically or their recall arguments stop composing).
    */
  /** private[graft]: the incremental dedup index (warehouse.DedupIndex)
    * persists exactly these band rows. */
  private[graft] def bandSignatures(sigs: DataFrame, idCol: String): DataFrame = {
    val rowsPerBand = NumHashes / NumBands
    val bandStructs = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("sig"))
    }
    sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def lshCandidates(sigs: DataFrame, idCol: String = "doc_id",
                    maxBucketSize: Option[Int] = Some(500)): DataFrame = {
    val bands = bandSignatures(sigs, idCol)
    // Shared LSH candidate kernel (mega-bucket cap + pinned spread +
    // bucket self-join); dedupe across bands here because the Jaccard
    // verify is per-pair expensive (array intersect/union), unlike the
    // cosine path which defers dedup past its cheap fused verify.
    CandidateJoin.pairs(bands, idCol, Seq("band", "sig"), maxBucketSize).distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates verified with exact
    * shingle-set Jaccard (same shingle space as the signatures), keeping
    * pairs ≥ `threshold`.
    */
  def minHashNearDups(docs: DataFrame, threshold: Double, idCol: String = "doc_id",
                      textCol: String = "text",
                      maxBucketSize: Option[Int] = Some(500)): DataFrame = {
    val sets = docs.select(col(idCol), shingleHashSet(col(textCol)).as("ws"))
    val pairs = lshCandidates(minHashSignatures(docs, idCol, textCol), idCol, maxBucketSize)
    pairs
      .join(sets.select(col(idCol).as("a_id"), col("ws").as("a_ws")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("ws").as("b_ws")), "b_id")
      // Fused verify kernel: |∩| and |∪| in one sort-merge pass, no
      // intermediate intersect/union arrays (identical value to the
      // size(array_intersect)/size(array_union) form — both are exact
      // integer ratios — so downstream rounding is unchanged).
      .withColumn("jaccard", graft.functions.jaccardSets(col("a_ws"), col("b_ws")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Portable 60-bit SimHash signature — a pure per-row projection
    * (native single-pass md5-basis kernel; see
    * [[graft.functions.SketchKernels.simHash60Long]]).
    */
  def simHashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    docs.select(col(idCol), graft.functions.simHashSignature(col(textCol), ShingleN).as("simhash"))

  /** SimHash near-dup pairs within `maxHamming` (must be < 4): pigeonhole
    * on four 15-bit chunks of the 60-bit signature — a pair within
    * hamming 3 differs in at most 3 chunks, so it shares at least one,
    * and the join only touches chunk-colliding buckets.
    */
  def simHashNearDups(docs: DataFrame, maxHamming: Int = 3,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming < 4, "chunked index supports hamming < 4")
    val sigs = simHashSignatures(docs, idCol, textCol)
    val chunks = sigs.select(
      col(idCol), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 15).bitwiseAND(lit(0x7FFFL)).as("ck"))): _*)).as("cs"))
      .select(col(idCol), col("simhash"), col("cs.chunk"), col("cs.ck"))
    chunks.alias("x")
      .join(chunks
        .withColumnRenamed(idCol, "b_id")
        .withColumnRenamed("simhash", "b_simhash").alias("y"), Seq("chunk", "ck"))
      .filter(col(idCol) < col("b_id"))
      .select(col(idCol).as("a_id"), col("b_id"),
        bit_count(col("simhash").bitwiseXOR(col("b_simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over near-dup pairs via distributed label
    * propagation: every doc starts labeled with its own id; each round,
    * labels flow across edges (both directions) and each node keeps the
    * minimum seen. Converges in O(cluster diameter) rounds — near-dup
    * clusters are dense and shallow, so a handful of joins suffices; this
    * is the standard large-graph CC pattern without any graph library.
    * Returns (doc_id, cluster_id = min doc_id in the component).
    */
  def clusters(docIds: DataFrame, pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = docIds.sparkSession
    // |graph|-dispatched driver arm (the lutFrame/queryBroadcast pattern,
    // r18): a label-prop ROUND costs 2 shuffles + a checkpoint + a
    // convergence count regardless of data size, so on a bounded graph
    // the loop is pure orchestration — k rounds × fixed job overhead
    // (measured on q251: ~40 jobs/fold for a few-thousand-row contracted
    // graph). Under [[ccDriverMaxRows]] BOTH frames bounded-collect (size
    // -estimate fast path, never corpus-sized on a mis-estimate) and an
    // exact union-find labels each node with its component's min id —
    // the identical output by definition (DedupSpec pins arm equality).
    // Above the cap — the 100 TB corpus-dedup shape — nothing collects
    // and the distributed loop below is unchanged.
    val capped = for {
      nodeRows <- IvfIndex.boundedCollect(
        docIds.select(col("doc_id").cast("long")), ccDriverMaxRows)
      edgeRows <- IvfIndex.boundedCollect(
        pairs.select(col("a_id").cast("long"), col("b_id").cast("long")),
        ccDriverMaxRows)
    } yield unionFindLabels(spark, nodeRows.map(_.getLong(0)), edgeRows)
    capped.getOrElse(clustersLoop(docIds, pairs, maxIters))
  }

  /** [[clusters]] where the node set IS the edge endpoints (the
    * [[graft.warehouse.ComponentsState]] contraction shape — every node
    * touches an edge by construction): the driver arm collects the edge
    * frame ONCE and derives the endpoints locally, one bounded job where
    * the clusters() prologue paid two (and the endpoint union+distinct
    * shuffle recomputed the edge pipeline a second time). Output is
    * identical to `clusters(endpoints(pairs), pairs)` by definition —
    * union-find labels each endpoint with its component's min id.
    * Above the cap the distributed loop runs on the derived endpoint
    * frame, unchanged.
    */
  def clustersFromEdges(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    IvfIndex.boundedCollect(
      pairs.select(col("a_id").cast("long"), col("b_id").cast("long")),
      ccDriverMaxRows) match {
      case Some(edgeRows) =>
        val nodes = new java.util.LinkedHashSet[java.lang.Long]()
        edgeRows.foreach { e => nodes.add(e.getLong(0)); nodes.add(e.getLong(1)) }
        val ids = new Array[Long](nodes.size)
        val it = nodes.iterator()
        var i = 0
        while (it.hasNext) { ids(i) = it.next(); i += 1 }
        unionFindLabels(spark, ids, edgeRows)
      case None =>
        val touched = pairs.select(col("a_id").as("doc_id"))
          .unionByName(pairs.select(col("b_id").as("doc_id"))).distinct()
        clustersLoop(touched, pairs, maxIters)
    }
  }

  /** Driver-arm cap for [[clusters]]: both the node and the edge frame
    * must fit under it to take the union-find arm (2 longs/row — 16 MB
    * of driver heap at the default). Override via
    * `-Dgraft.cc.driverMaxRows`; specs force an arm thread-locally.
    */
  private[graft] def ccDriverMaxRows: Long =
    ccDriverMaxRowsOverride.value.getOrElse(
      sys.props.get("graft.cc.driverMaxRows").map(_.toLong).getOrElse(1L << 20))

  private[graft] val ccDriverMaxRowsOverride =
    new scala.util.DynamicVariable[Option[Long]](None)

  /** Exact connected components on collected rows: union-find with path
    * compression, then label = min doc id per component — definitionally
    * the label-prop fixed point. Edge endpoints outside the node set are
    * inert (they never relay a label), exactly as in the distributed
    * loop, where only labeled nodes propagate.
    */
  private def unionFindLabels(spark: SparkSession,
      ids: Array[Long],
      edgeRows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    val labels = unionFindMinLabels(ids,
      edgeRows.iterator.map(e => (e.getLong(0), e.getLong(1))))
    ids.toSeq.map(id => (id, labels.get(id).longValue())).toDF("doc_id", "cluster_id")
  }

  /** The union-find core on plain driver arrays: id → min id of its
    * component (edge endpoints outside `ids` are inert, as in the
    * distributed loop). Shared by the [[clusters]] driver arm and the
    * [[graft.warehouse.ComponentsState]] bounded fold.
    */
  private[graft] def unionFindMinLabels(ids: Array[Long],
      edges: Iterator[(Long, Long)]): java.util.HashMap[Long, java.lang.Long] = {
    val idx = new java.util.HashMap[Long, Int](ids.length * 2)
    var i = 0
    while (i < ids.length) { idx.putIfAbsent(ids(i), i); i += 1 }
    val parent = Array.tabulate(ids.length)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (ea, eb) =>
      val a = idx.getOrDefault(ea, -1)
      val b = idx.getOrDefault(eb, -1)
      if (a >= 0 && b >= 0) {
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(ra) = rb
      }
    }
    val minId = new java.util.HashMap[Int, Long](ids.length * 2)
    i = 0
    while (i < ids.length) {
      val r = find(i)
      val cur = minId.getOrDefault(r, Long.MaxValue)
      if (ids(i) < cur) minId.put(r, ids(i))
      i += 1
    }
    val out = new java.util.HashMap[Long, java.lang.Long](ids.length * 2)
    i = 0
    while (i < ids.length) {
      out.put(ids(i), java.lang.Long.valueOf(minId.get(find(i))))
      i += 1
    }
    out
  }

  /** The distributed label-propagation arm of [[clusters]] — the above-
    * cap (100 TB) path; semantics documented on [[clusters]].
    */
  private def clustersLoop(docIds: DataFrame, pairs: DataFrame,
                           maxIters: Int): DataFrame = {
    val spark = docIds.sparkSession
    // Per-round checkpoint flavor. localCheckpoint blocks are executor-
    // resident and unreplicated: with lineage truncated, one executor
    // loss mid-iteration makes every later round unrecoverable — fine on
    // local[n] (one JVM), a reliability scale-killer for a multi-hour
    // cluster dedup. When the caller configured a reliable checkpoint dir
    // (sc.setCheckpointDir — HDFS/S3-backed, replayable after executor
    // loss), use real checkpoints; localCheckpoint stays the local-mode
    // fast path. Both modes are eager and produce identical labels
    // (DedupSpec asserts it).
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val edges = pairs.select(col("a_id"), col("b_id"))
      .unionByName(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .cache()
    var labels = docIds.select(col("doc_id"), col("doc_id").as("cluster_id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaNeighbors = edges
        .join(labels, col("b_id") === col("doc_id"))
        .groupBy(col("a_id").as("doc_id"))
        .agg(min("cluster_id").as("n_min"))
      // Eager checkpoint — not cache() — each round: cache keeps the
      // FULL plan lineage, so round k's plan contains every prior round
      // and the final plan re-derives the whole history (measured as a
      // 472-scan physical plan before the fix). Checkpointing truncates
      // the lineage to the materialized rows, keeping every round's plan
      // O(1): one edge join against last round's checkpoint.
      val next = truncate(labels
        .join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("__old"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id"))).as("cluster_id")))
      // The checkpoint already materialized the round; the convergence
      // check is a cheap scan of the in-memory rows.
      converged = next.filter(col("cluster_id") =!= col("__old")).count() == 0
      labels = next.drop("__old")
      i += 1
    }
    // Non-convergence must be LOUD, not a warning: q30's labels are
    // oracle-gated against a full transitive closure, so a component
    // wider than the round cap would silently hash-mismatch. 50 rounds
    // covers component diameters no near-dup corpus reaches (clusters
    // are dense and shallow); hitting the cap means something is wrong
    // with the data or the loop — fail the job, don't mislabel.
    if (!converged) {
      edges.unpersist()
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIters rounds — " +
          "component diameter exceeds the cap; raise maxIters")
    }
    edges.unpersist()
    // Checkpointed: lineage-free, and the per-round storage is released
    // once each superseded round's RDD is unreferenced — local blocks by
    // the ContextCleaner via GC; reliable checkpoint files additionally
    // need spark.cleaner.referenceTracking.cleanCheckpoints=true (else
    // they persist until the checkpoint dir is cleaned — the durable-by-
    // default trade). Labels are 2 longs per doc, orders of magnitude
    // under the corpus they describe.
    labels
  }

  /** End-to-end corpus deduplication: MinHash-LSH pairs → clusters → keep
    * the minimum-id doc per cluster. The deliverable of a training-data
    * dedup pass.
    */
  def dedupedCorpus(docs: DataFrame, threshold: Double, idCol: String = "doc_id",
                    textCol: String = "text",
                    maxBucketSize: Option[Int] = Some(500)): DataFrame = {
    val pairs = minHashNearDups(docs, threshold, idCol, textCol, maxBucketSize)
    val labels = clusters(docs.select(col(idCol).as("doc_id")), pairs)
      .select(col("doc_id").as("__did"), col("cluster_id").as("__cid"))
    docs.join(labels, docs(idCol) === col("__did"))
      .filter(col(idCol) === col("__cid"))
      .drop("__did", "__cid")
  }

  /** Canonical-document selection: rank each near-dup cluster's members
    * by a caller-supplied quality expression (best first, id-tiebroken)
    * and flag the winner — the "keep the best copy, not the first copy"
    * refinement of [[dedupedCorpus]] that real curation passes want: when
    * a page is crawled five times, keep the longest/cleanest capture, not
    * the one with the smallest id. Returns every doc with its cluster and
    * an `is_canonical` 0/1 flag, so callers can either filter to
    * canonicals or audit what a dedup pass would drop.
    *
    * Scale shape: `labels` comes from [[clusters]] (already materialized,
    * 2 longs per doc); the rank is one window over `cluster_id` — a
    * single hash exchange, no self-joins, and almost every partition is a
    * singleton cluster.
    */
  def canonicalSelection(docs: DataFrame, labels: DataFrame, quality: Column,
                         idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(quality.desc, col(idCol).asc)
    docs.join(labels.select(col("doc_id").as(idCol), col("cluster_id")), idCol)
      .withColumn("is_canonical", (row_number().over(w) === 1).cast("int"))
  }

  // ------------------------------------------------------- oracle SQL
  /** DuckDB CTE chain computing exact word-n-gram-Jaccard pairs ≥
    * `threshold` over a `corpus(doc_id, text, …)` CTE the caller supplies:
    * shingles are exploded and equi-joined so only pairs sharing a shingle
    * are ever scored (|∩| from the group count, |∪| = |a|+|b|−|∩|) — the
    * oracle stays near-linear instead of 3-gram-intersecting all n²/2
    * pairs. This is the SAME quantity the LSH pipeline verifies per
    * candidate (Jaccard over hashed shingles == Jaccard over shingle
    * strings modulo 64-bit collisions), so the LSH queries are
    * hash-checkable: recall 1.0 on the harness corpora is established by
    * DedupSpec's brute-force comparison, and this SQL recomputes the exact
    * answer independently.
    */
  private[graft] def exactPairCtes(threshold: Double): String = {
    val gram = (0 until ShingleN).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
    s"""toks AS (
       |  SELECT doc_id, list_filter(str_split(text, ' '), t -> len(t) > 0) AS toks FROM corpus
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(toks) >= $ShingleN THEN
       |    list_distinct(list_transform(generate_series(1, len(toks)-${ShingleN - 1}),
       |      i -> $gram))
       |    ELSE []::VARCHAR[] END AS ws
       |  FROM toks
       |), sizes AS (
       |  SELECT doc_id, len(ws) AS sz FROM sh
       |), sh_ex AS (
       |  SELECT doc_id, unnest(ws) AS s FROM sh
       |), inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
       |  FROM sh_ex a JOIN sh_ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT a_id, b_id
       |  FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
       |  WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= $threshold
       |)""".stripMargin
  }

  // ---------------------------------------------------------------- q17
  /** Per-doc near-dup summary via MinHash LSH (threshold 0.7). Per-doc so
    * the output is non-empty and stable regardless of how many pairs
    * exist. Oracle-checked: the output is the count of exact-Jaccard
    * partners ≥ 0.7 (LSH candidates are verified with exact Jaccard, and
    * candidate recall is 1.0 on the harness corpora — DedupSpec asserts
    * pair-set equality with the brute-force baseline), so DuckDB's exact
    * shingle-Jaccard pair count is the same number.
    */
  /** Pairs → per-doc partner counts (symmetric). */
  private def pairCountsPerDoc(pairs: DataFrame, as: String): DataFrame =
    pairs.select(col("a_id").as("doc_id"))
      .unionByName(pairs.select(col("b_id").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as(as))

  def minHashSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // Oracle-gated ⇒ uncapped candidates: the mega-bucket drop is a
    // recall/scale trade the operator API keeps, but the gated query must
    // count EVERY exact pair the DuckDB oracle counts, on any corpus —
    // the harness corpora have no degenerate buckets, so this costs
    // nothing here and removes the one data-dependent divergence.
    val perDoc = pairCountsPerDoc(
      minHashNearDups(docs, threshold = 0.7, maxBucketSize = None), "n_neardups")
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_neardups"), lit(0L)).as("n_neardups"))
  }

  private val minHashSummarySql =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |), ${exactPairCtes(0.7)},
       |per AS (
       |  SELECT doc_id, count(*) AS n FROM (
       |    SELECT a_id AS doc_id FROM pairs UNION ALL SELECT b_id AS doc_id FROM pairs)
       |  GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(coalesce(per.n, 0) AS BIGINT) AS n_neardups
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Per-doc SimHash signature + near-dup count at hamming ≤ 3 — fully
    * oracle-gated: the 60-bit md5-basis signature is recomputed
    * bit-identically by DuckDB (distinct word-3-gram shingles →
    * `('0x'||substr(md5(s),1,15))::BIGINT` → per-bit ±1 votes), and the
    * pigeonhole chunk join is complete for hamming ≤ 3, so its pair set
    * equals the oracle's all-pairs `bit_count(xor(...)) <= 3` exactly.
    */
  def simHashSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perDoc = pairCountsPerDoc(simHashNearDups(docs, maxHamming = 3), "n_candidates")
    simHashSignatures(docs)
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
  }

  // ---------------------------------------------------------------- q30
  /** Deduplicated-corpus summary: per source, docs before and after the
    * full LSH → cluster → keep-canonical pass over a corpus with planted
    * twins (each doc unioned with a re-keyed near-copy). Oracle-checked
    * end to end: DuckDB recomputes the exact Jaccard pair set
    * ([[exactPairCtes]]) and the connected components via a recursive-CTE
    * transitive closure (min reachable id == the label-propagation
    * fixpoint), then the same keep-min-id-per-cluster counts — so the
    * whole dedup pipeline (LSH candidates → exact verify → clustering →
    * canonical winners) is hash-gated against an independent engine.
    */
  def dedupCorpusSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // Cached for the EAGER phase below: the clustering loop's jobs hit
    // `planted` repeatedly (signature scan, shingle-set scan, per-round
    // edge joins). The lazy summary returned to the caller re-derives the
    // union from the source scan (2 scans per use — cheap and bounded);
    // the cache is released before return so long-lived drivers don't
    // accumulate storage per query run.
    val planted = docs.select(col("doc_id"), col("text"), col("source")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"), col("source")))
      .cache()
    try {
      // All the heavy, iterative work (LSH pairs + label propagation) runs
      // eagerly inside this call against the cached `planted`; the labels
      // it produces are locally checkpointed, so the plan returned below
      // is just planted ⋈ labels + two tiny aggregates — auditable, with
      // single-digit scans instead of the per-round lineage pile-up.
      // Uncapped for the same reason as q17: oracle-gated output must not
      // depend on the bounded-LSH bucket drop.
      val kept = dedupedCorpus(planted, threshold = 0.7, maxBucketSize = None)
      planted.groupBy("source").agg(count(lit(1)).as("n_before"))
        .join(kept.groupBy(col("source").as("s2")).agg(count(lit(1)).as("n_after")),
          col("source") === col("s2"), "left")
        .select(col("source"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
    } finally planted.unpersist(blocking = false)
  }

  private val dedupCorpusSummarySql =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text || ' zz' AS text, source FROM documents
       |), ${exactPairCtes(0.7)},
       |edges AS (
       |  SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs
       |),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM corpus
       |  UNION
       |  SELECT r.src, e.b_id FROM reach r JOIN edges e ON r.dst = e.a_id
       |),
       |labels AS (
       |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY 1
       |),
       |kept AS (
       |  SELECT c.source FROM corpus c
       |  JOIN labels l ON c.doc_id = l.doc_id AND c.doc_id = l.cluster_id
       |),
       |bef AS (SELECT source, count(*) AS n_before FROM corpus GROUP BY 1),
       |aft AS (SELECT source, count(*) AS n_after FROM kept GROUP BY 1)
       |SELECT b.source, CAST(b.n_before AS BIGINT) AS n_before,
       |  CAST(coalesce(a.n_after, 0) AS BIGINT) AS n_after
       |FROM bef b LEFT JOIN aft a ON b.source = a.source""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Canonical-doc selection over the q30 planted-twin corpus: cluster by
    * near-dup pairs (threshold 0.7, uncapped — oracle-gated), then flag
    * the best-quality member per cluster with quality = text length
    * (id-tiebroken). The planted twin is 3 chars longer than its source,
    * so canonical selection provably differs from q30's keep-min-id rule
    * — the query exercises the quality rank, not just the clustering.
    * Hash-gated end to end: DuckDB recomputes pairs + transitive closure
    * + the same `row_number` rank.
    */
  def canonicalDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // Same cached-eager/lazy-return shape as q30: clustering runs its
    // rounds against the cached union; the returned plan re-derives it.
    val planted = docs.select(col("doc_id"), col("text"), col("source")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"), col("source")))
      .cache()
    try {
      val pairs = minHashNearDups(planted, threshold = 0.7, maxBucketSize = None)
      val labels = clusters(planted.select(col("doc_id")), pairs)
      canonicalSelection(planted, labels, length(col("text")))
        .select(col("doc_id"), col("cluster_id"), col("is_canonical"))
    } finally planted.unpersist(blocking = false)
  }

  private val canonicalDocsSql =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text || ' zz' AS text, source FROM documents
       |), ${exactPairCtes(0.7)},
       |edges AS (
       |  SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs
       |),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM corpus
       |  UNION
       |  SELECT r.src, e.b_id FROM reach r JOIN edges e ON r.dst = e.a_id
       |),
       |labels AS (
       |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY 1
       |),
       |ranked AS (
       |  SELECT c.doc_id, l.cluster_id,
       |    row_number() OVER (PARTITION BY l.cluster_id
       |                       ORDER BY length(c.text) DESC, c.doc_id) AS rn
       |  FROM corpus c JOIN labels l USING (doc_id)
       |)
       |SELECT doc_id, cluster_id, CAST(rn = 1 AS INT) AS is_canonical
       |FROM ranked""".stripMargin

  // The q18 oracle rebuilds the portable signature from scratch in DuckDB:
  // same tokenization (`\s+` on lowercased text), same DISTINCT word-3-gram
  // shingles, same top-60-md5-bits hash, same ±1 bit votes — then counts
  // hamming≤3 neighbors by brute force (the chunked join is provably
  // complete at hamming < 4, so the sets coincide on every corpus).
  private val simHashSummarySql =
    s"""WITH ws AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM ws
       |),
       |hx AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
       |bits AS (
       |  SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hx, (SELECT unnest(range(60)) AS b)
       |  GROUP BY 1, 2
       |),
       |sig AS (
       |  SELECT w.doc_id, CAST(coalesce(s.sig, 0) AS BIGINT) AS simhash
       |  FROM ws w LEFT JOIN (
       |    SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS sig
       |    FROM bits GROUP BY 1) s ON w.doc_id = s.doc_id
       |),
       |prs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |),
       |cnt AS (
       |  SELECT doc_id, count(*) AS n FROM (
       |    SELECT a_id AS doc_id FROM prs UNION ALL SELECT b_id AS doc_id FROM prs)
       |  GROUP BY 1
       |)
       |SELECT s.doc_id, s.simhash, CAST(coalesce(c.n, 0) AS BIGINT) AS n_candidates
       |FROM sig s LEFT JOIN cnt c ON s.doc_id = c.doc_id""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Cross-document duplicated token windows — exact substring-level
    * dedup at fixed window granularity (the "dedup the training set at
    * the 50-token level" discipline, here w tokens): a window duplicated
    * across documents marks boilerplate / verbatim reuse even when the
    * documents as wholes are distinct. Per doc: distinct windows, windows
    * shared with ≥1 other doc, and the duplicated fraction.
    *
    * Plan: one scan → per-row window arrays (native shingle kernel) →
    * explode → two hash aggregates + one equi-join on the window string.
    * At 100 TB the join key should be [[shingleHashSet]]'s 64-bit hashes
    * instead of strings (same plan, 8-byte keys); the gated query keeps
    * strings so the oracle reproduces them engine-identically.
    */
  def windowDupes(docs: DataFrame, w: Int = 8, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val wins = docs.select(col(idCol),
      explode(array_distinct(graft.functions.shingleStrings(col(textCol), w))).as("win"))
    val counts = wins.groupBy("win").agg(countDistinct(col(idCol)).as("nd"))
    val per = wins.join(counts, "win")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"),
        count(when(col("nd") >= 2, 1)).as("n_dup_windows"))
    docs.select(idCol)
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        round(coalesce(col("n_dup_windows").cast("double") / col("n_windows"), lit(0.0)), 6)
          .as("dup_ratio"))
  }

  def windowDupesSummary(spark: SparkSession, dir: String): DataFrame =
    windowDupes(Tables.documents(spark, dir))

  private val windowDupesSql = {
    val w = 8
    val gram = (0 until w).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(toks) >= $w THEN
       |    list_distinct(list_transform(generate_series(1, len(toks)-${w - 1}), i -> $gram))
       |    ELSE []::VARCHAR[] END AS ws
       |  FROM toks
       |), ex AS (
       |  SELECT doc_id, unnest(ws) AS win FROM sh
       |), cnt AS (
       |  SELECT win, count(DISTINCT doc_id) AS nd FROM ex GROUP BY 1
       |), per AS (
       |  SELECT e.doc_id, count(*) AS n_windows,
       |    count(CASE WHEN c.nd >= 2 THEN 1 END) AS n_dup
       |  FROM ex e JOIN cnt c ON e.win = c.win GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(coalesce(p.n_windows, 0) AS BIGINT) AS n_windows,
       |  CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_windows,
       |  round(coalesce(p.n_dup::DOUBLE / p.n_windows, 0), 6) AS dup_ratio
       |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q56
  /** Incremental near-dup check of an incoming batch against an existing
    * corpus — the daily-ingestion shape: signatures for the (small) batch
    * and the (huge) base are banded identically, candidates come from the
    * cross-side band equi-join, and only candidates pay the exact-Jaccard
    * verify. The base side's signatures are a pure projection that an
    * ingestion pipeline persists once and reuses every batch; nothing
    * here ever compares batch docs to each other or base docs to each
    * other, so the work is |batch|·(collision rate), not |corpus|².
    */
  def incrementalNearDups(batch: DataFrame, base: DataFrame, threshold: Double,
                          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def bands(df: DataFrame, as: String) =
      bandSignatures(minHashSignatures(df, idCol, textCol), idCol)
        .withColumnRenamed(idCol, as)
    val candidates = bands(batch, "batch_id")
      .join(bands(base, "base_id"), Seq("band", "sig"))
      .select("batch_id", "base_id").distinct()
    val batchSets = batch.select(col(idCol).as("batch_id"),
      shingleHashSet(col(textCol)).as("batch_ws"))
    val baseSets = base.select(col(idCol).as("base_id"),
      shingleHashSet(col(textCol)).as("base_ws"))
    candidates
      .join(batchSets, "batch_id")
      .join(baseSets, "base_id")
      .withColumn("jaccard", graft.functions.jaccardSets(col("batch_ws"), col("base_ws")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("base_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Gated q56: every 5th doc plays the incoming batch, the rest the
    * existing corpus; per batch doc, the number of base near-dups at
    * threshold 0.7. Cross-pair recall equals q17's within-corpus recall
    * (same signatures, same bands, candidate pairs are a restriction of
    * q17's pair space), which DedupSpec pins to 1.0 against brute force —
    * so DuckDB's exact cross-side Jaccard count is the same number.
    */
  def incrementalSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val matches = incrementalNearDups(batch, base, threshold = 0.7)
      .groupBy("batch_id").agg(count(lit(1)).as("n_matches"))
    batch.select(col("doc_id"))
      .join(matches, col("doc_id") === col("batch_id"), "left")
      .select(col("doc_id"), coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }

  private val incrementalSummarySql =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |), ${exactPairCtes(0.7)},
       |cross_pairs AS (
       |  SELECT CASE WHEN a_id % 5 = 0 THEN a_id ELSE b_id END AS doc_id
       |  FROM pairs WHERE (a_id % 5 = 0) <> (b_id % 5 = 0)
       |), per AS (
       |  SELECT doc_id, count(*) AS n FROM cross_pairs GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(coalesce(per.n, 0) AS BIGINT) AS n_matches
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
       |WHERE d.doc_id % 5 = 0""".stripMargin

  // --------------------------------------------------------------- q102
  /** Sorted-neighborhood dedup blocking (Hernández & Stolfo 1995) — the
    * third candidate-generation strategy next to LSH banding (q17) and
    * pigeonhole chunking (q18): sort by a cheap blocking key, compare
    * each record only to its `window` successors in sort order, verify
    * candidates exactly. Work is O(n·window), and near-identical records
    * (which share key prefixes) land adjacent.
    *
    * Distributed shape: the sort is PARTITIONED by the key's first
    * character, so each partition sorts and slides independently — the
    * multi-pass-SN trade (pairs straddling a partition boundary are a
    * second pass's job) made explicit rather than hidden in a global
    * row_number. Within a partition the W successors ride `lead()`
    * structs off ONE window sort — no self-join on rank arithmetic.
    *
    * Exactness: verification is integer-micro word-set Jaccard, and the
    * (partition, rank) space is engine-deterministic (ties broken by
    * doc_id), so the oracle reproduces the exact candidate set.
    */
  def sortedNeighborhoodPairs(docs: DataFrame, window: Int,
                              minJaccardMicro: Long): DataFrame = {
    val s = docs.select(col("doc_id"),
      substring(col("text"), 1, 40).as("bkey"),
      TextAnalysis.tokenSet(col("text")).as("ws"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(substring(col("bkey"), 1, 1))
      .orderBy(col("bkey"), col("doc_id"))
    val leads = (1 to window).map(d =>
      lead(struct(col("doc_id").as("b_id"), col("ws").as("b_ws")), d).over(w))
    s.withColumn("nbrs", array(leads: _*))
      .select(col("doc_id").as("a_id"), col("ws"),
        posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .filter(col("nbr").isNotNull)
      .select(col("a_id"), col("nbr.b_id").as("b_id"),
        (col("pos") + 1).cast("long").as("dist"),
        expr("(1000000 * size(array_intersect(ws, nbr.b_ws)))" +
          " div size(array_union(ws, nbr.b_ws))").as("jaccard_micro"))
      .filter(col("jaccard_micro") >= minJaccardMicro)
  }

  /** Gated q102: SN blocking over the q30-style planted-twin corpus
    * (each doc unioned with a re-keyed copy suffixed " zz" — twins share
    * the 40-char block key, so the window provably has work to find),
    * window 5, verify at Jaccard ≥ 0.5.
    */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
    sortedNeighborhoodPairs(planted, window = 5, minJaccardMicro = 500000L)
  }

  private val sortedNeighborhoodSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' zz' FROM documents
      |),
      |s AS (
      |  SELECT doc_id, substr(text, 1, 40) AS bkey,
      |    list_distinct(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS ws
      |  FROM corpus
      |),
      |r AS (
      |  SELECT doc_id, bkey, ws, substr(bkey, 1, 1) AS p,
      |    row_number() OVER (PARTITION BY substr(bkey, 1, 1)
      |                       ORDER BY bkey, doc_id) AS rn
      |  FROM s
      |),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(b.rn - a.rn AS BIGINT) AS dist, a.ws AS aws, b.ws AS bws
      |  FROM r a JOIN r b
      |    ON a.p = b.p AND b.rn > a.rn AND b.rn <= a.rn + 5
      |)
      |SELECT a_id, b_id, dist,
      |  (1000000 * len(list_intersect(aws, bws)))
      |    // len(list_distinct(list_concat(aws, bws))) AS jaccard_micro
      |FROM pairs
      |WHERE (1000000 * len(list_intersect(aws, bws)))
      |    // len(list_distinct(list_concat(aws, bws))) >= 500000""".stripMargin

  // --------------------------------------------------------------- q104
  /** Prefix-filtering set-similarity self-join (the PPJoin candidate
    * principle, Chaudhuri et al. 2006 / Xiao et al. 2008) — the fourth
    * candidate-generation strategy next to LSH banding (q17), pigeonhole
    * chunking (q18), and sorted neighborhoods (q102), and the only one of
    * the four that is EXACT: if Jaccard(x, y) ≥ t then the two records'
    * prefixes provably share a token, so verified output = the complete
    * set of qualifying pairs (no LSH recall loss, no SN boundary loss).
    *
    * Mechanics: order every record's token set by a GLOBAL rarest-first
    * total order (document frequency asc, token asc — deterministic, so
    * the oracle rebuilds the same order), keep only the first
    * |x| − ⌈t·|x|⌉ + 1 tokens as the prefix, and generate candidates by
    * equi-joining prefixes on their tokens. Rare tokens lead, so prefix
    * buckets stay small — the frequency ordering IS the skew defense.
    * Guarantee: J ≥ t ⇒ |x∩y| ≥ ⌈t·|x|⌉, and x's non-prefix suffix has
    * only ⌈t·|x|⌉ − 1 slots, so some shared token sits in both prefixes.
    *
    * Distributed shape: two hash aggregations (token df, per-doc ordered
    * list), a prefix explode, the [[CandidateJoin]] bucket self-join, and
    * an exact integer-micro Jaccard verify on candidates only — never the
    * n² pair space, and at 100 TB the df dictionary join is a plain
    * shuffle equi-join (no driver-side vocabulary).
    */
  def prefixFilterPairs(docs: DataFrame, minJaccardMicro: Long): DataFrame = {
    // Verify via the fused sorted-merge |∩| kernel + a size pre-filter,
    // the q115 discipline: Jaccard ≥ t bounds the size ratio
    // (t·|a| ≤ |b| ≤ |a|/t), and |∩| over sorted 64-bit token hashes
    // equals the string-set intersection modulo collisions.
    val s = docs.select(col("doc_id"), TextAnalysis.tokenSet(col("text")).as("ws"),
      sort_array(graft.functions.shingleHashes(col("text"), 1)).as("hs"))
    val tok = s.select(col("doc_id"), explode(col("ws")).as("token"))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
    // Rarest-first per-doc order; struct sort ≡ ORDER BY (df, token).
    val ordered = tok.join(dfreq, "token")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("ord"))
    // t = minJaccardMicro/1e6; prefix len = n − ⌈t·n⌉ + 1 in pure integer
    // arithmetic (⌈t·n⌉ = (micro·n + 999999) div 1e6) — no float ever.
    // Each prefix token carries its 1-indexed POSITION in the rarest-first
    // order plus the set size, feeding the PPJoin candidate-time filters.
    val prefix = ordered.select(col("doc_id"), size(col("ord")).cast("long").as("sz"),
      posexplode(expr(s"transform(slice(ord, 1, size(ord) - (($minJaccardMicro" +
        s" * size(ord) + 999999) div 1000000) + 1), x -> x.token)")))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("token"))
    // Exact geometric LENGTH BANDS (r9 verdict item 5): with L_0 = 1 and
    // L_{k+1} = ⌊L_k/t⌋ + 1, any qualifying pair's sizes (t·max ≤ min)
    // land in the same or ADJACENT bands: min in band k means
    // max ≤ min/t < L_{k+2}. Banding the join key therefore drops every
    // cross-band pairing from the pair ENUMERATION itself — measured
    // ~70% of the raw same-token pair space on the gated corpus at
    // t = 0.9 — instead of enumerating then filtering. Roles are ordered
    // by SIZE (ties by id): the smaller side probes {band, band+1},
    // covering both signs of the ±1 band gap with one 2× explode of the
    // (tiny) prefix-token stream. Thresholds are INTEGER-exact — a float
    // log band could split a boundary-ratio pair two bands apart and
    // silently lose completeness — and cap at 512 bands (any realistic
    // size at any t; sizes past the cap clamp into the last band, which
    // only forgoes pruning, never pairs).
    val thresholds = {
      val b = Seq.newBuilder[Long]
      var l = 1L
      var k = 0
      while (l <= 2_000_000_000_000L && k < 512) {
        b += l; l = l * 1000000L / minJaccardMicro + 1; k += 1
      }
      b.result()
    }
    val bandOf = size(filter(typedLit(thresholds), x => x <= col("sz")))
    // INLINE verify (r10): the sorted hash set rides the prefix rows
    // (2-3 per doc) into the candidate join, so the Jaccard check runs
    // inside the join stage on surviving candidates — the classic PPJoin
    // shape. This deletes the two corpus-sized verify joins AND moves
    // the pair `distinct` AFTER the ≥ t filter, where it carries only
    // qualifying pairs (re-verifying the rare multi-token duplicate is
    // one merge pass; shuffling every near-miss candidate was the 100×
    // bottleneck: two extra corpus shuffles + a candidate-space
    // exchange).
    // Pinned-partition spread BEFORE the two column-rename sides so both
    // join inputs read the same exchange subtree (ReuseExchange: the
    // tokenize→df→sort pipeline runs once, not twice).
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    val spread = prefix.join(s.select(col("doc_id"), col("hs")), "doc_id")
      .withColumn("band", bandOf)
      .repartition(nPart, col("token"))
    val small = spread.select(col("doc_id").as("a_id"), col("sz").as("a_size"),
      col("p").as("a_p"), col("hs").as("a_hs"), col("token"),
      explode(array(col("band"), col("band") + 1)).as("jband"))
    val large = spread.select(col("doc_id").as("b_id"), col("sz").as("b_size"),
      col("p").as("b_p"), col("hs").as("b_hs"), col("token"),
      col("band").as("jband"))
    // PPJoin (Xiao et al. 2008) candidate-time pruning, both in exact
    // integer arithmetic and both BEFORE the pair `distinct` (the largest
    // shuffle of the query):
    //  - length filter: |a∩b| ≤ min ∧ |a∪b| ≥ max ⇒ J ≥ t needs t·max ≤ min
    //    (a is the smaller side by role order, so min = a_size);
    //  - positional filter: common tokens sorting before the matched one
    //    number ≤ min(pa−1, pb−1); the rest ≤ 1 + min(|a|−pa, |b|−pb), so
    //    overlap ≤ that sum, which must reach the equivalent-overlap
    //    threshold ⌈t·(|a|+|b|)/(1+t)⌉ (J ≥ t ⇔ |∩| ≥ t/(1+t)·(|a|+|b|)).
    val ovDenom = 1000000L + minJaccardMicro
    val cand = small.join(large, Seq("token", "jband"))
      // size-then-id role order: exactly one ordered row per unordered
      // pair, however many band keys matched.
      .filter(col("a_size") < col("b_size") ||
        (col("a_size") === col("b_size") && col("a_id") < col("b_id")))
      .filter(col("b_size") * minJaccardMicro <= col("a_size") * 1000000L)
      .filter(least(col("a_p"), col("b_p")) +
        least(col("a_size") - col("a_p"), col("b_size") - col("b_p"))
        >= expr(s"($minJaccardMicro * (a_size + b_size) + $ovDenom - 1)" +
          s" div $ovDenom"))
      // Inline exact verify on the filter survivors: one fused
      // sorted-merge |∩| pass per candidate, inside the join's codegen
      // stage. Output ids normalize back to a_id < b_id (the oracle's
      // pair order); Jaccard and the union size are symmetric, so only
      // the id columns swap. The distinct now dedupes QUALIFYING pairs
      // only (a pair re-found via a second shared prefix token).
      .withColumn("inter",
        graft.functions.setOverlapSorted(col("a_hs"), col("b_hs")).cast("long"))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        expr("(1000000 * inter) div (a_size + b_size - inter)").as("jaccard_micro"))
      .filter(col("jaccard_micro") >= minJaccardMicro)
      .distinct()
    cand
  }

  /** Gated q104: exact prefix-filter join over the raw documents corpus
    * at Jaccard ≥ 0.9 (the corpus is templated — median 25 distinct
    * tokens — so lower thresholds qualify a large fraction of the n²
    * pair space; 0.9 is the near-dup regime the operator exists for, and
    * it keeps prefixes at ~2-3 tokens). The hash gate proves the
    * complete qualifying pair set against DuckDB's rebuild of the
    * identical prefix scheme.
    */
  def prefixFilterJoin(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    prefixFilterPairs(docs.select(col("doc_id"), col("text")),
      minJaccardMicro = 900000L)
  }

  private val prefixFilterSql =
    """WITH s AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS ws
      |  FROM documents
      |),
      |tok AS (SELECT doc_id, unnest(ws) AS token FROM s),
      |dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY 1),
      |ord AS (
      |  SELECT t.doc_id, t.token,
      |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.token) AS rn,
      |    count(*) OVER (PARTITION BY t.doc_id) AS sz
      |  FROM tok t JOIN dfreq d USING (token)
      |),
      |pref AS (
      |  SELECT doc_id, token FROM ord
      |  WHERE rn <= sz - ((900000 * sz + 999999) // 1000000) + 1
      |),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM pref a JOIN pref b ON a.token = b.token AND a.doc_id < b.doc_id
      |)
      |SELECT c.a_id, c.b_id,
      |  (1000000 * len(list_intersect(sa.ws, sb.ws)))
      |    // len(list_distinct(list_concat(sa.ws, sb.ws))) AS jaccard_micro
      |FROM cand c
      |JOIN s sa ON c.a_id = sa.doc_id
      |JOIN s sb ON c.b_id = sb.doc_id
      |WHERE (1000000 * len(list_intersect(sa.ws, sb.ws)))
      |    // len(list_distinct(list_concat(sa.ws, sb.ws))) >= 900000""".stripMargin

  // --------------------------------------------------------------- q115
  /** Asymmetric containment self-join — "is document a (mostly) inside
    * document b?": C(a→b) = |a∩b| / |a| over token sets. Jaccard (q16/
    * q17/q104) is symmetric and misses exactly the duplication mode that
    * plagues scraped training corpora: a short document quoted whole
    * inside a much longer one has J ≈ |a|/|b| → 0 but C(a→b) = 1. The
    * directional measure is the standard fix (Broder's containment, the
    * same quantity DataComp/RefinedWeb-style pipelines gate quote
    * inclusion on).
    *
    * Candidate generation is EXACT, not probabilistic — the containment
    * form of the prefix-filter principle (q104): C(a→b) ≥ t ⇒
    * |a∩b| ≥ ⌈t·|a|⌉, and a's rarest-first prefix of
    * |a| − ⌈t·|a|⌉ + 1 tokens cannot ALL miss b (the remaining slots are
    * too few), so probing b's full inverted index with just a's prefix
    * provably finds every qualifying ordered pair. One direction only:
    * (a→b) and (b→a) are different facts and both rows can legitimately
    * appear.
    *
    * Distributed shape: token-df hash agg → rarest-first per-doc sort →
    * prefix explode (2-3 tokens/doc at t=0.9) joined against the full
    * posting lists — work ∝ Σ_prefix-token df, which the rarest-first
    * order keeps near the minimum possible for an exact join (a Zipf
    * vocabulary puts prefix tokens in the short postings). The n² pair
    * space is never materialized; the exact verify runs on candidates
    * only.
    */
  def containmentPairs(docs: DataFrame, minContainMicro: Long): DataFrame = {
    // Token sets twice: string sets define sizes/semantics (the oracle's
    // list_intersect face); sorted 64-bit hash sets feed the fused
    // per-candidate verify (|∩| over xxh64 token hashes equals |∩| over
    // strings modulo collisions — the q17 contract). On a degenerate
    // small-vocabulary corpus the prefix filter cannot prune (every
    // token is frequent, candidates approach all-pairs), so the verify
    // constant IS the query cost: a single pre-sorted merge pass per
    // pair replaces two array_intersect builds + an array_union
    // (measured 121 s → see PLANS.md q115 note).
    val s = docs.select(col("doc_id"), TextAnalysis.tokenSet(col("text")).as("ws"),
      sort_array(graft.functions.shingleHashes(col("text"), 1)).as("hs"))
    val tok = s.select(col("doc_id"), explode(col("ws")).as("token"))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
    val ordered = tok.join(dfreq, "token")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("ord"))
    // Every token row carries its 1-indexed rank in the rarest-first
    // order plus the set size; ONE pinned exchange on `token` feeds both
    // join sides (a's prefix subset, b's full posting list) so
    // ReuseExchange runs the tokenize→df→sort pipeline once.
    val pos = ordered.select(col("doc_id"), size(col("ord")).cast("long").as("sz"),
      posexplode(expr("transform(ord, x -> x.token)")))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("token"))
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    val spread = pos.repartition(nPart, col("token"))
    // Prefix length |a| − ⌈t·|a|⌉ + 1 in pure integer arithmetic (q104's
    // discipline): ⌈t·n⌉ = (micro·n + 999999) div 1e6.
    val aSide = spread
      .filter(col("p") <= col("sz")
        - expr(s"($minContainMicro * sz + 999999) div 1000000") + 1L)
      .select(col("doc_id").as("a_id"), col("sz").as("a_size"),
        col("p").as("a_p"), col("token"))
    val bSide = spread.select(col("doc_id").as("b_id"), col("sz").as("b_size"),
      col("p").as("b_p"), col("token"))
    // All three candidate-time prunes run BEFORE the pair distinct — the
    // biggest shuffle of the query — and sizes ride the candidate rows so
    // the verify needs no separate size joins:
    //  - size bound: |a∩b| ≤ |b| ⇒ C ≥ t needs |b| ≥ ⌈t·|a|⌉;
    //  - positional bound (PPJoin adapted to containment): common tokens
    //    before the matched rank ≤ min(pa−1, pb−1), the rest
    //    ≤ 1 + min(|a|−pa, |b|−pb); the sum must reach ⌈t·|a|⌉.
    val sized = aSide
      .join(bSide, "token")
      .filter(col("a_id") =!= col("b_id") &&
        col("b_size") * 1000000L >= col("a_size") * minContainMicro)
      .filter(least(col("a_p"), col("b_p")) +
        least(col("a_size") - col("a_p"), col("b_size") - col("b_p"))
        >= expr(s"($minContainMicro * a_size + 999999) div 1000000"))
      .select("a_id", "b_id", "a_size", "b_size").distinct()
    sized
      .join(s.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
      .join(s.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
      .withColumn("inter",
        graft.functions.setOverlapSorted(col("a_hs"), col("b_hs")).cast("long"))
      .select(col("a_id"), col("b_id"), col("a_size"), col("b_size"),
        expr("(1000000 * inter) div a_size").as("containment_micro"),
        expr("(1000000 * inter) div (a_size + b_size - inter)").as("jaccard_micro"))
      .filter(col("containment_micro") >= minContainMicro)
  }

  /** Gated q115: containment pairs at C ≥ 0.9 where b is at least 4×
    * larger — exactly the quote-inclusion rows a symmetric gate cannot
    * see (the size ratio forces Jaccard ≤ ~0.25, far under any near-dup
    * threshold; the templated corpus makes the unrestricted C ≥ 0.9 set
    * 79k-pairs dense at sf0.01, which is a dedup input, not a report).
    * The jaccard_micro column rides along to exhibit the asymmetry.
    */
  def containmentJoin(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      minContainMicro = 900000L)
      .filter(col("b_size") >= col("a_size") * 4)

  private val containmentSql =
    """WITH s AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS ws
      |  FROM documents
      |),
      |tok AS (SELECT doc_id, unnest(ws) AS token FROM s),
      |dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY 1),
      |ord AS (
      |  SELECT t.doc_id, t.token,
      |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.token) AS rn,
      |    count(*) OVER (PARTITION BY t.doc_id) AS sz
      |  FROM tok t JOIN dfreq d USING (token)
      |),
      |pref AS (
      |  SELECT doc_id, token FROM ord
      |  WHERE rn <= sz - ((900000 * sz + 999999) // 1000000) + 1
      |),
      |cand AS (
      |  SELECT DISTINCT p.doc_id AS a_id, t.doc_id AS b_id
      |  FROM pref p JOIN tok t ON p.token = t.token AND p.doc_id <> t.doc_id
      |)
      |SELECT c.a_id, c.b_id,
      |  CAST(len(sa.ws) AS BIGINT) AS a_size,
      |  CAST(len(sb.ws) AS BIGINT) AS b_size,
      |  CAST((1000000 * len(list_intersect(sa.ws, sb.ws))) // len(sa.ws)
      |    AS BIGINT) AS containment_micro,
      |  CAST((1000000 * len(list_intersect(sa.ws, sb.ws)))
      |    // len(list_distinct(list_concat(sa.ws, sb.ws)))
      |    AS BIGINT) AS jaccard_micro
      |FROM cand c
      |JOIN s sa ON c.a_id = sa.doc_id
      |JOIN s sb ON c.b_id = sb.doc_id
      |WHERE (1000000 * len(list_intersect(sa.ws, sb.ws))) // len(sa.ws)
      |  >= 900000
      |  AND len(sb.ws) >= 4 * len(sa.ws)""".stripMargin

  // --------------------------------------------------------------- q128
  /** Winnowing parameters: word-`WinnowK`-gram hashes pass a sliding
    * window of `WinnowW` — any shared token run of length ≥
    * WinnowW + WinnowK − 1 = 7 is GUARANTEED to produce a shared
    * fingerprint, while the expected kept fraction is only 2/(WinnowW+1).
    */
  val WinnowK = 4
  val WinnowW = 4
  /** Position-packing modulus: fingerprint sort key = hash·M + (M−1−pos),
    * so one BIGINT `min()` selects "minimal hash, rightmost on ties" (the
    * canonical winnowing tie-break). 40-bit hash × 20-bit position stays
    * inside a 63-bit signed long; docs are bounded far below 2^20 grams.
    */
  private val WinnowPosM: Long = 1L << 20

  /** Winnowed fingerprint selections per document (Schleimer, Wilkerson
    * & Aiken, SIGMOD'03 — the MOSS local fingerprinting algorithm).
    * Returns distinct (idCol, key) rows where key still packs
    * (hash, flipped position); callers unpack with `key DIV M`.
    *
    * Unlike the stride/modulo selection of [[windowDupes]] (every w-th
    * k-gram — cheap but a match can straddle the stride and vanish),
    * winnowing's window-minimum selection carries the DETECTION
    * GUARANTEE: every window of `WinnowW` consecutive grams contributes
    * its minimum, so two documents sharing ≥ WinnowW+WinnowK−1
    * consecutive tokens always share a fingerprint — with the same
    * ~2/(w+1) storage density.
    *
    * Scale shape: gram explode (corpus-linear) → one doc-keyed window
    * pass (the per-doc sort is by gram position, within-partition) →
    * distinct. No pair space, no corpus-wide sort; at 100 TB the shuffle
    * key is the 8-byte packed fingerprint.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val k = WinnowK
    val grams = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        posexplode(
          when(size(col("toks")) >= k,
            expr(s"transform(sequence(1, size(toks) - ${k - 1}), " +
              s"i -> concat_ws(' ', slice(toks, i, $k)))"))
            .otherwise(array().cast("array<string>"))).as(Seq("pos", "g")))
    // The packing bound is a documented assumption — make it LOUD: a
    // doc beyond 2^20 grams would borrow position bits from the hash and
    // silently invert the tie-break on BOTH engines (the oracle gate
    // would stay green on wrong numbers).
    val checkedPos = expr(s"CASE WHEN pos < $WinnowPosM THEN pos ELSE " +
      "CAST(raise_error('winnowing position overflow: document exceeds " +
      "2^20 grams') AS INT) END")
    val keyed = grams.select(col(idCol), col("pos"),
      (conv(substring(md5(col("g").cast("binary")), 1, 10), 16, 10).cast("long")
        * WinnowPosM + (lit(WinnowPosM - 1) - checkedPos)).as("key"))
    val win = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(WinnowW - 1), 0)
    keyed.withColumn("mk", min(col("key")).over(win))
      .where(col("pos") >= WinnowW - 1) // full windows only
      .select(col(idCol), col("mk")).distinct()
  }

  /** Gated q128: per-doc winnowing fingerprint profile — gram count,
    * selected fingerprint count, selection density (ppm, ~2/(w+1) ≈
    * 400000 expected), and how many of the doc's fingerprint HASHES also
    * appear in some other document's selection (the MOSS cross-doc match
    * signal, computed with one equi-join on the 40-bit hash — never a
    * doc-pair space). Docs with fewer than `WinnowK` tokens have no
    * grams and are absent in both engines.
    */
  def winnowSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val fps = winnowFingerprints(docs)
    val perGram = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        (size(col("toks")) - (WinnowK - 1)).cast("long").as("n_grams"))
      .where(col("n_grams") >= 1)
    val perDoc = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val fph = fps.select(col("doc_id"), expr(s"mk DIV $WinnowPosM").as("h"))
      .distinct()
    val hc = fph.groupBy("h").agg(count(lit(1)).as("nd"))
    val shared = fph.join(hc, "h").where(col("nd") >= 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    perGram
      .join(perDoc, Seq("doc_id"), "left")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        expr("CAST(coalesce(n_fp, 0) * 1000000 DIV n_grams AS BIGINT)")
          .as("fp_density_ppm"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_fp"))
  }

  private val winnowSummarySql = {
    val k = WinnowK
    val w = WinnowW
    val m = WinnowPosM
    val gram = (0 until k).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(str_split(text, ' '), t -> len(t) > 0) AS toks
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, i - 1 AS pos, $gram AS g
       |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-${k - 1})) AS i
       |        FROM toks WHERE len(toks) >= $k)
       |), h AS (
       |  SELECT doc_id, pos,
       |    ('0x' || substr(md5(g), 1, 10))::BIGINT * $m + (${m - 1} - pos) AS key
       |  FROM g
       |), wmin AS (
       |  SELECT doc_id, pos, min(key) OVER (
       |    PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mk
       |  FROM h
       |), fp AS (
       |  SELECT DISTINCT doc_id, mk FROM wmin WHERE pos >= ${w - 1}
       |), fph AS (
       |  SELECT DISTINCT doc_id, mk // $m AS h FROM fp
       |), hc AS (
       |  SELECT h, count(*) AS nd FROM fph GROUP BY 1
       |), shared AS (
       |  SELECT f.doc_id, count(*) AS n_shared
       |  FROM fph f JOIN hc USING (h) WHERE hc.nd >= 2 GROUP BY 1
       |), pg AS (
       |  SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1
       |), pf AS (
       |  SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY 1
       |)
       |SELECT pg.doc_id, CAST(pg.n_grams AS BIGINT) AS n_grams,
       |  CAST(coalesce(pf.n_fp, 0) AS BIGINT) AS n_fp,
       |  CAST(coalesce(pf.n_fp, 0) * 1000000 // pg.n_grams AS BIGINT)
       |    AS fp_density_ppm,
       |  CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared_fp
       |FROM pg
       |LEFT JOIN pf ON pf.doc_id = pg.doc_id
       |LEFT JOIN shared s ON s.doc_id = pg.doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q134
  /** Content-defined chunking (the rsync/LBFS boundary discipline,
    * Muthitacharoen et al., SOSP'01, at word granularity): a chunk
    * boundary falls after token `p` whenever the hash of the
    * `CdcK`-token window ending at `p` is ≡ 0 mod `CdcD` — so boundaries
    * are a function of CONTENT, not position, and an insertion early in a
    * document shifts every chunk of a fixed-stride scheme but only the
    * one chunk it touches here. Expected chunk length = `CdcD` tokens.
    *
    * This is the third granularity of the dedup family: document-level
    * (q15/q17), window/fingerprint-level (q53/q128), and here
    * storage-chunk-level — the measure of how much of the corpus is
    * REDUNDANT SPANS reusable across documents (boilerplate headers,
    * quoted replies, license blocks) even when no two documents match.
    *
    * Scale shape: token explode (corpus-linear), one doc-keyed window
    * pass for the running boundary count, one (doc, chunk) aggregate
    * that rebuilds chunk text order-deterministically (array_sort on
    * (pos, tok) structs — never a bare collect_list ordering
    * assumption), and one equi-join on the chunk's md5 — the shuffle key
    * is 16 bytes however long the chunk. No pair space anywhere.
    */
  val CdcK = 4
  val CdcD = 16

  def cdcChunks(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val k = CdcK
    val toks = docs
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
    // Window hash at positions with a full k-window; earlier tokens can
    // never close a chunk.
    val wgram = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(k - 1), 0)
    val flagged = toks
      .withColumn("g", concat_ws(" ",
        collect_list(col("tok")).over(wgram)))
      .withColumn("bnd",
        col("pos") >= k - 1 &&
          conv(substring(md5(col("g").cast("binary")), 1, 10), 16, 10)
            .cast("long") % CdcD === 0)
    val wrun = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    flagged
      .withColumn("chunk",
        coalesce(sum(when(col("bnd"), 1L).otherwise(0L)).over(wrun), lit(0L)))
      .groupBy(col(idCol), col("chunk"))
      .agg(
        count(lit(1)).as("chunk_len"),
        expr("md5(concat_ws(' ', transform(" +
          "array_sort(collect_list(struct(pos, tok))), x -> x.tok)))")
          .as("chunk_hash"))
  }

  /** Gated q134: per-doc content-defined chunk profile — token/chunk
    * counts and how many of the doc's distinct chunk hashes also occur in
    * another document (cross-doc reusable spans).
    */
  def cdcSummary(spark: SparkSession, dir: String): DataFrame = {
    val chunks = cdcChunks(Tables.documents(spark, dir))
    val perDoc = chunks.groupBy("doc_id").agg(
      sum(col("chunk_len")).as("n_tokens"),
      count(lit(1)).as("n_chunks"))
    val dh = chunks.select(col("doc_id"), col("chunk_hash")).distinct()
    val hc = dh.groupBy("chunk_hash").agg(count(lit(1)).as("nd"))
    val shared = dh.join(hc, "chunk_hash").where(col("nd") >= 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    perDoc.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_chunks"))
  }

  private val cdcSummarySql = {
    val k = CdcK
    val gram = (0 until k).map(o => s"toks[i-${k - 1 - o}]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(str_split(text, ' '), t -> len(t) > 0) AS toks
       |  FROM documents
       |), tk AS (
       |  SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
       |    CASE WHEN i >= $k THEN
       |      ('0x' || substr(md5($gram), 1, 10))::BIGINT % $CdcD = 0
       |    ELSE false END AS bnd
       |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
       |        FROM toks WHERE len(toks) >= 1)
       |), ck AS (
       |  SELECT doc_id, pos, tok,
       |    coalesce(sum(CASE WHEN bnd THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
       |  FROM tk
       |), ch AS (
       |  SELECT doc_id, chunk, count(*) AS chunk_len,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
       |  FROM ck GROUP BY 1, 2
       |), per AS (
       |  SELECT doc_id, CAST(sum(chunk_len) AS BIGINT) AS n_tokens,
       |    count(*) AS n_chunks
       |  FROM ch GROUP BY 1
       |), dh AS (
       |  SELECT DISTINCT doc_id, chunk_hash FROM ch
       |), hc AS (
       |  SELECT chunk_hash, count(*) AS nd FROM dh GROUP BY 1
       |), shared AS (
       |  SELECT d.doc_id, count(*) AS n_shared
       |  FROM dh d JOIN hc USING (chunk_hash) WHERE hc.nd >= 2 GROUP BY 1
       |)
       |SELECT p.doc_id, p.n_tokens, CAST(p.n_chunks AS BIGINT) AS n_chunks,
       |  CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared_chunks
       |FROM per p LEFT JOIN shared s ON s.doc_id = p.doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q144
  /** Dedup savings report — the number a curation run is judged by:
    * per source, how many documents AND how much token mass near-dup
    * deduplication removes (keep-min-id per cluster, q30 semantics, on
    * the planted-twin corpus so dup structure is dense and known).
    * Token savings ≠ doc savings when duplicates skew long — which is
    * exactly why budget decisions need the token row, not the doc row.
    *
    * Same cached-eager clustering + lazy summary discipline as q30; the
    * token accounting adds one `size(tokens())` projection on each side
    * — no new shuffles beyond the per-source aggregates.
    */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val planted = docs.select(col("doc_id"), col("text"), col("source")).unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"), col("source")))
      .cache()
    try {
      val kept = dedupedCorpus(planted, threshold = 0.7, maxBucketSize = None)
      def tok(df: DataFrame) =
        df.select(col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      val before = tok(planted).groupBy("source")
        .agg(count(lit(1)).as("n_before"), sum(col("nt")).as("tokens_before"))
      val after = tok(kept).groupBy(col("source").as("s2"))
        .agg(count(lit(1)).as("n_after"), sum(col("nt")).as("tokens_after"))
      before.join(after, col("source") === col("s2"), "left")
        .select(col("source"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          col("tokens_before"),
          coalesce(col("tokens_after"), lit(0L)).as("tokens_after"))
        .withColumn("token_savings_ppm",
          expr("CAST((tokens_before - tokens_after) * 1000000 DIV tokens_before AS BIGINT)"))
    } finally planted.unpersist(blocking = false)
  }

  private val dedupSavingsSql =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text || ' zz' AS text, source FROM documents
       |), ${exactPairCtes(0.7)},
       |edges AS (
       |  SELECT a_id, b_id FROM pairs UNION SELECT b_id, a_id FROM pairs
       |),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM corpus
       |  UNION
       |  SELECT r.src, e.b_id FROM reach r JOIN edges e ON r.dst = e.a_id
       |),
       |labels AS (
       |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY 1
       |),
       |toks2 AS (
       |  SELECT c.doc_id, c.source,
       |    len(list_filter(str_split(c.text, ' '), t -> len(t) > 0)) AS nt,
       |    l.cluster_id
       |  FROM corpus c JOIN labels l ON c.doc_id = l.doc_id
       |),
       |bef AS (
       |  SELECT source, count(*) AS n_before, sum(nt) AS tokens_before
       |  FROM toks2 GROUP BY 1
       |),
       |aft AS (
       |  SELECT source, count(*) AS n_after, sum(nt) AS tokens_after
       |  FROM toks2 WHERE doc_id = cluster_id GROUP BY 1
       |)
       |SELECT b.source, CAST(b.n_before AS BIGINT) AS n_before,
       |  CAST(coalesce(a.n_after, 0) AS BIGINT) AS n_after,
       |  CAST(b.tokens_before AS BIGINT) AS tokens_before,
       |  CAST(coalesce(a.tokens_after, 0) AS BIGINT) AS tokens_after,
       |  CAST((b.tokens_before - coalesce(a.tokens_after, 0)) * 1000000
       |    // b.tokens_before AS BIGINT) AS token_savings_ppm
       |FROM bef b LEFT JOIN aft a ON b.source = a.source""".stripMargin

  // --------------------------------------------------------------- q148
  /** Dedup method evaluation — the tuning table for the SimHash radius:
    * for each hamming threshold h ∈ 0..3, how many pairs the 60-bit
    * SimHash predicts, how many of those are TRUE near-dups (exact
    * shingle-Jaccard ≥ 0.7), and the resulting precision/recall in exact
    * ppm. Both sides are exactly computable — the signature is the
    * portable md5 basis (q18) and the truth set is the verified exact
    * pair set (q17, recall 1.0 on the harness corpora) — so the
    * operating points are facts, not estimates: the table that answers
    * "which radius do we ship".
    *
    * Scale shape: predictions come from the pigeonhole chunk join (never
    * all-pairs at scale; the oracle's quadratic form is gate-only),
    * truth from the banded LSH pipeline; the evaluation join is
    * pair-keyed and the final table is 4 rows.
    */
  def dedupMethodEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pred = simHashNearDups(docs, maxHamming = 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
    // ONE lazy plan: the truth pipeline (the costliest subDAG) feeds the
    // evaluation join and the one-row count through the same tree — no
    // eager driver count() re-deriving LSH + exact verify a second time
    // (the quantileNormalize broadcast-scalar pattern).
    val truth = minHashNearDups(docs, threshold = 0.7, maxBucketSize = None)
      .select(col("a_id").as("t_a"), col("b_id").as("t_b"))
    val nTrueDf = truth.agg(count(lit(1)).as("n_true"))
    val joined = pred
      .join(truth, col("a_id") === col("t_a") && col("b_id") === col("t_b"),
        "left")
      .select(col("hamming"), col("t_a").isNotNull.cast("long").as("hit"))
    val byH = joined.groupBy("hamming")
      .agg(count(lit(1)).as("n"), sum(col("hit")).as("nh"))
    spark.range(0, 4).select(col("id").cast("int").as("max_hamming"))
      .join(byH, col("hamming") <= col("max_hamming"), "left")
      .groupBy("max_hamming")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_pred"),
        coalesce(sum(col("nh")), lit(0L)).as("n_hit"))
      .crossJoin(broadcast(nTrueDf))
      .select(col("max_hamming"), col("n_pred"), col("n_hit"),
        col("n_true"),
        expr("CAST(CASE WHEN n_pred > 0 THEN n_hit * 1000000 DIV n_pred " +
          "ELSE 0 END AS BIGINT)").as("precision_ppm"),
        expr("CAST(CASE WHEN n_true > 0 THEN n_hit * 1000000 DIV n_true " +
          "ELSE 0 END AS BIGINT)").as("recall_ppm"))
  }

  private lazy val dedupMethodEvalSql =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |), ${exactPairCtes(0.7)},
       |ws2 AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |sh2 AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM ws2
       |),
       |hx2 AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh2),
       |bits2 AS (
       |  SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hx2, (SELECT unnest(range(60)) AS b)
       |  GROUP BY 1, 2
       |),
       |sig2 AS (
       |  SELECT w.doc_id, CAST(coalesce(s.sig, 0) AS BIGINT) AS simhash
       |  FROM ws2 w LEFT JOIN (
       |    SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS sig
       |    FROM bits2 GROUP BY 1) s ON w.doc_id = s.doc_id
       |),
       |prs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    bit_count(xor(a.simhash, b.simhash)) AS h
       |  FROM sig2 a JOIN sig2 b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |),
       |j AS (
       |  SELECT p.h, CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM prs p LEFT JOIN pairs t ON t.a_id = p.a_id AND t.b_id = p.b_id
       |),
       |nt AS (SELECT count(*) AS n_true FROM pairs),
       |th AS (SELECT unnest(range(4)) AS max_hamming)
       |SELECT CAST(th.max_hamming AS INT) AS max_hamming,
       |  CAST(count(j.h) AS BIGINT) AS n_pred,
       |  CAST(coalesce(sum(j.hit), 0) AS BIGINT) AS n_hit,
       |  CAST(nt.n_true AS BIGINT) AS n_true,
       |  CAST(CASE WHEN count(j.h) > 0
       |       THEN coalesce(sum(j.hit), 0) * 1000000 // count(j.h)
       |       ELSE 0 END AS BIGINT) AS precision_ppm,
       |  CAST(CASE WHEN nt.n_true > 0
       |       THEN coalesce(sum(j.hit), 0) * 1000000 // nt.n_true
       |       ELSE 0 END AS BIGINT) AS recall_ppm
       |FROM th CROSS JOIN nt LEFT JOIN j ON j.h <= th.max_hamming
       |GROUP BY th.max_hamming, nt.n_true""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q144_dedup_savings", dedupSavings _, Some(dedupSavingsSql)),
    NamedQuery("q148_dedup_method_eval", dedupMethodEval _,
      Some(dedupMethodEvalSql)),
    NamedQuery("q134_cdc_chunks", cdcSummary _, Some(cdcSummarySql)),
    NamedQuery("q128_winnow_fingerprints", winnowSummary _, Some(winnowSummarySql)),
    NamedQuery("q115_containment_join", containmentJoin _, Some(containmentSql)),
    NamedQuery("q102_sorted_neighborhood", sortedNeighborhood _, Some(sortedNeighborhoodSql)),
    NamedQuery("q104_prefix_filter_join", prefixFilterJoin _, Some(prefixFilterSql)),
    NamedQuery("q17_minhash_neardups", minHashSummary _, Some(minHashSummarySql)),
    NamedQuery("q18_simhash_signatures", simHashSummary _, Some(simHashSummarySql)),
    NamedQuery("q30_dedup_corpus", dedupCorpusSummary _, Some(dedupCorpusSummarySql)),
    NamedQuery("q48_canonical_docs", canonicalDocs _, Some(canonicalDocsSql)),
    NamedQuery("q53_window_dupes", windowDupesSummary _, Some(windowDupesSql)),
    NamedQuery("q56_incremental_neardups", incrementalSummary _, Some(incrementalSummarySql)))
}
