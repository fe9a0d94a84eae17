package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Training-data curation operators beyond the reference's surface —
  * the set a large-scale LLM data pipeline runs between "raw corpus" and
  * "training shards": deterministic splits, eval-contamination checks,
  * stratified sampling, and vocabulary statistics. All are pure
  * hash/window/aggregate plans (one shuffle each, no driver loops), and
  * all are ANSI-expressible so the DuckDB oracle checks them exactly.
  */
object TrainingData {

  /** Stable hex digest of any key column — md5 of its string form. Both
    * engines produce identical lowercase hex (q15's fingerprint already
    * relies on this), which makes hash-derived decisions (splits, sample
    * ranks) reproducible across engines, runs, and cluster layouts —
    * the property a training pipeline needs so re-running data prep
    * never silently reshuffles examples between train and eval.
    */
  private def keyHash(key: Column): Column = md5(key.cast("string").cast("binary"))

  /** Deterministic train/val/test assignment by the first hex nibble of
    * the key hash: 12/16 train, 2/16 val, 2/16 test (75/12.5/12.5). A
    * per-row projection — membership never depends on other rows, so any
    * subset of the corpus splits consistently.
    */
  def hashSplit(key: Column): Column = {
    val nibble = substring(keyHash(key), 1, 1)
    when(nibble.between("0", "b"), "train")
      .when(nibble.isin("c", "d"), "val")
      .otherwise("test")
  }

  /** Deterministic stratified sample: keep `perStratum` rows per stratum,
    * chosen by hash rank — reproducible "random" sampling with exact
    * per-group quotas (a fractional `sample()` can't guarantee either).
    * One shuffle on the stratum key. The rank window funnels each stratum
    * into one task — fine for many small strata; when one stratum is a
    * corpus-sized domain, use [[hashQuotaSample]] (identical selection,
    * no per-stratum sort).
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column, perStratum: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(keyHash(key), key)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= perStratum)
  }

  // ---------------------------------------------------------------- q35
  /** Split-assignment summary: docs and chars per (split, lang) — the
    * sanity report run after assigning a corpus to train/val/test.
    */
  def hashSplitSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(hashSplit(col("doc_id")).as("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))

  private val hashSplitSql =
    """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) BETWEEN '0' AND 'b' THEN 'train'
      |            WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('c','d') THEN 'val'
      |            ELSE 'test' END AS split,
      |  lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Eval-set contamination check: which held-out documents still appear
    * verbatim (normalized-fingerprint-exact) in the training corpus — the
    * leakage scan every LLM eval pipeline needs. The corpus has no exact
    * dups, so the query plants its own eval set: every 10th doc is
    * re-keyed, and every OTHER one of those is mutated — exactly the
    * doc_id%20==0 half must be flagged. The probe is a distinct-
    * fingerprint left join: one shuffle on the fingerprint, train side
    * deduped so matches never fan out.
    */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val eval = docs.filter(col("doc_id") % 10 === 0)
      .select(
        col("source"),
        when(col("doc_id") % 20 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" clean"))).as("text"))
    contaminationAtScale(docs.select(col("text")), eval)
  }

  /** The 100 TB shape of the contamination probe, output-identical to a
    * plain distinct+left-join: a driver-sized Bloom filter over the
    * (small) EVAL fingerprint set prefilters the training corpus IN ITS
    * SCAN — the corpus side never shuffles its full fingerprint set, only
    * the Bloom survivors (true hits + ~fpp of the corpus) reach the
    * distinct, and the confirming join is exact, so false positives die
    * there and false negatives cannot exist. One full-corpus pass, no
    * full-corpus exchange.
    *
    * `expectedEvalItems` sizes the filter blob (bits = 8× items, ~1 byte
    * per expected item); it is a PERF knob only — an undersized filter
    * admits more false positives for the exact join to discard, never a
    * wrong answer. The blob travels as a plan literal, so size it for the
    * eval set, not for headroom.
    */
  def contaminationAtScale(train: DataFrame, eval: DataFrame,
                           expectedEvalItems: Long = 100000L): DataFrame = {
    val evalFp = eval.select(col("source"),
      TextAnalysis.fingerprint(col("text")).as("efp"))
    val bloom = graft.functions.BloomFilters.build(
      evalFp, col("efp"), expectedEvalItems, expectedEvalItems * 8)
    val trainHits = train
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .filter(graft.functions.BloomFilters.mightContain(bloom, col("fp")))
      .distinct()
    evalFp
      .join(trainHits, col("efp") === col("fp"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_eval"),
        count(col("fp")).as("n_contaminated"))
  }

  private val contaminationSql =
    """WITH eval AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 20 = 0 THEN text ELSE text || ' clean' END AS text
      |  FROM documents WHERE doc_id % 10 = 0
      |), train AS (
      |  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents
      |)
      |SELECT e.source, CAST(count(*) AS BIGINT) AS n_eval,
      |  CAST(count(t.fp) AS BIGINT) AS n_contaminated
      |FROM (SELECT source, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS efp
      |      FROM eval) e
      |LEFT JOIN train t ON e.efp = t.fp
      |GROUP BY e.source""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Deterministic stratified sample: 20 docs per language by hash rank. */
  def stratifiedSampleByLang(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir),
      col("lang"), col("doc_id"), perStratum = 20)
      .select(col("lang"), col("doc_id"), col("rank"))

  private val stratifiedSampleSql =
    """SELECT lang, doc_id,
      |  row_number() OVER (PARTITION BY lang
      |                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
      |FROM documents QUALIFY rank <= 20""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Top-10 tokens per language by frequency — the vocabulary head check
    * before tokenizer training. Explode → two-level aggregate; count
    * ties break on the token string so ranks are total and the result is
    * engine-independent.
    */
  def topTokensPerLang(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val w = Window.partitionBy("lang").orderBy(desc("n"), asc("token"))
    toks.groupBy("lang", "token").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
  }

  private val topTokensSql =
    """WITH toks AS (
      |  SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS token
      |  FROM documents
      |)
      |SELECT lang, token, CAST(count(*) AS BIGINT) AS n,
      |  row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, token) AS rank
      |FROM toks WHERE token <> ''
      |GROUP BY lang, token QUALIFY rank <= 10""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences by cumulative token offset — the offset-chunking
    * formulation (seq = floor(start_offset / budget)) rather than
    * greedy-with-reset, because a running sum with resets is not
    * window-expressible and the offset form is what scales: packing is
    * PER SOURCE (shard-local), so the running sum is a per-partition
    * window, never a global single-partition sort. Emits the per-sequence
    * fill report (docs, tokens, fill ratio) used to validate packing
    * efficiency before shard writing.
    */
  /** Token budget of the gated q39 — one constant drives BOTH the Spark
    * plan and the generated oracle SQL, so the parameter cannot silently
    * diverge between them.
    */
  val PackBudget = 256

  def packSequences(spark: SparkSession, dir: String, budget: Int = PackBudget): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
      .withColumn("start_off", sum("n_toks").over(w) - col("n_toks"))
      .groupBy(col("source"),
        floor(col("start_off") / budget.toDouble).as("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("seq_tokens"),
        round(sum("n_toks") / budget.toDouble, 4).as("fill_ratio"))
  }

  private val packSequencesSql =
    s"""WITH toks AS (
       |  SELECT source, doc_id,
       |    len(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS n_toks
       |  FROM documents
       |), cum AS (
       |  SELECT source, doc_id, n_toks,
       |    sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
       |                      ROWS UNBOUNDED PRECEDING) - n_toks AS start_off
       |  FROM toks
       |)
       |SELECT source, CAST(floor(start_off / $PackBudget.0) AS BIGINT) AS seq_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS seq_tokens,
       |  round(sum(n_toks) / $PackBudget.0, 4) AS fill_ratio
       |FROM cum GROUP BY source, seq_id""".stripMargin

  // ---------------------------------------------------------------- q40
  /** PII scrub: redact email addresses and report the per-source scrub
    * accounting (docs touched, characters removed) — the redaction audit
    * a data-curation pass emits. The corpus has none, so the query plants
    * a deterministic email on every 7th doc; the scrub must touch exactly
    * those. Pattern sticks to plain character classes so the Java and
    * RE2-family dialects agree.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
    val planted = Tables.documents(spark, dir)
      .select(col("source"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact: user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(col("text")).as("text"))
    planted
      .withColumn("scrubbed", regexp_replace(col("text"), emailRe, "<EMAIL>"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("scrubbed") =!= col("text"), 1L).otherwise(0L)).as("n_redacted"),
        sum(length(col("text")) - length(col("scrubbed"))).cast("long").as("chars_removed"))
  }

  private val piiScrubSql =
    """WITH planted AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 7 = 0
      |         THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |         ELSE text END AS text
      |  FROM documents
      |), scrub AS (
      |  SELECT source, text,
      |    regexp_replace(text, '[a-z0-9]+@[a-z0-9]+[.][a-z]+', '<EMAIL>', 'g') AS scrubbed
      |  FROM planted
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN scrubbed <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
      |  CAST(sum(length(text) - length(scrubbed)) AS BIGINT) AS chars_removed
      |FROM scrub GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- q45
  /** N-gram decontamination — the partial-overlap complement of q36's
    * verbatim check (the GPT-3-style scan: a training doc is suspect if
    * it shares ANY word n-gram with the held-out set, catching quotes and
    * paraphrase-with-splicing that fingerprint equality misses; real
    * pipelines use 13-grams, the harness corpus's 31-word vocabulary
    * makes 3-grams the discriminating size). Eval = the q35 hash-split's
    * own test partition, so the query needs no planted fixtures.
    *
    * Plan shape for 100 TB: the eval side is a benchmark suite — tiny by
    * construction — so its distinct shingle set is BROADCAST and the
    * training corpus is never shuffled at all: one scan, shingles
    * exploded and probed against the broadcast hash set, then a per-doc
    * count. (Were the eval side ever corpus-sized, swap the broadcast for
    * [[contaminationAtScale]]'s Bloom-prefilter seam.)
    */
  /** Core overlap operator: for each training doc, how many of its
    * distinct word n-grams also appear anywhere in the eval set.
    * Returns (idCol, n_shared_ngrams, contaminated).
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, n: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def sh(df: DataFrame, cols: Column*) = df.select(cols :+
      explode(array_distinct(graft.functions.shingleStrings(col(textCol), n))).as("s"): _*)
    val evalShingles = sh(eval).distinct()
    val hits = sh(train, col(idCol))
      .join(broadcast(evalShingles), Seq("s"))
      .groupBy(idCol).agg(count(lit(1)).as("n"))
    train.select(idCol)
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  def ngramDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), hashSplit(col("doc_id")).as("split"), col("text"))
    ngramOverlap(
      docs.filter(col("split") === "train"),
      docs.filter(col("split") === "test"))
      .withColumnRenamed("n_shared_ngrams", "n_shared_trigrams")
  }

  private val ngramDecontaminationSql =
    """WITH ws AS (
      |  SELECT doc_id,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) BETWEEN '0' AND 'b' THEN 'train'
      |              WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('c','d') THEN 'val'
      |              ELSE 'test' END AS split,
      |         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id, split, unnest(list_distinct(list_transform(range(1, greatest(len(w)-1,1)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      |  FROM ws
      |),
      |ev AS (SELECT DISTINCT s FROM sh WHERE split = 'test'),
      |hits AS (
      |  SELECT t.doc_id AS doc_id, count(*) AS n
      |  FROM sh t JOIN ev USING (s) WHERE t.split = 'train' GROUP BY 1
      |)
      |SELECT w.doc_id AS doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_shared_trigrams,
      |       CAST(coalesce(h.n, 0) > 0 AS INT) AS contaminated
      |FROM ws w LEFT JOIN hits h ON w.doc_id = h.doc_id
      |WHERE w.split = 'train'""".stripMargin

  // --------------------------------------------------------------- q233
  /** Exact substring decontamination — the run-length member of the
    * decontamination family (q36 = whole-doc verbatim, q45 = any-shared-
    * n-gram): the public-pipeline standard flags a training doc when it
    * shares an exact CONTIGUOUS token run of ≥ R tokens with any eval
    * doc (the GPT-3/PaLM-style ~50-token substring rule; the harness
    * corpus's 31-word vocabulary makes R = 8 the discriminating size —
    * random 3-gram collisions chain to runs ≤ 7, the planted cross-split
    * duplicate carries a 66-token run).
    *
    * Sorted token-k-gram join with run-length merge: seed on word
    * k-grams WITH their token position, probe the eval set's distinct
    * gram set, then merge CONSECUTIVE matched positions into islands
    * (pos − row_number() per doc — the q95 gaps-and-islands kernel); a
    * run of m consecutive matched k-gram positions is an exact shared
    * substring of m + k − 1 tokens. Exact by construction — no
    * fingerprint, no sketch; every reported run is a literal shared
    * substring.
    *
    * Plan shape for 100 TB: the eval side is a benchmark suite — tiny by
    * construction — so its distinct gram set BROADCASTS and the training
    * corpus is never shuffled: one scan + posexplode + broadcast probe;
    * the islands window partitions by doc over MATCHED positions only
    * (≪ corpus grams after the probe — the q45 seam). Work ∝ train
    * tokens; a corpus-sized eval side would swap the broadcast for the
    * Bloom-prefilter seam exactly like [[contaminationAtScale]].
    */
  def substringOverlap(train: DataFrame, eval: DataFrame, k: Int = 3,
                       minRun: Int = 8, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val evalGrams = eval
      .select(explode(array_distinct(
        graft.functions.shingleStrings(col(textCol), k))).as("s"))
      .distinct()
    val matched = train
      .select(col(idCol),
        posexplode(graft.functions.shingleStrings(col(textCol), k)))
      .toDF(idCol, "pos", "s")
      .join(broadcast(evalGrams), Seq("s"))
    val wDoc = Window.partitionBy(idCol).orderBy("pos")
    val runs = matched
      .withColumn("grp", col("pos") - row_number().over(wDoc))
      .groupBy(col(idCol), col("grp"))
      .agg(count(lit(1)).as("m_grams"))
      .withColumn("run_tokens", col("m_grams") + lit(k - 1).cast("long"))
    val perDoc = runs.groupBy(idCol)
      .agg(sum("m_grams").as("n_matched_grams"),
        count(lit(1)).as("n_runs"),
        max("run_tokens").as("max_run_tokens"))
    train.select(idCol)
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_matched_grams"), lit(0L)).as("n_matched_grams"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("max_run_tokens"), lit(0L)).as("max_run_tokens"),
        (coalesce(col("max_run_tokens"), lit(0L)) >= minRun)
          .cast("int").as("contaminated"))
  }

  def substringDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), hashSplit(col("doc_id")).as("split"), col("text"))
    substringOverlap(
      docs.filter(col("split") === "train"),
      docs.filter(col("split") === "test"))
  }

  private val substringDecontaminationSql =
    """WITH ws AS (
      |  SELECT doc_id,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) BETWEEN '0' AND 'b' THEN 'train'
      |              WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('c','d') THEN 'val'
      |              ELSE 'test' END AS split,
      |         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id, split, i AS pos,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM ws, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)
      |),
      |ev AS (SELECT DISTINCT s FROM sh WHERE split = 'test'),
      |m AS (
      |  SELECT t.doc_id AS doc_id, t.pos,
      |    t.pos - row_number() OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS grp
      |  FROM sh t JOIN ev USING (s) WHERE t.split = 'train'
      |),
      |runs AS (
      |  SELECT doc_id, count(*) AS m_grams, count(*) + 2 AS run_tokens
      |  FROM m GROUP BY doc_id, grp
      |),
      |per_doc AS (
      |  SELECT doc_id, sum(m_grams) AS n_matched_grams, count(*) AS n_runs,
      |    max(run_tokens) AS max_run_tokens
      |  FROM runs GROUP BY 1
      |)
      |SELECT w.doc_id AS doc_id,
      |  CAST(coalesce(p.n_matched_grams, 0) AS BIGINT) AS n_matched_grams,
      |  CAST(coalesce(p.n_runs, 0) AS BIGINT) AS n_runs,
      |  CAST(coalesce(p.max_run_tokens, 0) AS BIGINT) AS max_run_tokens,
      |  CAST(coalesce(p.max_run_tokens, 0) >= 8 AS INT) AS contaminated
      |FROM ws w LEFT JOIN per_doc p ON w.doc_id = p.doc_id
      |WHERE w.split = 'train'""".stripMargin

  // --------------------------------------------------------------- q237
  /** Corpus-INTERNAL exact substring self-dedup — the within-train
    * sibling of [[substringOverlap]] (q233 decontaminates train-vs-eval;
    * this is the Lee-et-al-style public-pipeline standard: flag every
    * span of ≥ R tokens that occurs verbatim MORE THAN ONCE corpus-wide,
    * repeats within the same document included).
    *
    * The identity that keeps it linear: with gram size k = R, a
    * duplicated k-gram IS an exact duplicated R-token substring, and a
    * duplicated span of L ≥ R tokens is exactly the interval union of
    * its L − R + 1 duplicated k-grams. So the removal set = the
    * per-doc interval union of duplicated-k-gram positions — no suffix
    * array, and crucially NO per-gram occurrence-pair self-join (that
    * goes quadratic on boilerplate grams at corpus scale):
    *   1. positional k-grams per doc (one scan + posexplode);
    *   2. gram → occurrence count, keep ≥ 2 (hash-partitioned agg);
    *   3. equi-join matched positions back (shuffle on the gram key,
    *      work ∝ tokens — bucketed, never all-pairs);
    *   4. per-doc interval union: fixed-length-k intervals sorted by
    *      pos merge iff next.pos − prev.pos ≤ k (lag-break + running-sum
    *      islands over MATCHED positions only, ≪ tokens after step 3);
    *      an island spans max(pos) − min(pos) + k tokens.
    *
    * Output is all-BIGINT per doc plus a division-free strictly-more-
    * than-half coverage flag — hash-exact in any engine. 100 TB note:
    * the join key is the gram STRING (oracle-portable); web scale would
    * key on xxhash64(gram) for ~10× fewer shuffle bytes at 2⁻⁶⁴
    * false-dup odds, identical plan shape. The harness corpus's planted
    * verbatim duplicates give multi-span coverage; its 31-word
    * vocabulary keeps random-chance 8-gram repeats discriminatingly
    * rare (the q233 run-length argument).
    */
  def selfSubstringDedup(docs: DataFrame, k: Int = 8,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol),
        posexplode(graft.functions.shingleStrings(col(textCol), k)))
      .toDF(idCol, "pos", "s")
    val dup = grams.groupBy("s").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("s")
    val matched = grams.join(dup, Seq("s")).select(col(idCol), col("pos"))
    val wDoc = Window.partitionBy(idCol).orderBy("pos")
    val spans = matched
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(wDoc) > k, 1).otherwise(0))
      .withColumn("grp", sum("brk").over(wDoc))
      .groupBy(col(idCol), col("grp"))
      .agg((max("pos") - min("pos") + lit(k)).cast("long").as("span_tokens"))
    val perDoc = spans.groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum("span_tokens").as("dup_tokens"),
        max("span_tokens").as("max_span_tokens"))
    docs
      .select(col(idCol),
        size(graft.functions.shingleStrings(col(textCol), 1))
          .cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)) * 2 > col("n_tokens"))
          .cast("int").as("mostly_dup"))
  }

  def selfSubstringDedupDocs(spark: SparkSession, dir: String): DataFrame =
    selfSubstringDedup(Tables.documents(spark, dir))

  private val selfSubstringDedupSql =
    """WITH ws AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id, i AS pos,
      |    w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
      |    w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS s
      |  FROM ws, unnest(range(1, greatest(len(w) - 6, 1))) AS t(i)
      |),
      |dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2),
      |brk AS (
      |  SELECT sh.doc_id AS doc_id, sh.pos AS pos,
      |    CASE WHEN sh.pos - lag(sh.pos) OVER
      |      (PARTITION BY sh.doc_id ORDER BY sh.pos) > 8
      |      THEN 1 ELSE 0 END AS b
      |  FROM sh JOIN dup USING (s)
      |),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM brk
      |),
      |spans AS (
      |  SELECT doc_id, grp, max(pos) - min(pos) + 8 AS span_tokens
      |  FROM isl GROUP BY doc_id, grp
      |),
      |per_doc AS (
      |  SELECT doc_id, count(*) AS n_spans, sum(span_tokens) AS dup_tokens,
      |         max(span_tokens) AS max_span_tokens
      |  FROM spans GROUP BY 1
      |)
      |SELECT w.doc_id AS doc_id,
      |  CAST(len(w.w) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
      |  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
      |  CAST(coalesce(p.max_span_tokens, 0) AS BIGINT) AS max_span_tokens,
      |  CAST(coalesce(p.dup_tokens, 0) * 2 > len(w.w) AS INT) AS mostly_dup
      |FROM ws w LEFT JOIN per_doc p ON w.doc_id = p.doc_id""".stripMargin

  // --------------------------------------------------------------- q240
  /** The REMOVAL artifact of [[selfSubstringDedup]] — what the Lee-et-al
    * pipeline actually emits: the corpus with every duplicated ≥k-token
    * span CUT, i.e. a token survives iff no duplicated k-gram covers it.
    * Where q237 reports the per-doc span statistics, this materializes
    * the cleaned text (the deduplicated training corpus).
    *
    * Shape: the same positional-gram → occurrence ≥ 2 → match join as
    * q237, then each matched gram position p expands to its covered
    * token interval [p, p+k−1] (sequence explode — ∝ removed tokens,
    * never ∝ corpus), tokens ANTI-join the distinct covered set on
    * (doc, pos), and the survivors re-assemble per doc via a sorted
    * collect (per-doc memory ∝ doc length — the q235 window class).
    * Output text is the whitespace-canonical lowercase token stream
    * (the [[graft.functions.shingleStrings]] tokenization — cleaning
    * happens on the same canonical form every dedup operator keys on),
    * so the column is engine-portable and hash-exact.
    */
  def selfSubstringRemove(docs: DataFrame, k: Int = 8,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
        posexplode(graft.functions.shingleStrings(col(textCol), 1)))
      .toDF(idCol, "pos", "w")
    val grams = docs.select(col(idCol),
        posexplode(graft.functions.shingleStrings(col(textCol), k)))
      .toDF(idCol, "pos", "s")
    val dup = grams.groupBy("s").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("s")
    val covered = grams.join(dup, Seq("s"))
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            e => e.getField("w"))).as("cleaned_text"))
    docs.select(col(idCol),
        size(graft.functions.shingleStrings(col(textCol), 1))
          .cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  def selfSubstringRemoveDocs(spark: SparkSession, dir: String): DataFrame =
    selfSubstringRemove(Tables.documents(spark, dir))

  private val selfSubstringRemoveSql =
    """WITH ws AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |),
      |toks AS (
      |  SELECT doc_id, i AS pos, w[i] AS tok
      |  FROM ws, unnest(range(1, len(w) + 1)) AS t(i)
      |),
      |sh AS (
      |  SELECT doc_id, i AS pos,
      |    w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
      |    w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS s
      |  FROM ws, unnest(range(1, greatest(len(w) - 6, 1))) AS t(i)
      |),
      |dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2),
      |cov AS (
      |  SELECT DISTINCT sh.doc_id AS doc_id, sh.pos + o.i AS pos
      |  FROM sh JOIN dup USING (s), unnest(range(0, 8)) AS o(i)
      |),
      |kept AS (
      |  SELECT t.doc_id, t.pos, t.tok
      |  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
      |  WHERE c.pos IS NULL
      |),
      |rebuilt AS (
      |  SELECT doc_id, count(*) AS kept_tokens,
      |         string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
      |  FROM kept GROUP BY 1
      |)
      |SELECT w.doc_id AS doc_id,
      |  CAST(len(w.w) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
      |  coalesce(r.cleaned_text, '') AS cleaned_text
      |FROM ws w LEFT JOIN rebuilt r ON w.doc_id = r.doc_id""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Scale of the integer log-probability grid: micro-nats. One constant
    * drives both the Spark plan and the oracle SQL.
    */
  val LmUnat = 1000000.0

  /** CCNet-style bigram language-model scoring: train add-one-smoothed
    * bigram/unigram counts on the corpus itself, then score every document
    * by its summed negative log-likelihood — the classic
    * perplexity-filtering signal (docs whose token sequences the corpus LM
    * finds surprising are the quality outliers). p(w2|w1) =
    * (c(w1 w2)+1)/(c(w1)+V).
    *
    * Exactness design: each bigram occurrence contributes
    * `floor(-ln(p)·1e6 + 0.5)` MICRO-NATS — an integer — so the per-doc
    * sum is order-independent and the output is all-BIGINT, hash-exact in
    * any engine. The only float step is one ln over a ratio of integers
    * (identical doubles in, ≤1-ulp slack out); the corpus's closest
    * floor-boundary distance is ~4e-5 — eleven orders above that slack —
    * and TrainingDataSpec asserts the margin at every harness SF so a
    * corpus regen fails a named test, not a hash compare.
    *
    * Scale shape: the count tables are vocabulary-sized, orders of
    * magnitude under the corpus; Spark/AQE picks broadcast for them when
    * they fit (the harness case) and falls back to a shuffle join when a
    * web-scale bigram table doesn't. The corpus side is one explode + one
    * join probe + one per-doc aggregate — a single full scan.
    */
  def bigramLmScores(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val uni = docs.select(explode(graft.functions.shingleStrings(col(textCol), 1)).as("t"))
    val c1 = uni.groupBy("t").agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    val bg = docs.select(col(idCol),
      explode(graft.functions.shingleStrings(col(textCol), 2)).as("s"))
    val c2 = bg.groupBy("s").agg(count(lit(1)).as("c2"))
    val scored = bg
      .join(c2, "s")
      .join(c1, substring_index(col("s"), " ", 1) === col("t"))
      .crossJoin(broadcast(v))
      .select(col(idCol),
        floor(-log((col("c2") + lit(1.0)) / (col("c1") + col("v"))) * LmUnat + lit(0.5))
          .as("nll"))
    docs.select(col(idCol))
      .join(scored.groupBy(idCol)
        .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_unats")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_unats"), lit(0L)).as("nll_unats"))
  }

  def bigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLmScores(Tables.documents(spark, dir))

  private val bigramLmSql =
    s"""WITH ws AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |uni AS (SELECT unnest(w) AS t FROM ws),
       |c1 AS (SELECT t, count(*) AS c FROM uni GROUP BY 1),
       |v AS (SELECT count(*) AS v FROM c1),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w), 1)),
       |    i -> w[i] || ' ' || w[i+1])) AS s
       |  FROM ws
       |),
       |c2 AS (SELECT s, count(*) AS c FROM bg GROUP BY 1),
       |scored AS (
       |  SELECT bg.doc_id,
       |    CAST(floor(-ln((c2.c + 1.0) / (c1.c + v.v)) * $LmUnat + 0.5) AS BIGINT) AS nll
       |  FROM bg JOIN c2 ON bg.s = c2.s
       |          JOIN c1 ON split_part(bg.s, ' ', 1) = c1.t
       |          CROSS JOIN v
       |)
       |SELECT ws.doc_id,
       |  CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
       |  CAST(coalesce(agg.nll, 0) AS BIGINT) AS nll_unats
       |FROM ws LEFT JOIN (
       |  SELECT doc_id, count(*) AS n, sum(nll) AS nll FROM scored GROUP BY 1) agg
       |USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Per-group percentile quality gate: keep documents at or above the
    * `keepFrom` percent-rank of a quality score WITHIN their group — the
    * "top quartile per language" style filter that a global threshold
    * can't express (it would empty low-resource groups). One window over
    * the group key; the rank ordering is fully tiebroken (score, then id)
    * so `percent_rank` — (rank−1)/(n−1), an exact small-integer ratio —
    * is engine-identical and the ≥ comparison is deterministic.
    */
  def percentileGate(df: DataFrame, group: Column, score: Column, id: Column,
                     keepFrom: Double): DataFrame = {
    val w = Window.partitionBy(group).orderBy(score.asc, id.asc)
    df.withColumn("kept", (percent_rank().over(w) >= keepFrom).cast("int"))
  }

  /** Gated q50: keep the top token-count quartile per language. */
  def qualityGate(spark: SparkSession, dir: String): DataFrame =
    percentileGate(
      Tables.documents(spark, dir)
        .select(col("lang"), col("doc_id"),
          size(graft.functions.shingleStrings(col("text"), 1)).cast("long").as("n_toks")),
      col("lang"), col("n_toks"), col("doc_id"), keepFrom = 0.75)

  private val qualityGateSql =
    """WITH t AS (
      |  SELECT lang, doc_id,
      |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS n_toks
      |  FROM documents
      |)
      |SELECT lang, doc_id, CAST(n_toks AS BIGINT) AS n_toks,
      |  CAST(percent_rank() OVER (PARTITION BY lang ORDER BY n_toks, doc_id) >= 0.75 AS INT)
      |    AS kept
      |FROM t""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Temperature-flattened domain mixture: sample each domain with quota
    * ∝ n^(1/T) instead of ∝ n — the standard multilingual/multi-domain
    * rebalancing (T = 2 here, so quota = C·√n): small domains keep
    * (nearly) everything, huge domains are subsampled, exactly the knob
    * training mixtures use to stop a dominant crawl from drowning
    * low-resource domains. Members are chosen by md5-of-id rank — the
    * [[stratifiedSample]] discipline — so the sample is reproducible
    * across engines, runs, and partitionings.
    *
    * Exactness: quotas stay per-domain (no cross-domain normalizer, which
    * would be an order-dependent float sum); √ is IEEE-correctly-rounded
    * in every engine and n is an integer, so `floor(C·√n)` is
    * engine-identical. One aggregate + one window — two shuffles total.
    */
  def mixtureQuotas(df: DataFrame, domain: Seq[Column], scale: Double): DataFrame =
    df.groupBy(domain: _*)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("quota", floor(lit(scale) * sqrt(col("n_docs").cast("double"))))

  /** Gated q51: per-(source, lang) domain summary of the T=2 mixture —
    * group sizes 1..16 in the harness corpus, so both regimes (quota ≥ n:
    * keep all; quota < n: flatten) are exercised.
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val quotas = mixtureQuotas(docs, Seq(col("source"), col("lang")), scale = 3.0)
    val ranked = docs.withColumn("rk",
      row_number().over(Window.partitionBy("source", "lang")
        .orderBy(keyHash(col("doc_id")), col("doc_id"))))
    quotas.join(ranked.select(col("source"), col("lang"), col("doc_id"), col("rk")),
        Seq("source", "lang"), "left")
      .groupBy("source", "lang", "n_docs", "quota")
      .agg(count(when(col("rk") <= col("quota"), 1)).as("n_sampled"))
  }

  private val mixtureSampleSql =
    """WITH counts AS (
      |  SELECT source, lang, count(*) AS n_docs FROM documents GROUP BY 1, 2
      |), quota AS (
      |  SELECT source, lang, n_docs,
      |    CAST(floor(3.0 * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS quota
      |  FROM counts
      |), ranked AS (
      |  SELECT source, lang, doc_id,
      |    row_number() OVER (PARTITION BY source, lang
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents
      |)
      |SELECT q.source, q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.quota,
      |  CAST(count(CASE WHEN r.rk <= q.quota THEN 1 END) AS BIGINT) AS n_sampled
      |FROM quota q LEFT JOIN ranked r ON r.source = q.source AND r.lang = q.lang
      |GROUP BY 1, 2, 3, 4""".stripMargin

  // ---------------------------------------------------------------- q210
  /** Exact per-stratum quota selection WITHOUT a per-stratum sort — the
    * 100 TB shape of [[stratifiedSample]]/[[mixtureSample]]'s
    * `row_number() OVER (PARTITION BY stratum)` selection, whose window
    * funnels each stratum into one task (fine when strata are small;
    * a single-task sort of the largest stratum when one domain is 10 TB
    * of a 100 TB corpus).
    *
    * Two passes, selection IDENTICAL to the rank form (proved row-for-row
    * in TrainingDataSpec):
    *
    *  1. Bucket every row by the first 3 hex nibbles of its md5 order
    *     hash (4096 buckets; lowercase-hex LEXICOGRAPHIC order ==
    *     NUMERIC prefix order, so bucket boundaries respect the global
    *     hash order). One hash aggregate → a (strata × ≤4096)-row count
    *     table; a window over THAT table (never the corpus) finds, per
    *     stratum, the boundary bucket where the running count crosses the
    *     quota and the residual quota inside it.
    *  2. Rows in buckets strictly below the boundary are taken outright
    *     via a BROADCAST semi-join of the marker table; only the boundary
    *     bucket's rows (~n/4096 of the stratum) are exactly ranked — the
    *     one remaining per-stratum window sorts 1/4096th of the data.
    *
    * Quota ≥ stratum size ⇒ no boundary bucket exists and every bucket
    * marker says "whole" — the degenerate case costs nothing. No corpus
    * sort, no SinglePartition exchange, every join broadcast: the plan
    * scales with the corpus scan, not with the largest stratum.
    */
  def hashQuotaSample(df: DataFrame, stratum: Seq[String], key: Column,
                      quotas: DataFrame): DataFrame = {
    val (rows, bcounts) = bucketize(df, stratum, key)
    selectByQuota(rows, bcounts.join(quotas, stratum), stratum, key)
  }

  /** [[hashQuotaSample]] where the quota is a LAW over the stratum size
    * (`takeOfN`, e.g. the T=2 temperature `floor(C·√n)`) instead of a
    * caller-supplied table: per-stratum totals fold off the bucket-count
    * aggregate, so the law costs a bucket-table rollup, not a second
    * corpus scan.
    */
  def hashQuotaSampleByLaw(df: DataFrame, stratum: Seq[String], key: Column,
                           takeOfN: Column => Column): DataFrame = {
    val (rows, bcounts) = bucketize(df, stratum, key)
    val quotas = bcounts.groupBy(stratum.map(col): _*)
      .agg(sum("qs_n").as("qs_tot"))
      .withColumn("take", takeOfN(col("qs_tot")))
      .drop("qs_tot")
    selectByQuota(rows, bcounts.join(quotas, stratum), stratum, key)
  }

  private def bucketize(df: DataFrame, stratum: Seq[String],
                        key: Column): (DataFrame, DataFrame) = {
    val rows = df.withColumn("qs_h", keyHash(key))
      .withColumn("qs_b", conv(substring(col("qs_h"), 1, 3), 16, 10).cast("int"))
    val bcounts = rows.groupBy((stratum.map(col) :+ col("qs_b")): _*)
      .agg(count(lit(1)).as("qs_n"))
    (rows, bcounts)
  }

  private def selectByQuota(rows: DataFrame, counts: DataFrame,
                            stratum: Seq[String], key: Column): DataFrame = {
    // Window over the bucket-count table: strata × ≤4096 rows, never the corpus.
    val w = Window.partitionBy(stratum.map(col): _*).orderBy(col("qs_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Materialize the marker table once (strata × ≤4096 rows, KB-scale):
    // it feeds BOTH broadcast joins below, and without the checkpoint the
    // plan expands its corpus-aggregate subtree twice — one extra full
    // scan + shuffle for a table that fits in a driver page.
    val marked = counts
      .withColumn("qs_before", coalesce(sum("qs_n").over(w), lit(0L)))
      .withColumn("qs_kind",
        when(col("qs_before") + col("qs_n") <= col("take"), lit("whole"))
          .when(col("qs_before") < col("take"), lit("boundary")))
      .filter(col("qs_kind").isNotNull)
      .withColumn("qs_residual", col("take") - col("qs_before"))
      .localCheckpoint()
    val joinKeys = stratum :+ "qs_b"
    val whole = rows.join(
      broadcast(marked.filter(col("qs_kind") === "whole").select(joinKeys.map(col): _*)),
      joinKeys, "left_semi")
    val wB = Window.partitionBy(stratum.map(col): _*)
      .orderBy(col("qs_h"), key)
    val boundary = rows.join(
      broadcast(marked.filter(col("qs_kind") === "boundary")
        .select((joinKeys :+ "qs_residual").map(col): _*)),
      joinKeys)
      .withColumn("qs_rk", row_number().over(wB))
      .filter(col("qs_rk") <= col("qs_residual"))
      .drop("qs_residual", "qs_rk")
    whole.unionByName(boundary).drop("qs_h", "qs_b")
  }

  /** Gated q210: the T=2 temperature mixture of q51 re-selected through
    * [[hashQuotaSample]] — per-SOURCE quotas `floor(8·√n)` (source-only
    * strata are the few-big-strata regime where the per-stratum-sort
    * window is at its worst), checksummed per source so any selection
    * drift (one wrong doc) breaks the gate: the md5-rank sample the
    * oracle computes by sorting must be EXACTLY the sample the bucket
    * refinement computes without sorting.
    */
  def bucketQuotaSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    hashQuotaSampleByLaw(docs, Seq("source"), col("doc_id"),
      n => floor(lit(8.0) * sqrt(n.cast("double"))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_taken"),
        sum("doc_id").as("sum_ids"),
        sum("n_chars").as("sum_chars"))
  }

  private val bucketQuotaSampleSql =
    """WITH quota AS (
      |  SELECT source,
      |    CAST(floor(8.0 * sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS take
      |  FROM documents GROUP BY 1
      |), ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents
      |)
      |SELECT r.source, CAST(count(*) AS BIGINT) AS n_taken,
      |  CAST(sum(r.doc_id) AS BIGINT) AS sum_ids,
      |  CAST(sum(r.n_chars) AS BIGINT) AS sum_chars
      |FROM ranked r JOIN quota q ON q.source = r.source
      |WHERE r.rk <= q.take
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q52
  /** RAG-style document chunking: fixed token windows with overlap
    * (window=32, stride=24 → 8-token overlap), the retrieval-prep shape
    * every embedding pipeline runs before indexing. Pure per-row array
    * work — tokenize once, `posexplode` the window starts, `slice` each
    * chunk — so the plan is a single scan with zero shuffles and zero
    * joins; at 100 TB this is embarrassingly parallel map work and the
    * output is ready to repartition by `chunk_hash` for downstream dedup.
    *
    * Chunk identity is `md5(chunk text)` — the same engine-portable hash
    * discipline as [[hashSplit]], so chunk-level dedup/contamination
    * joins are reproducible anywhere. Chunk starts are `0, stride, 2·
    * stride, …` while < n_tokens: every token lands in ≥1 chunk
    * (losslessness), the trailing chunk may be short, and empty docs
    * yield no chunks.
    */
  def chunkDocs(docs: DataFrame, window: Int = 32, stride: Int = 24,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol), graft.functions.shingleStrings(col(textCol), 1).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start")))
      .select(
        col(idCol),
        col("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(window)).as("chunk"))
      .select(
        col(idCol),
        col("chunk_id"),
        size(col("chunk")).as("n_tokens"),
        md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_hash"))
  }

  def docChunks(spark: SparkSession, dir: String): DataFrame =
    chunkDocs(Tables.documents(spark, dir))

  private val docChunksSql =
    """WITH ws AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |), starts AS (
      |  SELECT doc_id, w, unnest(range(0, len(w), 24)) AS start
      |  FROM ws WHERE len(w) > 0
      |), chunks AS (
      |  SELECT doc_id, CAST(start // 24 AS INTEGER) AS chunk_id,
      |    list_slice(w, start + 1, least(start + 32, len(w))) AS chunk
      |  FROM starts
      |)
      |SELECT doc_id, chunk_id, CAST(len(chunk) AS INTEGER) AS n_tokens,
      |  md5(array_to_string(chunk, ' ')) AS chunk_hash
      |FROM chunks""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Hashed-feature space for DSIR: unigram+bigram occurrences bucketed
    * by the first 8 md5 hex digits — both engines parse the same hex, so
    * bucket membership is portable (the q35 keyHash property, extended
    * to a modulus).
    */
  val DsirBuckets = 256

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): keep the raw-corpus documents whose hashed
    * n-gram feature distribution most resembles a small TARGET domain.
    * Bag-of-buckets models with add-one smoothing are fit on both sides
    * — p(b) on target, q(b) on raw — and each raw document scores
    * log w(x) = Σ_features [ln p(b(f)) − ln q(b(f))]; the top `keep` by
    * weight are the resampled set.
    *
    * Exactness design (the q49 contract): the per-bucket log ratio is
    * ONE ln over a ratio of exact integer products —
    * ln[(t_b+1)(R+B) / ((r_b+1)(T+B))] — floored to integer MICRO-NATS,
    * so each document's weight is an order-independent integer sum
    * n_db · lr_b and the output is all-BIGINT, hash-exact in any engine.
    * Selection ranks on that exact integer (ties broken by id), so the
    * resampled set is deterministic across engines, runs, and layouts.
    *
    * Scale shape: ONE pass over the corpus builds the per-(doc, bucket)
    * occurrence aggregate; the bucket models, their totals, and the
    * per-document scores are all derived from that aggregate (the model
    * fit is a 256-row reduction of it, broadcast back — B = 256 buckets
    * ≪ vocabulary is the POINT of hashed DSIR: the model stays
    * machine-sized at 100 TB while a raw n-gram LM would not). Both
    * consumers share the base aggregate's exchange (AQE reuse), the
    * corpus never joins itself, and the top-N is a partial-top-k
    * `orderBy.limit`, never a global sort of the corpus.
    */
  def dsirSelect(docs: DataFrame, isTarget: Column, keep: Int,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val b = lit(DsirBuckets.toLong)
    val base = docs
      .select(col(idCol), isTarget.as("tgt"),
        explode(concat(
          graft.functions.shingleStrings(col(textCol), 1),
          graft.functions.shingleStrings(col(textCol), 2))).as("f"))
      .select(col(idCol), col("tgt"),
        (conv(substring(md5(col("f").cast("binary")), 1, 8), 16, 10)
          .cast("long") % b).as("b"))
      .groupBy(col(idCol), col("tgt"), col("b"))
      .agg(count(lit(1)).as("n_db"))
    val bucket = base.groupBy("b").agg(
      sum(when(col("tgt"), col("n_db")).otherwise(0L)).as("t_b"),
      sum(when(!col("tgt"), col("n_db")).otherwise(0L)).as("r_b"))
    val tot = bucket.agg(sum("t_b").as("t_tot"), sum("r_b").as("r_tot"))
    val lr = spark.range(DsirBuckets).toDF("b")
      .join(broadcast(bucket), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        // Cast each factor BEFORE multiplying (the q77 discipline): the
        // BIGINT product (t_b+1)·(r_tot+B) overflows Long on a ~1e10-
        // feature corpus; double products cannot, and at small magnitudes
        // both orderings are exactly representable, so results are
        // unchanged where the old form was valid.
        floor(log(
          ((coalesce(col("t_b"), lit(0L)) + lit(1L)).cast("double") *
            (col("r_tot") + b).cast("double")) /
          ((coalesce(col("r_b"), lit(0L)) + lit(1L)).cast("double") *
            (col("t_tot") + b).cast("double")))
          * lit(LmUnat) + lit(0.5)).as("lr_unats"))
    base.filter(!col("tgt"))
      .join(broadcast(lr), Seq("b"))
      .groupBy(idCol)
      .agg(sum("n_db").as("n_feats"), sum(col("n_db") * col("lr_unats")).as("w_unats"))
      .orderBy(col("w_unats").desc, col(idCol))
      .limit(keep)
  }

  /** Gated q73: resample the 100 documents most like the `src0` slice
    * (the target-domain proxy), reporting the exact integer weights and
    * the deterministic selection rank. The rank window runs on the
    * already-selected `keep` rows — never a corpus-sized single
    * partition.
    */
  def dsirResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sel = dsirSelect(docs, col("source") === "src0", keep = 100)
      .withColumn("sel_rank",
        row_number().over(Window.orderBy(col("w_unats").desc, col("doc_id"))))
    docs.select(col("doc_id"), col("source"), col("lang"))
      .join(broadcast(sel), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_feats"), col("w_unats"), col("sel_rank"))
  }

  private val dsirResampleSql =
    s"""WITH ws AS (
       |  SELECT doc_id, (source = 'src0') AS tgt,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |feat AS (
       |  SELECT doc_id, tgt, unnest(w) AS f FROM ws
       |  UNION ALL
       |  SELECT doc_id, tgt, unnest(list_transform(range(1, greatest(len(w), 1)),
       |    i -> w[i] || ' ' || w[i+1])) AS f
       |  FROM ws
       |),
       |fb AS (
       |  SELECT doc_id, tgt, ('0x' || substr(md5(f), 1, 8))::BIGINT % $DsirBuckets AS b
       |  FROM feat
       |),
       |tc AS (SELECT b, count(*) AS t_b FROM fb WHERE tgt GROUP BY 1),
       |rc AS (SELECT b, count(*) AS r_b FROM fb WHERE NOT tgt GROUP BY 1),
       |tt AS (SELECT count(*) AS t_tot FROM fb WHERE tgt),
       |rt AS (SELECT count(*) AS r_tot FROM fb WHERE NOT tgt),
       |lr AS (
       |  SELECT bs.b,
       |    CAST(floor(ln(
       |      ((coalesce(tc.t_b, 0) + 1)::DOUBLE * (rt.r_tot + $DsirBuckets)::DOUBLE) /
       |      ((coalesce(rc.r_b, 0) + 1)::DOUBLE * (tt.t_tot + $DsirBuckets)::DOUBLE))
       |      * $LmUnat + 0.5) AS BIGINT) AS lr_unats
       |  FROM (SELECT unnest(range($DsirBuckets)) AS b) bs
       |  LEFT JOIN tc ON bs.b = tc.b LEFT JOIN rc ON bs.b = rc.b
       |  CROSS JOIN tt CROSS JOIN rt
       |),
       |wts AS (
       |  SELECT doc_id, CAST(sum(n_db) AS BIGINT) AS n_feats,
       |    CAST(sum(n_db * lr_unats) AS BIGINT) AS w_unats
       |  FROM (SELECT doc_id, b, count(*) AS n_db FROM fb WHERE NOT tgt GROUP BY 1, 2) db
       |  JOIN lr USING (b) GROUP BY 1
       |),
       |sel AS (
       |  SELECT doc_id, n_feats, w_unats,
       |    CAST(row_number() OVER (ORDER BY w_unats DESC, doc_id) AS INTEGER) AS sel_rank
       |  FROM wts QUALIFY sel_rank <= 100
       |)
       |SELECT d.doc_id, d.source, d.lang, s.n_feats, s.w_unats, s.sel_rank
       |FROM sel s JOIN documents d USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- q80
  /** Linear classifier inference over hashed text features — the
    * fastText-shaped model-based quality filter (Joulin et al. 2016;
    * the CCNet/RefinedWeb-style corpus gate): score(d) = Σ_f w[h(f)]
    * over hashed unigram+bigram features, kept when the length-
    * normalized score clears a threshold.
    *
    * The OPERATOR is the inference plumbing: features hash with the
    * q73 kernel, the weight vector arrives as a (bucket, weight) table
    * and joins BROADCAST (a real model is ≤ millions of rows — always
    * broadcastable), the per-doc score is one hash aggregation. Weights
    * are integer units so logits are exact BIGINT sums; the mean is the
    * integer division logit div n_feats (length-invariant, like
    * fastText's feature averaging).
    *
    * Scale shape: explode → broadcast join → doc-keyed agg; linear in
    * corpus tokens, one shuffle on the doc key, nothing corpus-sized
    * ever sits on one node.
    */
  val ClfBuckets = 1024

  def classifierScore(docs: DataFrame, weights: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val b = lit(ClfBuckets.toLong)
    docs
      .select(col(idCol),
        explode(concat(
          graft.functions.shingleStrings(col(textCol), 1),
          graft.functions.shingleStrings(col(textCol), 2))).as("f"))
      .select(col(idCol),
        (conv(substring(md5(col("f").cast("binary")), 1, 8), 16, 10)
          .cast("long") % b).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n_fb"))
      .join(broadcast(weights), Seq("b"))
      .groupBy(idCol)
      .agg(sum("n_fb").as("n_feats"),
        sum(col("n_fb") * col("weight")).as("logit_units"))
      .withColumn("mean_units", expr("logit_units div n_feats"))
  }

  /** Gated q80: score every document with a deterministic synthetic
    * weight vector (md5-derived, range ±1000 — the stand-in for a
    * trained model table; the inference path is what's under test) and
    * report the exact integer scores plus the keep decision.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val weights = spark.range(ClfBuckets).toDF("b")
      .select(col("b"),
        ((conv(substring(md5(col("b").cast("string").cast("binary")), 1, 8), 16, 10)
          .cast("long") % lit(2001L)) - lit(1000L)).as("weight"))
    classifierScore(Tables.documents(spark, dir), weights)
      .select(col("doc_id"), col("n_feats"), col("logit_units"),
        col("mean_units"), (col("mean_units") > 0).as("kept"))
  }

  private val qualityClassifierSql =
    s"""WITH ws AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |feat AS (
       |  SELECT doc_id, unnest(w) AS f FROM ws
       |  UNION ALL
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w), 1)),
       |    i -> w[i] || ' ' || w[i+1])) AS f
       |  FROM ws
       |),
       |fb AS (
       |  SELECT doc_id, count(*) AS n_fb,
       |    ('0x' || substr(md5(f), 1, 8))::BIGINT % $ClfBuckets AS b
       |  FROM feat GROUP BY doc_id, b
       |),
       |wt AS (
       |  SELECT b, ('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000 AS weight
       |  FROM (SELECT unnest(range($ClfBuckets)) AS b)
       |)
       |SELECT doc_id, CAST(sum(n_fb) AS BIGINT) AS n_feats,
       |  CAST(sum(n_fb * weight) AS BIGINT) AS logit_units,
       |  CAST(sum(n_fb * weight) // sum(n_fb) AS BIGINT) AS mean_units,
       |  (sum(n_fb * weight) // sum(n_fb)) > 0 AS kept
       |FROM fb JOIN wt USING (b)
       |GROUP BY doc_id""".stripMargin

  // --------------------------------------------------------------- q100
  /** Weighted sampling without replacement via PRIORITY SAMPLING
    * (Duffield, Lund & Thorup 2007): each item draws a deterministic
    * 60-bit "uniform" from md5 of its id and gets priority key
    * `hash div weight`; the N smallest keys are the sample. Inclusion
    * probability scales with weight (a doc with 10× the tokens is ~10×
    * as likely in), the scheme is without-replacement by construction,
    * and — unlike exponential-key Efraimidis–Spirtes — the key needs NO
    * floating-point log, so both engines rank the identical integers
    * and the gate is airtight rather than ulp-lucky.
    *
    * Scale shape: key assignment is a map-only projection; the top-N
    * is `orderBy(key).limit(N)` — Spark's partial top-k (per-partition
    * heaps, no global sort, nothing corpus-sized on one node).
    */
  def prioritySample(docs: DataFrame, n: Int, idCol: String = "doc_id",
                     weight: Column): DataFrame = {
    val keyed = docs
      .withColumn("w", greatest(weight.cast("long"), lit(1L)))
      .withColumn("h",
        conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("key", expr("h div w"))
    keyed.orderBy(col("key"), col(idCol)).limit(n)
      .withColumn("sel_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("key"), col(idCol))))
      .select(col("sel_rank"), col(idCol), col("w"), col("key"))
  }

  /** Gated q100: 100 documents priority-sampled ∝ token count. */
  def prioritySampleDocs(spark: SparkSession, dir: String): DataFrame =
    prioritySample(graft.core.Tables.documents(spark, dir), 100,
      weight = size(graft.functions.shingleStrings(col("text"), 1)))

  private val prioritySampleSql =
    """WITH tw AS (
      |  SELECT doc_id,
      |    greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x <> '')), 1) AS w
      |  FROM documents
      |),
      |ks AS (
      |  SELECT doc_id, CAST(w AS BIGINT) AS w,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT // w AS key
      |  FROM tw
      |)
      |SELECT CAST(row_number() OVER (ORDER BY key, doc_id) AS INTEGER) AS sel_rank,
      |  doc_id, w, key
      |FROM ks ORDER BY key, doc_id LIMIT 100""".stripMargin

  // --------------------------------------------------------------- q129
  /** Cross-split near-dup leakage audit — the check that closes the gap
    * q36 (verbatim contamination) and q45 (n-gram decontamination) leave
    * open: a train doc that is a NEAR-duplicate of a val/test doc leaks
    * the eval answer into training even though no fingerprint or 8-gram
    * matches verbatim. Near-dup pairs come from the q17 kernel
    * ([[Dedup.minHashNearDups]], exact shingle-Jaccard ≥ 0.7 verified on
    * LSH candidates); split assignment is the per-row [[hashSplit]].
    *
    * Output: one row per observed (split_lo, split_hi) label pair
    * (alphabetical order, so same-split rows read e.g. train/train) with
    * the pair count and the distinct docs touched on each side — the
    * numbers a release gate thresholds on (cross-split rows must be
    * purged or re-split before training).
    *
    * Scale shape: the pair space is LSH-banded (never n²), split labels
    * are per-row projections joined onto pair endpoints by doc id, and
    * the final aggregate has at most 6 groups. Work beyond q17 itself is
    * two doc-keyed equi-joins + a tiny agg.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame =
    splitLeakage(Tables.documents(spark, dir))

  def splitLeakage(docs: DataFrame): DataFrame = {
    val pairs = Dedup.minHashNearDups(docs, threshold = 0.7, maxBucketSize = None)
      .select("a_id", "b_id")
    val sp = docs.select(col("doc_id"), hashSplit(col("doc_id")).as("sp"))
    val ps = pairs
      .join(sp.select(col("doc_id").as("a_id"), col("sp").as("sa")), "a_id")
      .join(sp.select(col("doc_id").as("b_id"), col("sp").as("sb")), "b_id")
      .withColumn("split_lo", least(col("sa"), col("sb")))
      .withColumn("split_hi", greatest(col("sa"), col("sb")))
    // Explode each pair into its two endpoints so n_pairs and both
    // per-side distinct-doc counts ride ONE aggregate over one evaluation
    // of the (expensive) LSH pair DAG — separate counts/ends/dlo/dhi
    // branches would replicate that DAG 4×.
    ps.select(col("split_lo"), col("split_hi"), col("a_id"), col("b_id"),
        explode(array(
          struct(col("sa").as("dsp"), col("a_id").as("doc")),
          struct(col("sb").as("dsp"), col("b_id").as("doc")))).as("e"))
      .select(col("split_lo"), col("split_hi"), col("a_id"), col("b_id"),
        col("e.dsp").as("dsp"), col("e.doc").as("doc"))
      .groupBy("split_lo", "split_hi")
      .agg(
        countDistinct(col("a_id"), col("b_id")).as("n_pairs"),
        countDistinct(when(col("dsp") === col("split_lo"), col("doc")))
          .as("n_docs_lo"),
        countDistinct(when(col("dsp") === col("split_hi"), col("doc")))
          .as("n_docs_hi"))
  }

  private lazy val splitLeakageSql = {
    val splitCase =
      """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) BETWEEN '0' AND 'b' THEN 'train'
        |     WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('c','d') THEN 'val'
        |     ELSE 'test' END""".stripMargin
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |), ${Dedup.exactPairCtes(0.7)},
       |sp AS (
       |  SELECT doc_id, $splitCase AS sp FROM documents
       |), ps AS (
       |  SELECT p.a_id, p.b_id, sa.sp AS sa, sb.sp AS sb,
       |    least(sa.sp, sb.sp) AS split_lo, greatest(sa.sp, sb.sp) AS split_hi
       |  FROM pairs p
       |  JOIN sp sa ON sa.doc_id = p.a_id
       |  JOIN sp sb ON sb.doc_id = p.b_id
       |), ends AS (
       |  SELECT split_lo, split_hi, sa AS dsp, a_id AS doc FROM ps
       |  UNION ALL
       |  SELECT split_lo, split_hi, sb AS dsp, b_id AS doc FROM ps
       |)
       |SELECT c.split_lo, c.split_hi, CAST(c.n_pairs AS BIGINT) AS n_pairs,
       |  CAST(lo.n AS BIGINT) AS n_docs_lo, CAST(hi.n AS BIGINT) AS n_docs_hi
       |FROM (SELECT split_lo, split_hi, count(*) AS n_pairs FROM ps GROUP BY 1, 2) c
       |JOIN (SELECT split_lo, split_hi, count(DISTINCT doc) AS n FROM ends
       |      WHERE dsp = split_lo GROUP BY 1, 2) lo USING (split_lo, split_hi)
       |JOIN (SELECT split_lo, split_hi, count(DISTINCT doc) AS n FROM ends
       |      WHERE dsp = split_hi GROUP BY 1, 2) hi USING (split_lo, split_hi)""".stripMargin
  }

  // --------------------------------------------------------------- q131
  /** Purged temporal holdout with an embargo gap (the time-series split
    * discipline of López de Prado's "Advances in Financial ML", ch.7,
    * applied to pipeline data): the trailing `holdoutDays` of order dates
    * are eval, the `embargoDays` before the boundary are PURGED — rows
    * whose effects straddle the boundary (an order placed just before it
    * ships/settles inside eval) would otherwise leak future state into
    * training. Hash splits (q35) cannot give this property: temporal
    * leakage is about adjacency in time, not identity.
    *
    * Everything is integer day arithmetic off the corpus max date, so the
    * split is deterministic and re-derivable on any engine. One scan +
    * one 3-group aggregate; the max-date scalar broadcasts.
    */
  def embargoSplit(spark: SparkSession, dir: String,
                   holdoutDays: Int = 60, embargoDays: Int = 7): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_totalprice"), to_date(col("o_orderdate")).as("d"))
    val mx = o.agg(max(col("d")).as("mxd"))
    o.crossJoin(broadcast(mx))
      .withColumn("days_back", datediff(col("mxd"), col("d")))
      .withColumn("bucket",
        when(col("days_back") < holdoutDays, "eval")
          .when(col("days_back") < holdoutDays + embargoDays, "embargo")
          .otherwise("train"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_cents"),
        min(col("d")).as("d_min"),
        max(col("d")).as("d_max"))
  }

  private val embargoSplitSql =
    """WITH o AS (
      |  SELECT o_totalprice, o_orderdate::DATE AS d FROM orders
      |), mx AS (
      |  SELECT max(d) AS mxd FROM o
      |)
      |SELECT CASE WHEN date_diff('day', d, mxd) < 60 THEN 'eval'
      |            WHEN date_diff('day', d, mxd) < 67 THEN 'embargo'
      |            ELSE 'train' END AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents,
      |  min(d) AS d_min, max(d) AS d_max
      |FROM o, mx GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q160
  /** In-warehouse LOGISTIC-REGRESSION TRAINING by iteratively reweighted
    * least squares — the missing half of q80 (which scores with a model
    * someone else trained): fit the quality/language gate's weights ON
    * the warehouse, with the corpus never leaving the cluster. Each
    * Newton iteration is ONE scan producing the d-vector gradient
    * Xᵀ(y−p), the d×d Hessian XᵀWX (upper triangle, d(d+1)/2 sums), and
    * the current deviance — all partial-aggregable, so an iteration
    * costs a map-side-combined aggregate whose shuffle is partitions ×
    * O(d²) rows regardless of corpus size (the q118 sufficient-stats
    * discipline, with W re-derived per round). The driver solves the
    * d×d Newton system (Gaussian elimination on KBs) and, if the step
    * overshoots, halves it until deviance improves (step-halving makes
    * the deviance sequence monotone by construction — the gated
    * invariant).
    *
    * Features are deterministic integer-derived per-row expressions
    * (char/byte ratios, token stats, stopword share). The LABEL is a
    * planted noisy linear teacher — `2·n_tokens + 3·u > 130` with u the
    * doc's first md5 nibble (deterministic 0–15 noise) — the fixture
    * discipline every planted gate here uses, because the synthetic
    * corpus's `lang` column carries no learnable signal (all languages
    * draw from one shared vocabulary, measured). The teacher is noisy,
    * not separable (mid-range token counts flip on u), so the fit stays
    * finite and the trainer must genuinely recover the token-count
    * signal to clear the accuracy gate.
    */
  final case class LogisticFit(coefficients: Array[Double],
                               deviances: Seq[Double],
                               gradInfNorm: Double,
                               n: Long, nPos: Long, nCorrect: Long)

  def logisticFeatures(docs: DataFrame): DataFrame = {
    val nTok = size(TextAnalysis.tokens(col("text")))
    val noise = conv(substring(keyHash(col("doc_id")), 1, 1), 16, 10).cast("int")
    docs.select(
      col("doc_id"),
      (nTok * 2 + noise * 3 > 130).cast("int").cast("double").as("y"),
      lit(1.0).as("x0"),
      (col("n_chars").cast("double") / 1000.0).as("x1"),
      (size(TextAnalysis.tokens(col("text"))).cast("double") / 100.0).as("x2"),
      (length(col("text")).cast("double") /
        octet_length(col("text")).cast("double")).as("x3"),
      (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
        greatest(length(col("text")), lit(1)).cast("double")).as("x4"),
      // English-stopword token share — the signal that separates en from
      // the OTHER Latin-script languages (byte ratios only catch CJK).
      (expr("size(filter(split(text, ' '), t -> t IN ('the','and','of'," +
        "'to','in','is','a','for','that','with','as','on','by','it','be')))")
        .cast("double") /
        greatest(size(TextAnalysis.tokens(col("text"))), lit(1)).cast("double"))
        .as("x5"))
  }

  def logisticTrain(feat: DataFrame, featureCols: Seq[String],
                    iters: Int = 8): LogisticFit = {
    val d = featureCols.length
    val xs = featureCols.map(col)
    var beta = Array.fill(d)(0.0)
    val deviances = scala.collection.mutable.ArrayBuffer[Double]()
    var lastGrad = Array.fill(d)(0.0)

    def eta: Column = xs.zip(beta).map { case (x, b) => x * lit(b) }
      .reduce(_ + _)
    // p = sigmoid(eta), clamped away from 0/1 so deviance stays finite.
    def pCol: Column = {
      val p = lit(1.0) / (lit(1.0) + exp(-eta))
      least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
    }

    def scan(): (Array[Double], Array[Array[Double]], Double) = {
      val p = pCol
      val w = p * (lit(1.0) - p)
      val gradAggs = xs.zipWithIndex.map { case (x, i) =>
        sum(x * (col("y") - p)).as(s"g_$i") }
      val hessAggs = for {
        i <- 0 until d; j <- i until d
      } yield sum(xs(i) * xs(j) * w).as(s"h_${i}_$j")
      val devAgg = sum(
        lit(-2.0) * (col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p)))
        .as("dev")
      val row = feat.agg(devAgg, (gradAggs ++ hessAggs): _*).head()
      val g = Array.tabulate(d)(i => row.getAs[Double](s"g_$i"))
      val h = Array.fill(d, d)(0.0)
      for (i <- 0 until d; j <- i until d) {
        h(i)(j) = row.getAs[Double](s"h_${i}_$j"); h(j)(i) = h(i)(j)
      }
      (g, h, row.getAs[Double]("dev"))
    }

    def solve(h: Array[Array[Double]], g: Array[Double]): Array[Double] = {
      // Gaussian elimination with partial pivoting + a tiny ridge so a
      // (near-)singular Hessian degrades to a damped step, not a crash.
      val a = h.map(_.clone())
      for (i <- 0 until d) a(i)(i) += 1e-9
      val b = g.clone()
      for (k <- 0 until d) {
        val piv = (k until d).maxBy(r => math.abs(a(r)(k)))
        val (tr, tb) = (a(k), b(k)); a(k) = a(piv); b(k) = b(piv)
        a(piv) = tr; b(piv) = tb
        for (r <- k + 1 until d) {
          val f = a(r)(k) / a(k)(k)
          for (c <- k until d) a(r)(c) -= f * a(k)(c)
          b(r) -= f * b(k)
        }
      }
      val x = Array.fill(d)(0.0)
      for (k <- d - 1 to 0 by -1) {
        var s = b(k)
        for (c <- k + 1 until d) s -= a(k)(c) * x(c)
        x(k) = s / a(k)(k)
      }
      x
    }

    var (g0, h0, dev0) = scan()
    deviances += dev0
    lastGrad = g0
    (0 until iters).foreach { _ =>
      val step = solve(h0, g0)
      var scale = 1.0
      var tries = 0
      var accepted = false
      while (!accepted && tries < 12) {
        val trial = Array.tabulate(d)(i => beta(i) + scale * step(i))
        val saved = beta
        beta = trial
        val (g1, h1, dev1) = scan()
        if (dev1 <= deviances.last) {
          deviances += dev1; g0 = g1; h0 = h1; lastGrad = g1; accepted = true
        } else { beta = saved; scale /= 2; tries += 1 }
      }
      if (!accepted) deviances += deviances.last // converged: flat step
    }

    val acc = feat.agg(
      count(lit(1)).as("n"),
      sum(col("y")).as("np"),
      sum(when((pCol >= 0.5).cast("int").cast("double") === col("y"), 1L)
        .otherwise(0L)).as("nc")).head()
    LogisticFit(beta, deviances.toSeq, lastGrad.map(math.abs).max,
      acc.getAs[Long]("n"), acc.getAs[Double]("np").toLong, acc.getAs[Long]("nc"))
  }

  /** Gated q160 (the q154/q70 invariant pattern — the oracle pins the
    * exact integers it can recompute and all-TRUE booleans Spark must
    * earn): per Newton iteration, deviance monotonically non-increasing;
    * on the final row, gradient ~0 (stationarity), real learning
    * (accuracy beats the majority class by ≥10 points), and the exact
    * corpus/positive counts DuckDB verifies directly.
    */
  def logisticTrainGate(spark: SparkSession, dir: String): DataFrame = {
    val feat = logisticFeatures(Tables.documents(spark, dir))
      .localCheckpoint(true) // 8+ scans ride the materialized features
    val fit = logisticTrain(feat, Seq("x0", "x1", "x2", "x3", "x4", "x5"))
    val majority = math.max(fit.nPos, fit.n - fit.nPos)
    val rows = fit.deviances.zipWithIndex.map { case (dev, i) =>
      val isLast = i == fit.deviances.length - 1
      (i.toLong, fit.n, fit.nPos,
        i == 0 || dev <= fit.deviances(i - 1) + 1e-9,
        !isLast || fit.gradInfNorm < 1e-3 * fit.n,
        !isLast || fit.nCorrect * 100L >= majority * 100L + fit.n * 10L)
    }
    import spark.implicits._
    rows.toDF("iter", "n", "n_pos", "deviance_monotone_ok",
      "stationary_ok", "beats_majority_ok")
  }

  private val logisticTrainSql =
    """SELECT CAST(i AS BIGINT) AS iter,
      |  (SELECT count(*) FROM documents) AS n,
      |  (SELECT count(*) FROM (
      |     SELECT len(list_filter(str_split(text, ' '), w -> len(w) > 0)) * 2
      |       + (CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |            WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2
      |            WHEN '3' THEN 3 WHEN '4' THEN 4 WHEN '5' THEN 5
      |            WHEN '6' THEN 6 WHEN '7' THEN 7 WHEN '8' THEN 8
      |            WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
      |            WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14
      |            ELSE 15 END) * 3 AS s
      |     FROM documents) WHERE s > 130) AS n_pos,
      |  TRUE AS deviance_monotone_ok, TRUE AS stationary_ok,
      |  TRUE AS beats_majority_ok
      |FROM (SELECT unnest(range(0, 9)) AS i)""".stripMargin

  // --------------------------------------------------------------- q162
  /** Split-conformal calibration per group — the distribution-free
    * prediction-interval discipline (Vovk et al.; Angelopoulos & Bates
    * 2021 tutorial): on a held-out CALIBRATION split, take the
    * ⌈(n+1)(1−α)⌉-th smallest nonconformity score as the group's
    * threshold; on the EVAL split, coverage (score ≤ threshold) is then
    * guaranteed ≥ 1−α in expectation regardless of the score's
    * distribution. Run per language so one threshold never silently
    * means different things across slices (the q138 lesson).
    *
    * Everything is exact: the score is an integer (n_chars), the
    * threshold an exact order statistic via one rank window (rank =
    * ceil-free integer compare against ⌈(n+1)·0.9⌉ computed as
    * (n+1)·9 div 10 + sign correction — here (n+1)*9 div 10 suffices
    * since ⌈x⌉ over tenths is (9(n+1)+9) div 10... both engines run the
    * IDENTICAL integer formula), and coverage is an integer count with
    * a ppm quotient. Splits are the deterministic md5 hash-splits of
    * q35, so the gate is reproducible anywhere.
    */
  def conformalCalibration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        hashSplit(col("doc_id")).as("split"))
    val cal = docs.filter(col("split") === "val")
    val eval = docs.filter(col("split") === "test")
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    val ranked = cal.withColumn("rk", row_number().over(w))
    val nCal = cal.groupBy("lang").agg(count(lit(1)).as("n_cal"))
    // target rank = ceil(0.9·(n+1)) = (9·(n+1) + 9) div 10, capped at n.
    val thresholds = ranked.join(nCal, "lang")
      .filter(col("rk") === expr("least(((n_cal + 1) * 9 + 9) div 10, n_cal)"))
      .select(col("lang"), col("n_cal"), col("n_chars").as("threshold"))
    eval.join(thresholds, "lang")
      .groupBy(col("lang"), col("n_cal"), col("threshold"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("n_chars") <= col("threshold"), 1L).otherwise(0L))
          .as("n_covered"))
      .withColumn("coverage_ppm", expr("(1000000 * n_covered) div n_eval"))
  }

  private val conformalCalibrationSql =
    """WITH d AS (
      |  SELECT doc_id, lang, n_chars,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) BETWEEN '0' AND 'b' THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('c','d') THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents
      |), cal AS (
      |  SELECT lang, n_chars, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY lang) AS n_cal
      |  FROM d WHERE split = 'val'
      |), thr AS (
      |  SELECT lang, n_cal, n_chars AS threshold FROM cal
      |  WHERE rk = least(((n_cal + 1) * 9 + 9) // 10, n_cal)
      |)
      |SELECT e.lang, t.n_cal, t.threshold, count(*) AS n_eval,
      |  CAST(sum(CASE WHEN e.n_chars <= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_covered,
      |  CAST((1000000 * sum(CASE WHEN e.n_chars <= t.threshold THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS coverage_ppm
      |FROM d e JOIN thr t USING (lang)
      |WHERE e.split = 'test'
      |GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------- q181
  /** Group k-fold assignment — cross-validation splits with GROUP
    * integrity: every document of the same group (here source/lang — in
    * real corpora a domain, author, or dedup cluster) lands in the same
    * fold, because hashing the GROUP key rather than the row key is what
    * prevents near-duplicate leakage across folds (the q129 lesson at
    * split-assignment time, and the grouped complement of q35's per-row
    * split). Fold = md5(group) mod k — stable under corpus growth: new
    * rows of a known group join its fold, no reshuffling of past folds.
    *
    * Output: per-fold doc/char totals plus the distinct-group count —
    * the balance report a pipeline checks before training k models.
    *
    * Scale shape: one scan, one hash aggregate; the group key is a
    * per-row projection (no join needed to assign folds).
    */
  def groupKFold(docs: DataFrame, groupCol: Column, k: Int): DataFrame =
    docs
      .withColumn("grp", groupCol)
      .withColumn("fold",
        conv(substring(md5(concat(lit("fold:"), col("grp")).cast("binary")),
          1, 8), 16, 10).cast("long") % lit(k.toLong))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        countDistinct("grp").as("n_groups"))

  /** Gated q181: 5-fold group split of documents by (source, lang). */
  def groupKFoldSummary(spark: SparkSession, dir: String): DataFrame =
    groupKFold(Tables.documents(spark, dir),
      concat(col("source"), lit("/"), col("lang")), 5)
      .select(col("fold"), col("n_docs"), col("total_chars"), col("n_groups"))

  private val groupKFoldSql =
    """SELECT
      |  ('0x' || substr(md5('fold:' || source || '/' || lang), 1, 8))::BIGINT
      |    % 5 AS fold,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(count(DISTINCT source || '/' || lang) AS BIGINT) AS n_groups
      |FROM documents GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q182
  /** Span-corruption masking statistics — the T5/BERT-style preprocessing
    * audit: mask each token position with probability ~15% from a
    * deterministic per-(doc, position) hash channel and report, per doc,
    * how many tokens were masked and how many CONTIGUOUS SPANS the masks
    * form (span count drives sentinel-token budget and effective sequence
    * length in denoising training). The span count needs no window: a
    * position starts a span iff it is masked and position−1 is not, and
    * both flags are pure hash expressions of (doc_id, pos) — the
    * adjacency logic is stateless, so the whole operator is one explode
    * + one doc-keyed aggregate.
    *
    * Scale shape: corpus-linear in tokens, one shuffle on doc_id (the
    * aggregate); masking decisions never materialize per-token state.
    */
  def spanCorruptionStats(docs: DataFrame, maskPct: Int = 15): DataFrame = {
    def maskedAt(pos: Column): Column =
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        pos.cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long") % 100L < lit(maskPct.toLong)
    docs
      .select(col("doc_id"),
        size(graft.functions.shingleStrings(col("text"), 1)).cast("long")
          .as("n_tokens"))
      // Token-less docs are excluded on BOTH engines (Spark's sequence()
      // would otherwise DESCEND for start > stop and fabricate positions).
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(1), col("n_tokens"))).as("pos"))
      .withColumn("m", maskedAt(col("pos")))
      .withColumn("span_start",
        col("m") && (col("pos") === 1 || !maskedAt(col("pos") - 1)))
      .groupBy("doc_id")
      .agg(max("n_tokens").as("n_tokens"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("span_start"), 1L).otherwise(0L)).as("n_spans"))
      .withColumn("corruption_ppm",
        expr("(1000000 * n_masked) div n_tokens"))
  }

  /** Gated q182: 15% span-corruption plan over the documents corpus. */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame =
    spanCorruptionStats(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_tokens"), col("n_masked"),
        col("n_spans"), col("corruption_ppm"))

  private val spanCorruptionSql =
    """WITH ws AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(lower(text), '\s+'),
      |        x -> x <> '')) AS n_tokens
      |  FROM documents
      |),
      |pos AS (
      |  SELECT doc_id, n_tokens, unnest(range(1, n_tokens + 1)) AS pos
      |  FROM ws WHERE n_tokens > 0
      |),
      |flags AS (
      |  SELECT doc_id, n_tokens, pos,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(pos AS VARCHAR)), 1, 8))::BIGINT % 100 < 15 AS m,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(pos - 1 AS VARCHAR)), 1, 8))::BIGINT % 100 < 15 AS m_prev
      |  FROM pos
      |)
      |SELECT doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
      |  CAST(sum(CASE WHEN m AND (pos = 1 OR NOT m_prev) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_spans,
      |  CAST((1000000 * sum(CASE WHEN m THEN 1 ELSE 0 END)) // max(n_tokens)
      |    AS BIGINT) AS corruption_ppm
      |FROM flags GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q200
  /** Curation funnel — the flagship composite: the per-source survivor
    * counts after each stage of a standard LLM-corpus curation pass,
    * chaining three gated kernels end to end:
    *   S1  exact dedup, keep-first (the q15 fingerprint group-by);
    *   S2  quality floor — top token-count quartile PER LANGUAGE,
    *       computed ON the dedup survivors (the q50 percentile gate;
    *       running it post-dedup is the order real pipelines use, so
    *       duplicate mass cannot distort the quantile);
    *   S3  outlier cap — n_chars ≤ 3000 (the degenerate-document
    *       guard).
    * One row per source with n0..n3 and the end-to-end retention in
    * exact ppm — the report a data lead reads before a training run.
    *
    * Scale shape: one fingerprint shuffle (S1), one per-language window
    * over survivors (S2), then a projection filter (S3) and a
    * sources-sized rollup. Every stage is the already-audited kernel
    * plan; the funnel adds one aggregate.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        col("text"))
    val s1 = docs
      .withColumn("fp", graft.analytics.TextAnalysis.fingerprint(col("text")))
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keep_id"))
    val s2 = percentileGate(
      s1.withColumn("n_toks",
        size(graft.functions.shingleStrings(col("text"), 1)).cast("long")),
      col("lang"), col("n_toks"), col("doc_id"), keepFrom = 0.75)
      .filter(col("kept") === 1)
    val s3 = s2.filter(col("n_chars") <= 3000)
    def cnt(df: DataFrame, name: String) =
      df.groupBy("source").agg(count(lit(1)).as(name))
    cnt(docs, "n0")
      .join(cnt(s1, "n1"), Seq("source"), "left")
      .join(cnt(s2, "n2"), Seq("source"), "left")
      .join(cnt(s3, "n3"), Seq("source"), "left")
      .select(col("source"), col("n0"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("n3"), lit(0L)).as("n3"))
      .withColumn("retention_ppm", expr("(1000000 * n3) div n0"))
  }

  private val curationFunnelSql =
    """WITH docs AS (
      |  SELECT doc_id, source, lang, n_chars, text,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents
      |),
      |s1 AS (
      |  SELECT * FROM (
      |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM docs)
      |  WHERE doc_id = keep_id
      |),
      |s2 AS (
      |  SELECT * FROM (
      |    SELECT *,
      |      percent_rank() OVER (PARTITION BY lang ORDER BY
      |        len(list_filter(string_split_regex(lower(text), '\s+'),
      |            x -> x <> '')), doc_id) AS pr
      |    FROM s1)
      |  WHERE pr >= 0.75
      |),
      |s3 AS (SELECT * FROM s2 WHERE n_chars <= 3000)
      |SELECT d.source, count(DISTINCT d.doc_id) AS n0,
      |  CAST(count(DISTINCT s1.doc_id) AS BIGINT) AS n1,
      |  CAST(count(DISTINCT s2.doc_id) AS BIGINT) AS n2,
      |  CAST(count(DISTINCT s3.doc_id) AS BIGINT) AS n3,
      |  CAST((1000000 * count(DISTINCT s3.doc_id)) // count(DISTINCT d.doc_id)
      |    AS BIGINT) AS retention_ppm
      |FROM docs d
      |LEFT JOIN s1 ON s1.doc_id = d.doc_id
      |LEFT JOIN s2 ON s2.doc_id = d.doc_id
      |LEFT JOIN s3 ON s3.doc_id = d.doc_id
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- q216
  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * sampling recipe (the XLM-R / mT5 α-smoothing): sampling sources
    * proportional to size lets the biggest source drown the tail, while
    * uniform sampling overfits tiny sources; w_i ∝ p_i^α with α < 1
    * interpolates, up-sampling the tail by a bounded factor. This is the
    * table a data lead signs off before a training run: natural token
    * share p, smoothed weight w (α = 0.7), and the per-source up/down-
    * sampling factor w/p it implies.
    *
    * Exactness: token counts are exact BIGINT (the q200 whitespace
    * tokenizer); p_ppm is the exact truncating share. The irrational
    * power rides the ONE-fixed-double-sequence discipline — p_i^α is
    * computed as exp(α·ln(toks)) (the q175 exp∘ln composition both
    * engines evaluate identically), floored to an integer ONCE per
    * source — and every cross-source reduction after that floor is an
    * integer sum, so no float ever crosses an order-dependent reduce.
    * boost_ppm derives from the already-floored integers (documented
    * ±1-ppm truncation convention, the q197 precedent).
    *
    * Scale shape: one corpus scan → per-source hash aggregate (fully
    * partial; the token counter is a projection inside the scan) →
    * whole-frame window sums over the SOURCES frame (bounded by source
    * cardinality, never the corpus).
    */
  def mixtureWeights(docs: DataFrame, sourceCol: String, toksCol: String,
                     alphaTenths: Int = 7): DataFrame = {
    val alpha = lit(alphaTenths.toDouble / 10.0)
    val wAll = Window.partitionBy()
    docs
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(toksCol)).as("n_toks"))
      .withColumn("pow_micro",
        when(col("n_toks") > 0, floor(
          exp(alpha * log(col("n_toks").cast("double"))) * lit(1000000.0)
            + lit(0.5)).cast("long")).otherwise(0L))
      .withColumn("tot_toks", sum("n_toks").over(wAll))
      .withColumn("tot_pow", sum("pow_micro").over(wAll))
      // 1e6·n_toks crosses 2⁶³ once a source holds ~9.2·10¹² tokens —
      // inside 100 TB reach — so the share numerators ride DECIMAL(38,0)
      // (DuckDB's window sum() is already HUGEINT there); the q217
      // precedent, on a sources-sized frame.
      .withColumn("p_ppm", expr(
        "CAST((CAST(n_toks AS DECIMAL(38,0)) * 1000000) div tot_toks AS BIGINT)"))
      .withColumn("w_ppm", expr(
        "CAST((CAST(pow_micro AS DECIMAL(38,0)) * 1000000) div tot_pow AS BIGINT)"))
      .withColumn("boost_ppm",
        when(col("p_ppm") > 0, expr("(1000000 * w_ppm) div p_ppm")))
      .drop("tot_toks", "tot_pow")
  }

  /** Gated q216: α = 0.7 mixture table over the documents corpus. */
  def sourceMixtureWeights(spark: SparkSession, dir: String): DataFrame =
    mixtureWeights(
      Tables.documents(spark, dir).select(col("source"),
        size(graft.functions.shingleStrings(col("text"), 1)).cast("long")
          .as("n_toks")),
      "source", "n_toks")

  private val mixtureWeightsSql =
    """WITH per AS (
      |  SELECT source,
      |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |      x -> x <> '')) AS BIGINT) AS toks
      |  FROM documents
      |),
      |s AS (
      |  SELECT source, count(*) AS n_docs, sum(toks) AS n_toks
      |  FROM per GROUP BY 1
      |),
      |p AS (
      |  SELECT source, n_docs, n_toks,
      |    CASE WHEN n_toks > 0 THEN CAST(floor(
      |      exp(0.7::DOUBLE * ln(n_toks::DOUBLE)) * 1000000.0::DOUBLE
      |        + 0.5::DOUBLE) AS BIGINT) ELSE 0 END AS pow_micro
      |  FROM s
      |),
      |t AS (
      |  SELECT *, sum(n_toks) OVER () AS tot_toks,
      |    sum(pow_micro) OVER () AS tot_pow
      |  FROM p
      |)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_toks AS BIGINT) AS n_toks,
      |  CAST(pow_micro AS BIGINT) AS pow_micro,
      |  CAST((1000000 * n_toks) // tot_toks AS BIGINT) AS p_ppm,
      |  CAST((1000000 * pow_micro) // tot_pow AS BIGINT) AS w_ppm,
      |  CASE WHEN (1000000 * n_toks) // tot_toks > 0 THEN
      |    CAST((1000000 * ((1000000 * pow_micro) // tot_pow))
      |      // ((1000000 * n_toks) // tot_toks) AS BIGINT) END AS boost_ppm
      |FROM t""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q216_mixture_weights", sourceMixtureWeights _,
      Some(mixtureWeightsSql)),
    NamedQuery("q200_curation_funnel", curationFunnel _,
      Some(curationFunnelSql)),
    NamedQuery("q181_group_kfold", groupKFoldSummary _, Some(groupKFoldSql)),
    NamedQuery("q182_span_corruption", spanCorruption _,
      Some(spanCorruptionSql)),
    NamedQuery("q162_conformal_calibration", conformalCalibration _,
      Some(conformalCalibrationSql)),
    NamedQuery("q160_logistic_train", logisticTrainGate _,
      Some(logisticTrainSql)),
    NamedQuery("q131_embargo_split", (s, d) => embargoSplit(s, d),
      Some(embargoSplitSql)),
    NamedQuery("q129_split_leakage", splitLeakage _, Some(splitLeakageSql)),
    NamedQuery("q100_priority_sample", prioritySampleDocs _, Some(prioritySampleSql)),
    NamedQuery("q35_hash_split", hashSplitSummary _, Some(hashSplitSql)),
    NamedQuery("q36_contamination", contaminationCheck _, Some(contaminationSql)),
    NamedQuery("q37_stratified_sample", stratifiedSampleByLang _, Some(stratifiedSampleSql)),
    NamedQuery("q38_top_tokens", topTokensPerLang _, Some(topTokensSql)),
    NamedQuery("q39_sequence_packing", (s, d) => packSequences(s, d), Some(packSequencesSql)),
    NamedQuery("q40_pii_scrub", piiScrub _, Some(piiScrubSql)),
    NamedQuery("q45_ngram_decontamination", ngramDecontamination _, Some(ngramDecontaminationSql)),
    NamedQuery("q233_substring_decontamination", substringDecontamination _,
      Some(substringDecontaminationSql)),
    NamedQuery("q237_self_substring_dedup", selfSubstringDedupDocs _,
      Some(selfSubstringDedupSql)),
    NamedQuery("q240_self_substring_remove", selfSubstringRemoveDocs _,
      Some(selfSubstringRemoveSql)),
    NamedQuery("q49_bigram_lm", bigramLm _, Some(bigramLmSql)),
    NamedQuery("q50_quality_gate", qualityGate _, Some(qualityGateSql)),
    NamedQuery("q51_mixture_sample", mixtureSample _, Some(mixtureSampleSql)),
    NamedQuery("q210_bucket_quota_sample", bucketQuotaSample _,
      Some(bucketQuotaSampleSql)),
    NamedQuery("q52_doc_chunks", (s, d) => docChunks(s, d), Some(docChunksSql)),
    NamedQuery("q73_dsir_resample", dsirResample _, Some(dsirResampleSql)),
    NamedQuery("q80_quality_classifier", qualityClassifier _, Some(qualityClassifierSql)))
}
