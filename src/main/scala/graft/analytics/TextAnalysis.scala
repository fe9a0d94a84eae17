package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Text-corpus analysis for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting, exact
  * deduplication, and n-gram Jaccard similarity — all pure Column
  * expressions (whole-stage codegen, no UDFs), all single-shuffle hash
  * aggregates. At 100 TB these run as map-side work + one exchange each.
  */
object TextAnalysis {

  /** q137 checkpoint width (docs per vocabulary-growth checkpoint).
    * Declared ahead of the `queries` Seq: the oracle SQL interpolates it
    * at init time (object vals initialize in declaration order).
    */
  val CkptDocs = 50

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Distinct token set (unigram shingles). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Distinct word n-gram shingle set. n = 1 degrades to [[tokenSet]].
    * For near-dup detection n ≥ 3 is the robust choice: sequences are far
    * more discriminative than bags, so LSH buckets stay small even on
    * low-vocabulary corpora.
    */
  def shingleSet(text: Column, n: Int): Column =
    if (n <= 1) tokenSet(text)
    else {
      val toks = tokens(text)
      // sequence(a, b) counts DOWN when b < a — guard short docs explicitly.
      when(size(toks) >= n,
        array_distinct(
          transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(array().cast("array<string>"))
    }

  /** BPE-ish regex token count: letter runs, digit runs, single other
    * non-space chars — the classic pre-tokenizer shape.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords — a cheap fluency signal. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isInCollection(Stopwords))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length band + punctuation sanity +
    * stopword presence. Deliberately simple and deterministic; the value is
    * the *shape* (pure-expression scoring over a corpus at scale).
    */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val lenOk = when(len.between(20, 2000), lit(0.4)).otherwise(lit(0.0))
    val punctRatio = regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(len.cast("double"), lit(1.0))
    val punctOk = when(punctRatio < 0.2, lit(0.3)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text) > 0.05, lit(0.3)).otherwise(lit(0.0))
    lenOk + punctOk + stopOk
  }

  /** Marker-word language ID: count per-language marker hits, argmax with a
    * fixed priority order (en > de > es > fr > und). An n-gram-frequency
    * heuristic in the standard shape — deterministic so an external oracle
    * can reproduce it exactly.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "les", "et", "une"))

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => regexp_count(text, lit(s"\\b$m\\b"))).reduce(_ + _)

  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => l -> langScore(text, ms) }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    // Fixed priority: first language whose score is >= all others.
    val pick = scores.zipWithIndex.foldRight(lit("und")) {
      case (((lang, s), _), elseExpr) =>
        val geAll = scores.map(_._2).map(o => s >= o).reduce(_ && _)
        when(geAll && anyHit, lit(lang)).otherwise(elseExpr)
    }
    pick
  }

  /** Normalized content fingerprint: lowercase, collapse whitespace, md5 —
    * the rolling-hash/document-fingerprint shape for exact-dup detection.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  // --------------------------------------------------------------- q208
  /** Good–Turing frequency-of-frequencies profile — the vocabulary-
    * coverage planner's statistic (Good 1953; Gale & Sampson's SGT is
    * the smoothed extension): per source, the missing probability mass
    * P₀ = N₁/N (the chance the NEXT token drawn is one never seen — the
    * number a tokenizer/vocab design reads before fixing vocab size),
    * plus the Turing-discounted counts r* = (r+1)·N_{r+1}/N_r for
    * r = 1, 2 (how much observed singleton/doubleton counts over-state
    * their true probability). Complements q137 (Heaps growth: how fast
    * vocabulary GROWS) and q124 (novelty attribution) with the
    * closed-form unseen-mass estimate; every output is exact integer —
    * counts are BIGINT, ratios micro-ppm via truncating division, the
    * r* emits null when N_r = 0 (undefined, not zero).
    *
    * Scale shape: one corpus scan → (source, token) hash agg →
    * (source, count) hash agg → source rollup. All three are fully
    * partial-aggregable; no window, no sort, state bounded by
    * vocabulary, then by distinct observed counts. 100 TB costs three
    * map-side-combined shuffles.
    */
  def goodTuringProfile(spark: SparkSession, dir: String): DataFrame = {
    val ff = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .groupBy(col("source"), col("c").as("r"))
      .agg(count(lit(1)).as("nr"))
    ff.groupBy("source")
      .agg(sum(expr("r * nr")).as("n_tokens"),
        sum("nr").as("vocab"),
        coalesce(sum(when(col("r") === 1, col("nr"))), lit(0L)).as("n1"),
        coalesce(sum(when(col("r") === 2, col("nr"))), lit(0L)).as("n2"),
        coalesce(sum(when(col("r") === 3, col("nr"))), lit(0L)).as("n3"))
      .withColumn("missing_mass_ppm", expr("(1000000 * n1) div n_tokens"))
      .withColumn("rstar1_micro",
        when(col("n1") > 0, expr("(2000000 * n2) div n1")))
      .withColumn("rstar2_micro",
        when(col("n2") > 0, expr("(3000000 * n3) div n2")))
  }

  private val goodTuringSql =
    """WITH tok AS (
      |  SELECT source,
      |    unnest(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS token
      |  FROM documents
      |), tc AS (
      |  SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
      |), ff AS (
      |  SELECT source, c AS r, count(*) AS nr FROM tc GROUP BY 1, 2
      |)
      |SELECT source,
      |  CAST(sum(r * nr) AS BIGINT) AS n_tokens,
      |  CAST(sum(nr) AS BIGINT) AS vocab,
      |  CAST(coalesce(sum(CASE WHEN r = 1 THEN nr END), 0) AS BIGINT) AS n1,
      |  CAST(coalesce(sum(CASE WHEN r = 2 THEN nr END), 0) AS BIGINT) AS n2,
      |  CAST(coalesce(sum(CASE WHEN r = 3 THEN nr END), 0) AS BIGINT) AS n3,
      |  CAST((1000000 * coalesce(sum(CASE WHEN r = 1 THEN nr END), 0))
      |    // sum(r * nr) AS BIGINT) AS missing_mass_ppm,
      |  CASE WHEN coalesce(sum(CASE WHEN r = 1 THEN nr END), 0) > 0 THEN
      |    CAST((2000000 * coalesce(sum(CASE WHEN r = 2 THEN nr END), 0))
      |      // sum(CASE WHEN r = 1 THEN nr END) AS BIGINT) END AS rstar1_micro,
      |  CASE WHEN coalesce(sum(CASE WHEN r = 2 THEN nr END), 0) > 0 THEN
      |    CAST((3000000 * coalesce(sum(CASE WHEN r = 3 THEN nr END), 0))
      |      // sum(CASE WHEN r = 2 THEN nr END) AS BIGINT) END AS rstar2_micro
      |FROM ff GROUP BY source""".stripMargin

  // --------------------------------------------------------------- q219
  /** Chao1 + first-order jackknife species-richness estimators — "how
    * big is this source's TRUE vocabulary, counting the words we never
    * sampled?" — the capture–recapture view of q208's unseen mass:
    * Good–Turing prices the probability of an unseen token, Chao1
    * counts the unseen TYPES. Chao1 (bias-corrected, Chao 1984) =
    * D + N₁(N₁−1)/(2(N₂+1)); jackknife-1 (Burnham & Overton) = D + N₁;
    * sample coverage Ĉ = 1 − N₁/N. A vocab-size / tokenizer budget is
    * set against the estimated richness, not the observed D, so this is
    * the number that decision actually needs.
    *
    * Exactness: every count is exact BIGINT off the same freq-of-freq
    * aggregate as q208; the Chao1 correction rides the overflow-safe
    * two-step truncating division (N₁² stays under 2⁶³ through
    * per-source vocabularies of ~3·10⁹ types). N₂ = 0 is handled by the
    * bias-corrected form itself (the +1 in the denominator — no special
    * case, no division by zero).
    *
    * Scale shape: identical to q208 — three chained fully-partial hash
    * aggregates (corpus → vocabulary → distinct counts → sources), no
    * window, no sort.
    */
  def richnessEstimate(spark: SparkSession, dir: String): DataFrame =
    richnessOf(Tables.documents(spark, dir))

  def richnessOf(docs: DataFrame): DataFrame = {
    val ff = docs
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .groupBy(col("source"), col("c").as("r"))
      .agg(count(lit(1)).as("nr"))
    ff.groupBy("source")
      .agg(sum(expr("r * nr")).as("n_tokens"),
        sum("nr").as("d_obs"),
        coalesce(sum(when(col("r") === 1, col("nr"))), lit(0L)).as("n1"),
        coalesce(sum(when(col("r") === 2, col("nr"))), lit(0L)).as("n2"))
      .withColumn("chao1_micro", expr(
        """d_obs * 1000000
          | + ((n1 * (n1 - 1)) div (2 * (n2 + 1))) * 1000000
          | + (1000000 * (n1 * (n1 - 1)
          |    - ((n1 * (n1 - 1)) div (2 * (n2 + 1))) * (2 * (n2 + 1))))
          |   div (2 * (n2 + 1))""".stripMargin))
      .withColumn("jack1", col("d_obs") + col("n1"))
      .withColumn("coverage_ppm",
        expr("1000000 - (1000000 * n1) div n_tokens"))
  }

  private val richnessSql =
    """WITH tok AS (
      |  SELECT source,
      |    unnest(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS token
      |  FROM documents
      |), tc AS (
      |  SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
      |), ff AS (
      |  SELECT source, c AS r, count(*) AS nr FROM tc GROUP BY 1, 2
      |), s AS (
      |  SELECT source,
      |    CAST(sum(r * nr) AS BIGINT) AS n_tokens,
      |    CAST(sum(nr) AS BIGINT) AS d_obs,
      |    CAST(coalesce(sum(CASE WHEN r = 1 THEN nr END), 0) AS BIGINT) AS n1,
      |    CAST(coalesce(sum(CASE WHEN r = 2 THEN nr END), 0) AS BIGINT) AS n2
      |  FROM ff GROUP BY source
      |)
      |SELECT source, n_tokens, d_obs, n1, n2,
      |  CAST(d_obs * 1000000
      |    + ((n1 * (n1 - 1)) // (2 * (n2 + 1))) * 1000000
      |    + (1000000 * (n1 * (n1 - 1)
      |       - ((n1 * (n1 - 1)) // (2 * (n2 + 1))) * (2 * (n2 + 1))))
      |      // (2 * (n2 + 1)) AS BIGINT) AS chao1_micro,
      |  CAST(d_obs + n1 AS BIGINT) AS jack1,
      |  CAST(1000000 - (1000000 * n1) // n_tokens AS BIGINT) AS coverage_ppm
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q222
  /** Vocabulary coverage curve — the tokenizer-budget planner's other
    * number: q219 estimates how many types EXIST, this reports how few
    * you actually NEED — the smallest top-frequency vocabulary covering
    * 90% / 99% of token mass per source (R₉₀/R₉₉). A steep curve
    * (R₉₀ ≪ vocab) says a compact vocab suffices; templated corpora are
    * steeper than natural text (the q211 Zipf slope explains why).
    *
    * Exactness: counts and the rank/cumulative sums are exact BIGINT;
    * the coverage cuts are the division-free comparisons 10·cum ≥ 9·N
    * and 100·cum ≥ 99·N (no ratio is ever materialized); the rank
    * tie-break (count desc, token asc) is deterministic cross-engine.
    *
    * Scale shape: corpus scan → (source, token) hash agg → ONE
    * per-source window over the VOCABULARY table (Heaps-sublinear in
    * corpus, parallel across sources — the q211 rank-window shape) →
    * source rollup. The corpus is never sorted.
    */
  def coverageCurve(docs: DataFrame): DataFrame = {
    val wRank = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("token"))
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSrc = Window.partitionBy("source")
    docs
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n_tok", sum("cnt").over(wSrc))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        max("n_tok").as("n_tokens"),
        min(when(col("cum") * 10L >= col("n_tok") * 9L, col("rk")))
          .as("r90"),
        min(when(col("cum") * 100L >= col("n_tok") * 99L, col("rk")))
          .as("r99"))
      .withColumn("r90_vocab_ppm", expr("(1000000 * r90) div vocab"))
      .withColumn("r99_vocab_ppm", expr("(1000000 * r99) div vocab"))
  }

  def coverageCurveGate(spark: SparkSession, dir: String): DataFrame =
    coverageCurve(Tables.documents(spark, dir))

  private val coverageCurveSql =
    """WITH tok AS (
      |  SELECT source,
      |    unnest(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS token
      |  FROM documents
      |), tc AS (
      |  SELECT source, token, count(*) AS cnt FROM tok GROUP BY 1, 2
      |), r AS (
      |  SELECT source, cnt,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY cnt DESC, token) AS BIGINT) AS rk,
      |    sum(cnt) OVER (PARTITION BY source ORDER BY cnt DESC, token
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(cnt) OVER (PARTITION BY source) AS n_tok
      |  FROM tc
      |), s AS (
      |  SELECT source, count(*) AS vocab, max(n_tok) AS n_tokens,
      |    min(CASE WHEN cum * 10 >= n_tok * 9 THEN rk END) AS r90,
      |    min(CASE WHEN cum * 100 >= n_tok * 99 THEN rk END) AS r99
      |  FROM r GROUP BY 1
      |)
      |SELECT source, CAST(vocab AS BIGINT) AS vocab,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(r90 AS BIGINT) AS r90, CAST(r99 AS BIGINT) AS r99,
      |  CAST((1000000 * r90) // vocab AS BIGINT) AS r90_vocab_ppm,
      |  CAST((1000000 * r99) // vocab AS BIGINT) AS r99_vocab_ppm
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q211
  /** Zipf head size: the rank cutoff the slope is fitted over. Zipf's
    * law holds in the head and bends in the tail (Mandelbrot), so a
    * fixed-R head fit is the standard estimator — and it also bounds the
    * OLS input at R rows per source at any corpus scale.
    */
  val ZipfHead = 500

  /** Zipf rank–frequency slope — the third leg of the vocabulary-shape
    * battery (q137 Heaps: how vocabulary GROWS; q208 Good–Turing: how
    * much mass is UNSEEN; q211: how the seen mass is CONCENTRATED): per
    * source, the OLS slope of ln(frequency) on ln(rank) over the top-
    * [[ZipfHead]] tokens, ≈ −1 for natural language (Zipf 1949), nearer
    * 0 for templated/synthetic text — a corpus-health smell test next to
    * the q43 repetition signals. Logs ride the q195 milli-nat floor
    * discipline, sums are exact BIGINT (x ≤ ln(500)·10³, y ≤ ln(N)·10³:
    * products ≤ ~2·10⁸ per row, ≤ 10¹¹ per source), and slope/R² are the
    * q167 fixed-double-sequence finishers over those exact integers —
    * both engines floor identical values. Degenerate heads (all-equal x,
    * i.e. vocab < 2) emit null, not NaN.
    *
    * Scale shape: corpus scan → (source, token) hash agg → per-source
    * rank window over the VOCABULARY table (Heaps-sublinear in corpus;
    * the q38 top-tokens precedent) pruned to R rows → one tiny OLS
    * aggregate. The corpus itself is never sorted.
    */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("source").orderBy(desc("n"), asc("token"))
    val head = tc.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ZipfHead)
      .select(col("source"),
        floor(log(col("rk").cast("double")) * 1000).cast("long").as("x"),
        floor(log(col("n").cast("double")) * 1000).cast("long").as("y"))
    val det = col("n_ranks").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val num = col("n_ranks").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val dety = col("n_ranks").cast("double") * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    head.groupBy("source")
      .agg(count(lit(1)).as("n_ranks"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("zipf_slope_micro",
        when(col("sxx") * col("n_ranks") =!= col("sx") * col("sx"),
          floor(num / det * lit(1e6) + lit(0.5)).cast("long")))
      .withColumn("fit_r2_ppm",
        when((col("sxx") * col("n_ranks") =!= col("sx") * col("sx")) &&
          (col("syy") * col("n_ranks") =!= col("sy") * col("sy")),
          floor(num * num / (det * dety) * lit(1e6)).cast("long")))
      .select("source", "n_ranks", "sx", "sy", "sxy", "sxx", "syy",
        "zipf_slope_micro", "fit_r2_ppm")
  }

  private val zipfSlopeSql =
    s"""WITH tc AS (
      |  SELECT source,
      |    unnest(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS token
      |  FROM documents
      |), tn AS (
      |  SELECT source, token, count(*) AS n FROM tc GROUP BY 1, 2
      |), head AS (
      |  SELECT source,
      |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS y
      |  FROM (
      |    SELECT source, n,
      |      row_number() OVER (PARTITION BY source ORDER BY n DESC, token) AS rk
      |    FROM tn) WHERE rk <= $ZipfHead
      |), s AS (
      |  SELECT source, count(*) AS nr, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM head GROUP BY 1
      |)
      |SELECT source, CAST(nr AS BIGINT) AS n_ranks, CAST(sx AS BIGINT) AS sx,
      |  CAST(sy AS BIGINT) AS sy, CAST(sxy AS BIGINT) AS sxy,
      |  CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
      |  CASE WHEN sxx * nr <> sx * sx THEN
      |    CAST(floor((nr::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |      / (nr::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) END AS zipf_slope_micro,
      |  CASE WHEN sxx * nr <> sx * sx AND syy * nr <> sy * sy THEN
      |    CAST(floor((nr::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |      * (nr::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |      / ((nr::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |        * (nr::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
      |      * 1000000.0::DOUBLE) AS BIGINT) END AS fit_r2_ppm
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Per-source token statistics. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text")))).cast("long").as("ws_tokens"),
        sum(regexTokenCount(col("text"))).cast("long").as("re_tokens"),
        round(avg("n_chars"), 4).as("avg_chars"))

  private val tokenStatsSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(list_filter(str_split(text, ' '), t -> len(t) > 0))) AS BIGINT) AS ws_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS re_tokens,
      |  round(avg(n_chars), 4) AS avg_chars
      |FROM documents GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Language-ID prediction vs labeled language + quality aggregates. */
  def langQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("pred_lang", langId(col("text")))
      .withColumn("quality", qualityScore(col("text")))
      .withColumn("stop_ratio", stopwordRatio(col("text")))
      .groupBy("lang", "pred_lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("quality"), 4).as("avg_quality"),
        round(avg("stop_ratio"), 4).as("avg_stop_ratio"))

  private val langQualitySql = {
    val scoreSql = TextAnalysis.LangMarkers.map { case (l, ms) =>
      val cnt = ms.map(m => s"len(regexp_extract_all(text, '\\b$m\\b'))").mkString(" + ")
      s"($cnt) AS s_$l"
    }.mkString(", ")
    val langs = TextAnalysis.LangMarkers.map(_._1)
    val anyHit = langs.map(l => s"s_$l").mkString(" + ") + " > 0"
    val pick = langs.map { l =>
      val geAll = langs.map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $geAll AND ($anyHit) THEN '$l'"
    }.mkString(" ")
    s"""WITH scored AS (
       |  SELECT *, $scoreSql,
       |    len(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS n_toks,
       |    len(list_filter(str_split(text, ' '), t -> t IN ('the','a','of','and','to','in','is','it'))) AS n_stops,
       |    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
       |  FROM documents
       |), feat AS (
       |  SELECT lang,
       |    CASE $pick ELSE 'und' END AS pred_lang,
       |    (CASE WHEN length(text) BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END) +
       |    (CASE WHEN n_punct / greatest(length(text), 1.0) < 0.2 THEN 0.3 ELSE 0.0 END) +
       |    (CASE WHEN (CASE WHEN n_toks > 0 THEN n_stops::DOUBLE / n_toks ELSE 0.0 END) > 0.05 THEN 0.3 ELSE 0.0 END) AS quality,
       |    CASE WHEN n_toks > 0 THEN n_stops::DOUBLE / n_toks ELSE 0.0 END AS stop_ratio
       |  FROM scored
       |)
       |SELECT lang, pred_lang, count(*) AS n_docs,
       |  round(avg(quality), 4) AS avg_quality,
       |  round(avg(stop_ratio), 4) AS avg_stop_ratio
       |FROM feat GROUP BY lang, pred_lang""".stripMargin
  }

  // ---------------------------------------------------------------- q15
  /** Exact deduplication by normalized fingerprint over a corpus with
    * planted duplicates (the corpus unioned with a re-keyed copy of
    * itself): group by fingerprint, keep the minimum doc_id. The classic
    * hash-groupBy dedup — one shuffle on the fingerprint.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val copy = docs.withColumn("doc_id", col("doc_id") + lit(1000000L))
    docs.unionByName(copy)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(
        min("doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"),
        min("source").as("source"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_unique"),
        sum("n_copies").cast("long").as("n_total"),
        sum(col("n_copies") - 1).cast("long").as("n_removed"))
  }

  private val exactDedupSql =
    """WITH unioned AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, source FROM documents
      |), groups AS (
      |  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    min(doc_id) AS keep_id, count(*) AS n_copies, min(source) AS source
      |  FROM unioned GROUP BY 1
      |)
      |SELECT source, count(*) AS n_unique,
      |  CAST(sum(n_copies) AS BIGINT) AS n_total,
      |  CAST(sum(n_copies - 1) AS BIGINT) AS n_removed
      |FROM groups GROUP BY source""".stripMargin

  // --------------------------------------------------------------- q235
  /** Gopher-style REPETITION quality signals — the within-document
    * complement of the corpus-level dedup battery (q15/q17/... find
    * copies ACROSS documents; boilerplate-heavy or degenerate docs
    * repeat themselves INTERNALLY and slip through; q43's token-level
    * distinct/top ratios catch single-token degeneracy, these catch
    * PHRASE-level boilerplate): per document,
    * (a) the character fraction covered by occurrences of the single
    * most frequent word `topN`-gram (MassiveText's "fraction of
    * characters in most frequent n-gram" rule), and (b) the word
    * fraction covered by the UNION of all word `dupN`-gram occurrences
    * that appear ≥ 2 times (the "fraction of characters in duplicate
    * n-grams" rule, computed as an exact interval union so overlapping
    * occurrences are never double-counted — the published heuristic's
    * documented pitfall). Gopher runs top-{2,3,4} and dup-{5..10};
    * the harness corpus's 31-word vocabulary makes (top-2, dup-3) the
    * discriminating sizes (the q45 calibration argument — dup-5 never
    * fires on synthetic text, top-2 and dup-3 separate the corpus).
    *
    * Exactness: counts and interval unions are integers; the two
    * fractions are integer ppm divisions over the normalized
    * single-space token join (`n_chars`) and the token count
    * (`n_words`). The top-gram tie-break is (count desc, gram asc) —
    * total order, engine-portable. `top_char_ppm` is capped at 1e6:
    * the published count×length heuristic ignores occurrence overlap,
    * so a degenerate doc ("a a a a") can nominally exceed its own
    * length.
    *
    * Scale shape: two posexplodes + per-doc hash aggregates and
    * windows, all partitioned by doc_id — corpus-linear, no joins
    * beyond the final per-doc assembly against the base projection.
    */
  def ngramRepetitionSignals(docs: DataFrame, topN: Int = 2, dupN: Int = 3,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val toks = graft.functions.shingleStrings(col(textCol), 1)
    val base = docs.select(col(idCol), size(toks).as("n_words"),
      length(concat_ws(" ", toks)).as("n_chars"))
    val wTop = Window.partitionBy(idCol).orderBy(desc("c"), asc("g"))
    val top = docs
      .select(col(idCol),
        explode(graft.functions.shingleStrings(col(textCol), topN)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
      .select(col(idCol), col("c").as("top_count"),
        length(col("g")).cast("long").as("top_len"))
    // Duplicate-n-gram coverage: occurrences of any gram with count ≥ 2
    // cover word positions [pos, pos+n-1]; the per-doc interval union
    // is the classic running-max sweep (sorted by start, contribution =
    // end − max(start−1, max prior end), clamped at 0).
    val wGram = Window.partitionBy(idCol, "g")
    val wSweep = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cov = docs
      .select(col(idCol),
        posexplode(graft.functions.shingleStrings(col(textCol), dupN)))
      .toDF(idCol, "pos", "g")
      .withColumn("cg", count(lit(1)).over(wGram))
      .filter(col("cg") >= 2)
      .withColumn("endp", (col("pos") + dupN - 1).cast("long"))
      .withColumn("pmax", max("endp").over(wSweep))
      .withColumn("add", greatest(lit(0L),
        col("endp") - greatest(col("pos").cast("long") - 1,
          coalesce(col("pmax"), lit(-1L)))))
      .groupBy(idCol).agg(sum("add").as("dup_words"))
    base
      .join(top, Seq(idCol), "left")
      .join(cov, Seq(idCol), "left")
      .select(col(idCol),
        col("n_words").cast("long").as("n_words"),
        coalesce(col("top_count"), lit(0L)).as("top_count"),
        when(col("n_chars") === 0 || col("top_count").isNull, 0L)
          .otherwise(least(lit(1000000L),
            expr("(top_count * top_len * 1000000) div n_chars")))
          .as("top_char_ppm"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"),
        when(col("n_words") === 0, 0L)
          .otherwise(expr("(coalesce(dup_words, 0) * 1000000) div n_words"))
          .as("dup_word_ppm"))
  }

  def ngramRepetitionProfile(spark: SparkSession, dir: String): DataFrame =
    ngramRepetitionSignals(Tables.documents(spark, dir))

  private val repetitionSql =
    """WITH ws AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |),
      |base AS (
      |  SELECT doc_id, len(w) AS n_words,
      |    len(array_to_string(w, ' ')) AS n_chars
      |  FROM ws
      |),
      |g2 AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] AS g
      |  FROM ws, unnest(range(1, greatest(len(w), 1))) AS t(i)
      |),
      |g2c AS (
      |  SELECT doc_id, g, count(*) AS c,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g) AS rn
      |  FROM g2 GROUP BY 1, 2
      |),
      |top2 AS (
      |  SELECT doc_id, c AS top_count, len(g) AS top_len FROM g2c WHERE rn = 1
      |),
      |g3 AS (
      |  SELECT doc_id, i AS pos, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      |  FROM ws, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)
      |),
      |d3 AS (
      |  SELECT doc_id, pos, pos + 2 AS endp,
      |    count(*) OVER (PARTITION BY doc_id, g) AS cg
      |  FROM g3 QUALIFY cg >= 2
      |),
      |iv AS (
      |  SELECT doc_id, pos, endp,
      |    max(endp) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM d3
      |),
      |cov AS (
      |  SELECT doc_id,
      |    sum(greatest(0, endp - greatest(pos - 1, coalesce(pmax, 0)))) AS dup_words
      |  FROM iv GROUP BY 1
      |)
      |SELECT b.doc_id AS doc_id,
      |  CAST(b.n_words AS BIGINT) AS n_words,
      |  CAST(coalesce(t.top_count, 0) AS BIGINT) AS top_count,
      |  CAST(CASE WHEN b.n_chars = 0 OR t.top_count IS NULL THEN 0
      |    ELSE least(1000000, (t.top_count * t.top_len * 1000000) // b.n_chars)
      |    END AS BIGINT) AS top_char_ppm,
      |  CAST(coalesce(c.dup_words, 0) AS BIGINT) AS dup_words,
      |  CAST(CASE WHEN b.n_words = 0 THEN 0
      |    ELSE (coalesce(c.dup_words, 0) * 1000000) // b.n_words
      |    END AS BIGINT) AS dup_word_ppm
      |FROM base b
      |LEFT JOIN top2 t USING (doc_id)
      |LEFT JOIN cov c USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Word-set Jaccard similarity between consecutive documents — the exact
    * n-gram-Jaccard kernel (the verification step of every near-dup
    * pipeline), oracle-checkable because the pairing is deterministic.
    */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokenSet(col("text")).as("ws"))
    val a = docs.alias("a")
    val b = docs.select(col("doc_id").as("b_id"), col("ws").as("b_ws")).alias("b")
    a.join(b, col("b_id") === col("doc_id") + 1)
      .select(
        col("doc_id"),
        col("b_id").as("next_id"),
        round(
          size(array_intersect(col("ws"), col("b_ws"))).cast("double") /
            size(array_union(col("ws"), col("b_ws"))).cast("double"),
          6).as("jaccard"))
  }

  private val jaccardPairsSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS ws
      |  FROM documents
      |)
      |SELECT a.doc_id AS doc_id, b.doc_id AS next_id,
      |  round(len(list_intersect(a.ws, b.ws))::DOUBLE /
      |        len(list_distinct(list_concat(a.ws, b.ws))), 6) AS jaccard
      |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Repetition / boilerplate quality signals per document: distinct-token
    * ratio (low = repetitive) and top-token concentration (high = one
    * token dominates — template/boilerplate smell). The standard cheap
    * repetitiveness filters of a training-data pipeline, computed with an
    * explode + two hash aggregates — all ratios are integer quotients, so
    * an external engine reproduces them bit-exactly.
    */
  def repetitionQuality(spark: SparkSession, dir: String): DataFrame =
    repetitionSignals(Tables.documents(spark, dir))

  /** Operator form over any (doc_id, text) frame — spec-tested on planted
    * boilerplate; [[repetitionQuality]] gates it on the documents table.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val freq = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val top = freq.groupBy("doc_id").agg(
      max("c").as("top_c"),
      sum("c").cast("long").as("n_toks"),
      count(lit(1)).as("n_distinct"))
    docs.select("doc_id")
      .join(top, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        round(coalesce(col("n_distinct").cast("double") / col("n_toks"), lit(0.0)), 6)
          .as("distinct_ratio"),
        round(coalesce(col("top_c").cast("double") / col("n_toks"), lit(0.0)), 6)
          .as("top_ratio"))
  }

  private val repetitionQualitySql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS tok
      |  FROM documents
      |), freq AS (
      |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
      |), top AS (
      |  SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_toks,
      |    count(*) AS n_distinct
      |  FROM freq GROUP BY 1
      |)
      |SELECT d.doc_id, coalesce(t.n_toks, 0) AS n_toks,
      |  round(coalesce(t.n_distinct::DOUBLE / t.n_toks, 0), 6) AS distinct_ratio,
      |  round(coalesce(t.top_c::DOUBLE / t.n_toks, 0), 6) AS top_ratio
      |FROM documents d LEFT JOIN top t ON d.doc_id = t.doc_id""".stripMargin

  // ---------------------------------------------------------------- q46
  /** TF-IDF keyword extraction: the top-k terms per document by
    * `tf · ln((N+1)/(df+1))` — the classic corpus-statistics ranking a
    * curation pipeline uses for topic tagging and near-template
    * detection. Exact-parity design: tf and df are integers, so every
    * score is `int · ln(exact-double ratio)` — no summation-order
    * dependence anywhere — and ranking ties (identical (tf, df)) break on
    * the term string, so the row set is deterministic in both engines;
    * only the display value is rounded.
    *
    * Plan shape for 100 TB: the document-frequency table is a term
    * dictionary (vocabulary-sized, ~1M entries for BPE-style tokens ≪
    * corpus) — broadcast it and the corpus-sized tf table never shuffles
    * for the join; the only corpus-wide exchanges are the tf groupBy and
    * the per-doc rank window, both partitioned by doc_id.
    */
  def tfIdf(docs: DataFrame, k: Int = 3,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(graft.functions.shingleStrings(col(textCol), 1)).as("term"))
    val tfs = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    tfs.join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("term_rank"),
        round(col("score"), 4).as("score"))
  }

  def tfIdfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    tfIdf(Tables.documents(spark, dir), k)

  private val tfIdfTopTermsSql =
    """WITH ws AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |),
      |tok AS (SELECT doc_id, unnest(w) AS term FROM ws),
      |tfs AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfs AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM ws),
      |scored AS (
      |  SELECT t.doc_id, t.term, t.tf, t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)) AS score
      |  FROM tfs t JOIN dfs d USING (term) CROSS JOIN n
      |),
      |ranked AS (
      |  SELECT doc_id, term, tf, score,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS term_rank
      |  FROM scored
      |)
      |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, term_rank, round(score, 4) AS score
      |FROM ranked WHERE term_rank <= 3""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Vocabulary coverage: the fraction of all token occurrences a top-k
    * global vocabulary captures, reported per language — the Zipf-curve
    * question every tokenizer/vocab design starts from ("how much of the
    * corpus do the k most frequent types cover, and which languages fall
    * off the head?").
    *
    * The vocabulary is tiny relative to the corpus by construction (k
    * entries), so the plan broadcasts it: the corpus-sized token stream
    * shuffles once for the global term count and once for the per-lang
    * aggregate — no corpus-sized join exchange at any scale. Boundary
    * ties (equal counts at rank k) break on the token string, so the
    * vocabulary — and therefore every coverage number — is deterministic
    * in both engines.
    */
  def vocabCoverage(docs: DataFrame, k: Int = 8,
                    langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(langCol),
      explode(graft.functions.shingleStrings(col(textCol), 1)).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(k)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(langCol)
      .agg(count(lit(1)).as("n_tokens"), count(col("in_vocab")).as("n_covered"))
      .select(col(langCol), col("n_tokens"), col("n_covered"),
        round(col("n_covered").cast("double") / col("n_tokens"), 6).as("coverage"))
  }

  def vocabCoverageByLang(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(spark, dir))

  private val vocabCoverageSql =
    """WITH toks AS (
      |  SELECT lang,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok
      |  FROM documents
      |), vocab AS (
      |  SELECT tok FROM (
      |    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
      |    FROM toks GROUP BY tok)
      |  WHERE rk <= 8
      |)
      |SELECT t.lang, count(*) AS n_tokens,
      |  CAST(count(v.tok) AS BIGINT) AS n_covered,
      |  round(count(v.tok)::DOUBLE / count(*), 6) AS coverage
      |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
      |GROUP BY t.lang""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Exact heavy-hitter tokens at 1% support via the Misra–Gries
    * two-pass pipeline ([[graft.functions.FrequentItems]]): a bounded-
    * memory sketch finds candidates in one pass (O(1/support) counters
    * per task — an exact token groupBy at 100 TB is vocabulary-sized,
    * the sketch never is), then the ≤ 200 candidates are recounted
    * exactly. The harness corpus plants a rare token far below support
    * and keeps every other token far above it, so the output is
    * margin-stable at every SF and the oracle recomputes it exactly.
    */
  def heavyTokens(spark: SparkSession, dir: String): DataFrame =
    graft.functions.FrequentItems.heavyHitters(
      Tables.documents(spark, dir)
        .select(explode(graft.functions.shingleStrings(col("text"), 1)).as("token")),
      "token", support = 0.01)

  private val heavyTokensSql =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x <> '')) AS token
      |  FROM documents
      |), tot AS (SELECT count(*) AS total FROM toks)
      |SELECT t.token, CAST(count(*) AS BIGINT) AS n,
      |  round(count(*)::DOUBLE / max(tot.total), 6) AS freq
      |FROM toks t CROSS JOIN tot
      |GROUP BY t.token
      |HAVING count(*)::DOUBLE >= max(tot.total)::DOUBLE * 0.01""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Token salience per corpus slice — Dunning's log-likelihood keyness
    * (Dunning 1993, "Accurate Methods for the Statistics of Surprise and
    * Coincidence"): for each (source, term), the G² statistic of the 2×2
    * contingency table (term-in-source vs term-elsewhere), the standard
    * way to ask "which tokens characterize this slice vs the corpus" —
    * the drift/quality monitor a mixture pipeline runs per source before
    * reweighting.
    *
    * Exactness: all four cells derive from exact integer counts
    * (a = c_st, source total c_s, term total c_t, corpus total N); G² is
    * ONE fixed double-op sequence per row (casts before multiplies, so
    * nothing overflows at any N), floored to integer micro-nats —
    * order-independent and engine-identical. Over/under direction is a
    * double-compare of the same casts.
    *
    * Scale shape: per-(source,term) counts equi-join the vocab-sized
    * term totals; source totals and N are tiny broadcasts. The top-k
    * window partitions by source over per-source DISTINCT-term lists —
    * bounded by vocabulary, which is machine-sized regardless of corpus
    * rows (the corpus itself never re-shuffles after the first count).
    */
  def tokenSalience(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val toks = Tables.documents(spark, dir).select(col("source"),
      explode(graft.functions.shingleStrings(col("text"), 1)).as("term"))
    val cst = toks.groupBy("source", "term").agg(count(lit(1)).as("a"))
    val cs = toks.groupBy("source").agg(count(lit(1)).as("c_s"))
    val ct = toks.groupBy("term").agg(count(lit(1)).as("c_t"))
    val n = toks.agg(count(lit(1)).as("n_tok"))
    // G² = 2·Σ O·ln(O/E) over the 2×2 table; 0·ln0 terms drop out.
    def cell(o: Column, row: Column, colm: Column, nn: Column): Column =
      when(o > 0, o.cast("double") *
        log((o.cast("double") * nn.cast("double")) /
          (row.cast("double") * colm.cast("double")))).otherwise(lit(0.0))
    val a = col("a"); val b = col("c_t") - col("a")
    val c = col("c_s") - col("a")
    val d = col("n_tok") - col("c_s") - col("c_t") + col("a")
    val nOut = col("n_tok") - col("c_s")
    val tOut = col("n_tok") - col("c_t")
    val g2 = lit(2.0) * (
      cell(a, col("c_s"), col("c_t"), col("n_tok")) +
      cell(b, nOut, col("c_t"), col("n_tok")) +
      cell(c, col("c_s"), tOut, col("n_tok")) +
      cell(d, nOut, tOut, col("n_tok")))
    val over = (a.cast("double") * col("n_tok").cast("double")) >
      (col("c_s").cast("double") * col("c_t").cast("double"))
    val scored = cst
      .join(broadcast(cs), Seq("source"))
      .join(ct, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("source"), col("term"), col("a").as("n_in_source"),
        col("c_t").as("n_corpus"), over.as("over_represented"),
        floor(g2 * lit(1000000.0) + lit(0.5)).cast("long").as("g2_unats"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("source")
        .orderBy(col("g2_unats").desc, col("term"))))
      .filter(col("rank") <= k)
      .select("source", "rank", "term", "n_in_source", "n_corpus",
        "over_represented", "g2_unats")
  }

  private val tokenSalienceSql =
    """WITH toks AS (
      |  SELECT source,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                       x -> x <> '')) AS term
      |  FROM documents
      |),
      |cst AS (SELECT source, term, count(*) AS a FROM toks GROUP BY 1, 2),
      |cs AS (SELECT source, count(*) AS c_s FROM toks GROUP BY 1),
      |ct AS (SELECT term, count(*) AS c_t FROM toks GROUP BY 1),
      |n AS (SELECT count(*) AS n_tok FROM toks),
      |scored AS (
      |  SELECT cst.source, cst.term, a AS n_in_source, c_t AS n_corpus,
      |    (a::DOUBLE * n_tok::DOUBLE) > (c_s::DOUBLE * c_t::DOUBLE) AS over_represented,
      |    CAST(floor(2.0::DOUBLE * (
      |      CASE WHEN a > 0 THEN a::DOUBLE *
      |        ln((a::DOUBLE * n_tok::DOUBLE) / (c_s::DOUBLE * c_t::DOUBLE)) ELSE 0.0 END
      |      + CASE WHEN c_t - a > 0 THEN (c_t - a)::DOUBLE *
      |        ln(((c_t - a)::DOUBLE * n_tok::DOUBLE) /
      |           ((n_tok - c_s)::DOUBLE * c_t::DOUBLE)) ELSE 0.0 END
      |      + CASE WHEN c_s - a > 0 THEN (c_s - a)::DOUBLE *
      |        ln(((c_s - a)::DOUBLE * n_tok::DOUBLE) /
      |           (c_s::DOUBLE * (n_tok - c_t)::DOUBLE)) ELSE 0.0 END
      |      + CASE WHEN n_tok - c_s - c_t + a > 0 THEN (n_tok - c_s - c_t + a)::DOUBLE *
      |        ln(((n_tok - c_s - c_t + a)::DOUBLE * n_tok::DOUBLE) /
      |           ((n_tok - c_s)::DOUBLE * (n_tok - c_t)::DOUBLE)) ELSE 0.0 END
      |    ) * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS g2_unats
      |  FROM cst JOIN cs USING (source) JOIN ct USING (term) CROSS JOIN n
      |)
      |SELECT source, rank, term, n_in_source, n_corpus, over_represented, g2_unats
      |FROM (
      |  SELECT *, CAST(row_number() OVER
      |    (PARTITION BY source ORDER BY g2_unats DESC, term) AS INTEGER) AS rank
      |  FROM scored) t
      |WHERE rank <= 10""".stripMargin

  // ---------------------------------------------------------------- q79
  /** Term co-occurrence + pointwise mutual information (Church & Hanks
    * 1990) — which token pairs appear together in documents far more
    * than chance: pmi(x,y) = ln(N·c_xy / (c_x·c_y)) over document-level
    * co-occurrence, the standard association statistic behind collocation
    * mining and phrase induction.
    *
    * Exactness: c_xy/c_x/c_y/N are exact integer document counts; PMI is
    * one ln over cast-to-double integer products (overflow-free), floored
    * to micro-nats; ranking ties break on the pair itself.
    *
    * Scale shape: the pair space is generated per document by a doc-keyed
    * self-join of DISTINCT doc terms — work ∝ Σ_d t_d² (t_d = distinct
    * terms per doc, bounded by doc length and vocabulary), never corpus²;
    * the co-occurrence counts then aggregate by pair. A min-support gate
    * (c_xy ≥ 5) drops the rare-pair noise PMI is known to amplify, and
    * the final top-k window runs over the vocab²-bounded pair table, not
    * the corpus.
    */
  def pmiPairs(spark: SparkSession, dir: String, minPairDocs: Int = 5,
               k: Int = 50): DataFrame =
    pmiPairsOf(Tables.documents(spark, dir), minPairDocs, k)

  def pmiPairsOf(docs: DataFrame, minPairDocs: Int, k: Int): DataFrame = {
    val docTerms = docs
      .select(col("doc_id"),
        explode(graft.functions.shingleStrings(col("text"), 1)).as("term"))
      .distinct()
    val cx = docTerms.groupBy("term").agg(count(lit(1)).as("c"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val pairs = docTerms.toDF("doc_id", "term_x")
      .join(docTerms.toDF("doc_id", "term_y"), Seq("doc_id"))
      .filter(col("term_x") < col("term_y"))
      .groupBy("term_x", "term_y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minPairDocs)
    val pmi = log((col("c_xy").cast("double") * col("n_docs").cast("double")) /
      (col("c_x").cast("double") * col("c_y").cast("double")))
    pairs
      .join(cx.select(col("term").as("term_x"), col("c").as("c_x")), Seq("term_x"))
      .join(cx.select(col("term").as("term_y"), col("c").as("c_y")), Seq("term_y"))
      .crossJoin(broadcast(n))
      .select(col("term_x"), col("term_y"), col("c_xy"), col("c_x"), col("c_y"),
        floor(pmi * lit(1000000.0) + lit(0.5)).cast("long").as("pmi_unats"))
      .withColumn("rank", row_number().over(Window.orderBy(
        col("pmi_unats").desc, col("term_x"), col("term_y"))))
      .filter(col("rank") <= k)
      .select("rank", "term_x", "term_y", "c_xy", "c_x", "c_y", "pmi_unats")
  }

  private val pmiPairsSql =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                       x -> x <> '')) AS term
      |  FROM documents
      |),
      |cx AS (SELECT term, count(*) AS c FROM dt GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |pairs AS (
      |  SELECT a.term AS term_x, b.term AS term_y, count(*) AS c_xy
      |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
      |  GROUP BY 1, 2 HAVING count(*) >= 5
      |)
      |SELECT rank, term_x, term_y, c_xy, c_x, c_y, pmi_unats FROM (
      |  SELECT term_x, term_y, c_xy, x.c AS c_x, y.c AS c_y,
      |    CAST(floor(ln((c_xy::DOUBLE * n_docs::DOUBLE) /
      |      (x.c::DOUBLE * y.c::DOUBLE)) * 1000000.0::DOUBLE + 0.5::DOUBLE)
      |      AS BIGINT) AS pmi_unats,
      |    CAST(row_number() OVER (ORDER BY CAST(floor(
      |      ln((c_xy::DOUBLE * n_docs::DOUBLE) / (x.c::DOUBLE * y.c::DOUBLE))
      |      * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) DESC,
      |      term_x, term_y) AS INTEGER) AS rank
      |  FROM pairs
      |  JOIN cx x ON pairs.term_x = x.term
      |  JOIN cx y ON pairs.term_y = y.term
      |  CROSS JOIN n) t
      |WHERE rank <= 50""".stripMargin

  // ---------------------------------------------------------------- q83
  /** Corpus-slice similarity matrix — pairwise n-gram Jaccard between
    * sources: the leakage/redundancy map a mixture designer reads before
    * weighting slices (two sources that share most of their 3-gram space
    * are near-copies; disjoint ones add diversity).
    *
    * Exactness: shared/distinct shingle counts are exact integers;
    * Jaccard is reported as the integer division
    * `(shared · 1e6) div (|A| + |B| − shared)` — micro-units, no floats.
    *
    * Scale shape: one map-side-combined `bit_or` agg collapses the
    * corpus to its (distinct shingle-mask, count) frame; each mask row
    * then explodes its ≤S set bits / ≤S²∕2 bit pairs and hash-aggregates
    * — work ∝ shingles + masks·S², never corpus², and every join is a
    * broadcast EQUI-join on the S-row source dim (no NLJ).
    */
  def sourceOverlap(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // Parallelism floor (core.Spread): the corpus lands in one scan
    // partition at harness scale, so the ×shingles explode and the
    // map-side bit_or partial — the query's dominant per-row work,
    // measured as a single-task 2.5 s stage — would run on one core.
    // bit_or/count are order-independent, so the spread is result-free.
    val ss = graft.core.Spread.ifNarrow(docs.select("source", "text"), 8L << 10)
      .select(col("source"), explode(shingleSet(col("text"), n)).as("sh"))
    // ≤63 sources fit a LONG bitmask (r10 rewrite): per shingle,
    // bit_or the source bits — idempotent, so no DISTINCT pass — then
    // collapse to the tiny mask frame. Sources above 63 fall back to
    // the join form (same answer, spec-pinned equal).
    // The source list comes from the PRUNED parquet scan of documents
    // (a `source`-column-only pass), NOT from `ss` — a distinct over
    // the exploded frame cannot prune the Generate, so it would cost a
    // full corpus shingle pass just to learn the dimension. A source
    // with zero shingles gets a dim row whose bit never fires: harmless.
    val srcs = docs.select("source").distinct().orderBy("source")
      .collect().map(_.getString(0))
    if (srcs.length > 63) return sourceOverlapJoin(ss)
    import spark.implicits._
    val dim = srcs.zipWithIndex.map { case (s, i) => (s, i) }.toSeq
      .toDF("source", "sid")
    // bit_or is idempotent, so no DISTINCT pass; the corpus collapses to
    // its (distinct-mask, count) frame in one map-side-combined agg.
    // localCheckpoint because BOTH the sizes and shared aggregates read
    // this frame — without it the corpus-wide shingle explode ran twice
    // (the r10 3.6→6.1 s regression).
    val masks = ss.join(broadcast(dim), Seq("source"))
      .groupBy("sh").agg(expr("bit_or(shiftleft(1L, sid))").as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("cnt"))
      .withColumn("sids", expr(
        "filter(sequence(0, 62), i -> (mask & shiftleft(1L, i)) <> 0L)"))
      .localCheckpoint()
    // Equi-join shape (r11): explode each mask row's set-bit list — ≤S
    // sids and ≤S(S−1)/2 (sa,sb) pairs per row — hash-aggregate, then
    // broadcast-join the S-row dim. No bit-test join predicates, hence
    // no BroadcastNestedLoopJoin anywhere (PlanAuditSpec pins 0).
    val sizes = masks.select(explode(col("sids")).as("sid"), col("cnt"))
      .groupBy("sid").agg(sum("cnt").as("n_sh"))
      .join(broadcast(dim), Seq("sid"))
      .select(col("source"), col("n_sh"))
    masks.select(col("cnt"), explode(expr(
        "flatten(transform(sids, a -> transform(filter(sids, b -> b > a)," +
          " b -> struct(a AS sa, b AS sb))))")).as("p"))
      .groupBy(col("p.sa").as("sa"), col("p.sb").as("sb"))
      .agg(sum("cnt").as("n_shared"))
      .join(broadcast(dim.toDF("source_a", "sa")), Seq("sa"))
      .join(broadcast(dim.toDF("source_b", "sb")), Seq("sb"))
      .join(broadcast(sizes.toDF("source_a", "n_a")), Seq("source_a"))
      .join(broadcast(sizes.toDF("source_b", "n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        expr("(n_shared * 1000000L) div (n_a + n_b - n_shared)").as("jaccard_u"))
  }

  /** The pre-r10 self-join form — kept as the >63-source fallback and
    * the equality witness for SourceOverlapSpec.
    */
  private[analytics] def sourceOverlapJoin(pairsIn: DataFrame): DataFrame = {
    val ss = pairsIn.distinct()
    val sizes = ss.groupBy("source").agg(count(lit(1)).as("n_sh"))
    ss.toDF("source_a", "sh")
      .join(ss.toDF("source_b", "sh2"), col("sh") === col("sh2") &&
        col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.toDF("source_a", "n_a")), Seq("source_a"))
      .join(broadcast(sizes.toDF("source_b", "n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        expr("(n_shared * 1000000L) div (n_a + n_b - n_shared)").as("jaccard_u"))
  }

  private val sourceOverlapSql =
    """WITH ws AS (
      |  SELECT source,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |),
      |ss AS (
      |  SELECT DISTINCT source,
      |    unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM ws WHERE len(w) >= 3
      |),
      |sizes AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY 1),
      |shared AS (
      |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
      |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT source_a, source_b, sa.n_sh AS n_a, sb.n_sh AS n_b, n_shared,
      |  (n_shared * 1000000) // (sa.n_sh + sb.n_sh - n_shared) AS jaccard_u
      |FROM shared
      |JOIN sizes sa ON sa.source = shared.source_a
      |JOIN sizes sb ON sb.source = shared.source_b""".stripMargin

  // ---------------------------------------------------------------- q113
  /** Positional skip-gram co-occurrence — the word2vec/GloVe training
    * prep: count (center, context) pairs within a ±`window` WORD
    * distance, the position-level complement of q79's document-level
    * PMI pairs (q79 asks "do these terms appear in the same docs?",
    * this asks "do they appear NEXT TO each other?").
    *
    * Scale shape: the window join is a pure EQUI-join — each token row
    * explodes into `window` (doc, pos+k) probe keys, so work is exactly
    * tokens·window with no per-document quadratic residual (the naive
    * `0 < b.pos − a.pos ≤ w` band join degenerates on long documents).
    * Counts then collapse to the pair vocabulary, and the top-k window
    * runs over that vocabulary-sized table. Ordered pairs (left term,
    * right term, so (a,b) ≠ (b,a)) keep every count engine-exact.
    */
  def skipgramPairs(spark: SparkSession, dir: String, window: Int = 3,
                    k: Int = 50): DataFrame = {
    val pt = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.shingleStrings(col("text"), 1))
          .as(Seq("pos", "term")))
    val probes = pt
      .withColumn("off", explode(sequence(lit(1), lit(window))))
      .select(col("doc_id"), col("term").as("term_a"),
        (col("pos") + col("off")).as("pos_b"))
    val counts = probes
      .join(pt.toDF("doc_id", "pos_b", "term_b"), Seq("doc_id", "pos_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("n_cooc"))
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_cooc").desc, col("term_a"), col("term_b"))))
      .filter(col("rank") <= k)
      .select("rank", "term_a", "term_b", "n_cooc")
  }

  private val skipgramPairsSql =
    """WITH ws AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
      |  FROM documents
      |),
      |pt AS (
      |  SELECT doc_id, s.pos AS pos, s.term AS term
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(1, len(w) + 1),
      |            i -> struct_pack(pos := i, term := w[i]))) AS s
      |        FROM ws)
      |),
      |counts AS (
      |  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_cooc
      |  FROM pt a
      |  JOIN pt b ON b.doc_id = a.doc_id
      |    AND b.pos > a.pos AND b.pos <= a.pos + 3
      |  GROUP BY 1, 2
      |)
      |SELECT rank, term_a, term_b, n_cooc FROM (
      |  SELECT term_a, term_b, CAST(n_cooc AS BIGINT) AS n_cooc,
      |    CAST(row_number() OVER (
      |      ORDER BY n_cooc DESC, term_a, term_b) AS INTEGER) AS rank
      |  FROM counts) t
      |WHERE rank <= 50""".stripMargin

  // ---------------------------------------------------------------- q109
  /** Per-source lexical-diversity profile: token/type/hapax counts,
    * type-token ratio, hapax share, and unigram Shannon entropy — the
    * one-line-per-slice "how varied is this text?" summary an engineer
    * reads next to q14's quality scores when weighing corpus slices
    * (low entropy + low TTR = template/boilerplate-heavy slice).
    *
    * Entropy is Σ −p·ln p over the source's unigram distribution, each
    * term's contribution floored to integer nano-nats (the q108
    * discipline) so the per-source sum is order-independent and
    * engine-identical; TTR and hapax share are integer micro-units.
    *
    * Scale shape: one corpus scan → (source, term) counts; every later
    * step aggregates that vocabulary-sized table. No windows, no joins
    * beyond a broadcast of per-source totals.
    */
  def sourceDiversity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir).select(col("source"),
      explode(graft.functions.shingleStrings(col("text"), 1)).as("term"))
    // One corpus scan: the count table is checkpointed (it feeds both the
    // entropy terms and the totals), and totals fold out of it rather
    // than re-aggregating the token stream.
    val cst = toks.groupBy("source", "term").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val totals = cst.groupBy("source").agg(sum("c").as("n_tok"))
    val p = col("c").cast("double") / col("n_tok").cast("double")
    cst
      .join(broadcast(totals), Seq("source"))
      .withColumn("term_nn", floor(-(p * log(p)) * lit(1000000000.0) +
        lit(0.5)).cast("long"))
      .groupBy("source")
      .agg(first(col("n_tok")).as("n_tok"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum("term_nn").as("entropy_nanonats"))
      .select(col("source"), col("n_tok"), col("n_types"), col("n_hapax"),
        expr("(n_types * 1000000) div n_tok").as("ttr_micro"),
        expr("(n_hapax * 1000000) div n_types").as("hapax_micro"),
        col("entropy_nanonats"))
  }

  private val sourceDiversitySql =
    """WITH toks AS (
      |  SELECT source,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                       x -> x <> '')) AS term
      |  FROM documents
      |),
      |cst AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
      |totals AS (SELECT source, count(*) AS n_tok FROM toks GROUP BY 1),
      |terms AS (
      |  SELECT cst.source, c, n_tok,
      |    CAST(floor(-((c::DOUBLE / n_tok::DOUBLE) *
      |      ln(c::DOUBLE / n_tok::DOUBLE))
      |      * 1000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS term_nn
      |  FROM cst JOIN totals ON totals.source = cst.source
      |)
      |SELECT source, CAST(n_tok AS BIGINT) AS n_tok,
      |  CAST(count(*) AS BIGINT) AS n_types,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  CAST((count(*) * 1000000) // n_tok AS BIGINT) AS ttr_micro,
      |  CAST((sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000) // count(*)
      |    AS BIGINT) AS hapax_micro,
      |  CAST(sum(term_nn) AS BIGINT) AS entropy_nanonats
      |FROM terms GROUP BY source, n_tok""".stripMargin

  // ---------------------------------------------------------------- q108
  /** Pairwise Jensen–Shannon divergence between source unigram
    * distributions — the DISTRIBUTIONAL drift matrix next to q83's
    * set-overlap matrix: q83 asks "do these slices share content?",
    * this asks "do they use language the same way?" (0 = identical
    * usage, ln 2 ≈ 0.693 = disjoint). The matrix an engineer reads
    * before mixture-weighting (q51) or domain-balancing a corpus.
    *
    * Definition: add-one smoothing over the GLOBAL vocabulary V, so
    * p_t = (c1_t+1)/(n1+|V|), q_t = (c2_t+1)/(n2+|V|), and
    * JSD = Σ_t [p·ln(2p/(p+q)) + q·ln(2q/(p+q))] / 2 — we emit the
    * un-halved sum so the disjoint ceiling is 2·ln 2.
    *
    * Exactness (the q77/q79 ln discipline): each term's contribution is
    * ONE fixed double-op sequence over cast integer counts, floored to
    * integer NANO-nats per term; the pair's divergence is then a sum of
    * integers — order-independent and engine-identical.
    *
    * Scale shape: the corpus collapses to its (source, term) count
    * table in one scan; everything after lives on the S²·|V| grid —
    * vocabulary-sized work (the vocabulary, not the corpus), with the
    * source-count/total tables broadcast. At 100 TB the corpus is read
    * once; S is dozens, V is machine-sized.
    */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir).select(col("source"),
      explode(graft.functions.shingleStrings(col("text"), 1)).as("term"))
    // The count table is the hub of the whole grid (joined for c1, c2,
    // and reduced to vocab/totals) — checkpoint it so the corpus is
    // scanned exactly once, and derive totals from it instead of
    // re-aggregating the token stream.
    val cst = toks.groupBy("source", "term").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val totals = cst.groupBy("source").agg(sum("c").as("n_tok"))
    val vocab = cst.select("term").distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val srcs = totals.select(col("source"))
    val pairs = srcs.toDF("source_a")
      .crossJoin(srcs.toDF("source_b"))
      .filter(col("source_a") < col("source_b"))
    val grid = broadcast(pairs).crossJoin(vocab)
      .join(cst.toDF("source_a", "term", "c1"), Seq("source_a", "term"), "left")
      .join(cst.toDF("source_b", "term", "c2"), Seq("source_b", "term"), "left")
      .join(broadcast(totals.toDF("source_a", "n1")), Seq("source_a"))
      .join(broadcast(totals.toDF("source_b", "n2")), Seq("source_b"))
      .crossJoin(broadcast(vSize))
      .select(col("source_a"), col("source_b"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"),
        col("n1"), col("n2"), col("v"))
    val p = (col("c1") + 1).cast("double") / (col("n1") + col("v")).cast("double")
    val q = (col("c2") + 1).cast("double") / (col("n2") + col("v")).cast("double")
    val contrib =
      p * log((lit(2.0) * p) / (p + q)) + q * log((lit(2.0) * q) / (p + q))
    grid
      .withColumn("term_nn",
        floor(contrib * lit(1000000000.0) + lit(0.5)).cast("long"))
      .withColumn("shared", (col("c1") > 0 && col("c2") > 0).cast("long"))
      .groupBy("source_a", "source_b")
      .agg(sum("shared").as("n_shared_terms"),
        sum("term_nn").as("jsd_nanonats"))
  }

  private val sourceDivergenceSql =
    """WITH toks AS (
      |  SELECT source,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                       x -> x <> '')) AS term
      |  FROM documents
      |),
      |cst AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
      |totals AS (SELECT source, count(*) AS n_tok FROM toks GROUP BY 1),
      |vocab AS (SELECT DISTINCT term FROM cst),
      |vs AS (SELECT count(*) AS v FROM vocab),
      |pairs AS (
      |  SELECT a.source AS source_a, b.source AS source_b
      |  FROM totals a, totals b WHERE a.source < b.source
      |),
      |grid AS (
      |  SELECT p.source_a, p.source_b,
      |    coalesce(ca.c, 0) AS c1, coalesce(cb.c, 0) AS c2,
      |    ta.n_tok AS n1, tb.n_tok AS n2, vs.v
      |  FROM pairs p
      |  CROSS JOIN vocab t
      |  CROSS JOIN vs
      |  LEFT JOIN cst ca ON ca.source = p.source_a AND ca.term = t.term
      |  LEFT JOIN cst cb ON cb.source = p.source_b AND cb.term = t.term
      |  JOIN totals ta ON ta.source = p.source_a
      |  JOIN totals tb ON tb.source = p.source_b
      |),
      |pq AS (
      |  SELECT source_a, source_b,
      |    CASE WHEN c1 > 0 AND c2 > 0 THEN 1 ELSE 0 END AS shared,
      |    (c1 + 1)::DOUBLE / (n1 + v)::DOUBLE AS p,
      |    (c2 + 1)::DOUBLE / (n2 + v)::DOUBLE AS q
      |  FROM grid
      |),
      |terms AS (
      |  SELECT source_a, source_b, shared,
      |    CAST(floor(
      |      (p * ln((2.0::DOUBLE * p) / (p + q)) +
      |       q * ln((2.0::DOUBLE * q) / (p + q)))
      |      * 1000000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS term_nn
      |  FROM pq
      |)
      |SELECT source_a, source_b,
      |  CAST(sum(shared) AS BIGINT) AS n_shared_terms,
      |  CAST(sum(term_nn) AS BIGINT) AS jsd_nanonats
      |FROM terms GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Unicode canonicalization audit over the corpus — drives the native
    * [[graft.functions.NfcClean]] kernel (NFC compose + control-strip +
    * blank-collapse + trim; the canonicalization every dedup/fingerprint
    * pass needs FIRST, or byte-different canonically-equal strings defeat
    * exact hashing). Per row the scan is map-only work — no shuffle at
    * all until Verify's write; at 100 TB this is the cheapest possible
    * plan shape (one pass, zero exchanges).
    *
    * The corpus text is (synthetic) ASCII, where NFC is the identity —
    * so each row also canonicalizes a deterministically-chosen MESSY
    * fixture (decomposed accents, Hangul jamo, strippable controls, tab
    * runs, pad spaces) spliced with that row's text, and the oracle
    * rebuilds the identical input from codepoints and re-cleans it with
    * DuckDB's own `nfc_normalize` + RE2 pipeline. Full value-hash gate:
    * any divergence in composition, stripping, collapsing, or trimming
    * flips the string and fails the hash.
    */
  private val nfcFixtures: Seq[String] = Seq(
    "  cafe\u0301  du\tmonde",     // decomposed e+acute; pad + tab + run
    "A\u030Angstro\u0308m unit",   // decomposed ring/diaeresis
    "ctl\u0001chars\u0007here",    // strippable C0 controls
    "tabs\t\tand  runs",           // blank runs
    "\u1100\u1161\u11A8 hangul",  // jamo sequence -> precomposed syllable
    "already clean")

  /** Renders a string as a `chr(cp) || ...` DuckDB expression — the
    * fixture reaches the oracle as CODEPOINTS, immune to any SQL-literal
    * escaping ambiguity for controls/combining marks.
    */
  private def chrLit(s: String): String =
    s.codePoints().toArray.map(cp => s"chr($cp)").mkString("(", " || ", ")")

  def nfcCleanAudit(spark: SparkSession, dir: String): DataFrame = {
    val fixtureArr = array(nfcFixtures.map(lit): _*)
    val k = nfcFixtures.size
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % k).cast("int").as("variant"),
        col("text"))
      .withColumn("messy",
        concat(element_at(fixtureArr, col("variant") + 1), lit(" "),
          substring(col("text"), 1, 24)))
      .select(col("doc_id"), col("variant"),
        graft.functions.nfcClean(col("messy")).as("cleaned"),
        length(col("messy")).as("len_raw"),
        length(graft.functions.nfcClean(col("messy"))).as("len_clean"),
        length(graft.functions.nfcClean(col("text"))).as("text_clean_len"))
  }

  private val nfcCleanAuditSql = {
    val fixList = nfcFixtures.map(chrLit).mkString("[", ", ", "]")
    s"""WITH base AS (
       |  SELECT doc_id, CAST(doc_id % ${nfcFixtures.size} AS INT) AS variant,
       |    $fixList[CAST(doc_id % ${nfcFixtures.size} AS INT) + 1]
       |      || ' ' || substring(text, 1, 24) AS messy,
       |    text
       |  FROM documents
       |), cleaned AS (
       |  SELECT doc_id, variant, messy,
       |    trim(regexp_replace(regexp_replace(nfc_normalize(messy),
       |      '[\\x01-\\x08\\x0B-\\x1F\\x7F]', '', 'g'), '[ \\t]+', ' ', 'g'))
       |      AS cleaned,
       |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
       |      '[\\x01-\\x08\\x0B-\\x1F\\x7F]', '', 'g'), '[ \\t]+', ' ', 'g'))
       |      AS text_clean
       |  FROM base
       |)
       |SELECT doc_id, variant, cleaned,
       |  CAST(length(messy) AS INT) AS len_raw,
       |  CAST(length(cleaned) AS INT) AS len_clean,
       |  CAST(length(text_clean) AS INT) AS text_clean_len
       |FROM cleaned""".stripMargin
  }

  // ---------------------------------------------------------------- q96
  /** Fuzzy vocabulary pairs — entity-resolution-shaped blocked fuzzy
    * join: all DISTINCT token pairs within edit distance 1, found via
    * blocking + verify instead of a vocab² nested loop. The blocking is
    * EXACT-recall for lev ≤ 1: one edit between strings not both of
    * length 1 leaves the first or the last character untouched, so
    * every qualifying pair collides in a (first-char, len-window) or
    * (last-char, len-window) block — the length window is {len, len+1}
    * emitted per token, which catches Δlen = 1 pairs — and the single
    * residual case (two length-1 tokens) gets one tiny dedicated block.
    * Work ∝ Σ block² over vocab-sized blocks, never corpus² or vocab²;
    * verification is the codegen'd `levenshtein` on candidates only.
    */
  def fuzzyTokenPairs(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(explode(graft.functions.shingleStrings(col("text"), 1)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    // The synthetic corpus vocabulary has no genuine edit-distance-1
    // pairs, so the gate would pass vacuously on zero rows. Augment it
    // with a deterministic TYPO set — drop-first / drop-last variants of
    // every token of length ≥ 4, at weight 0 — which both engines derive
    // identically; every variant pairs with its source (and often with
    // other tokens: park/part), so the blocking and verify paths are
    // exercised on real matches.
    val longTok = base.filter(length(col("t")) >= 4)
    val vocab = base
      .unionAll(longTok.select(expr("substring(t, 2)").as("t"), lit(0L).as("n")))
      .unionAll(longTok.select(
        expr("substring(t, 1, length(t) - 1)").as("t"), lit(0L).as("n")))
      .groupBy("t").agg(sum("n").as("n"))
    val v = vocab.select(col("t"), length(col("t")).as("len"))
    def block(tag: String, part: Column, lenCol: Column) =
      v.select(col("t"),
        concat_ws("|", lit(tag), part, lenCol.cast("string")).as("bkey"))
    val blocks =
      block("F", substring(col("t"), 1, 1), col("len"))
        .unionAll(block("F", substring(col("t"), 1, 1), col("len") + 1))
        .unionAll(block("L", substring(col("t"), -1, 1), col("len")))
        .unionAll(block("L", substring(col("t"), -1, 1), col("len") + 1))
        .unionAll(v.filter(col("len") === 1)
          .select(col("t"), lit("S").as("bkey")))
    CandidateJoin.pairs(blocks, "t", Seq("bkey"), maxBucketSize = None)
      .distinct()
      .filter(levenshtein(col("a_id"), col("b_id")) <= 1)
      .join(vocab.select(col("t").as("a_id"), col("n").as("n_t1")), Seq("a_id"))
      .join(vocab.select(col("t").as("b_id"), col("n").as("n_t2")), Seq("b_id"))
      .select(col("a_id").as("t1"), col("b_id").as("t2"),
        col("n_t1"), col("n_t2"))
  }

  private val fuzzyTokenPairsSql =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x <> '')) AS t
      |  FROM documents
      |), base AS (
      |  SELECT t, count(*) AS n FROM toks GROUP BY t
      |), vocab AS (
      |  SELECT t, sum(n) AS n FROM (
      |    SELECT t, n FROM base
      |    UNION ALL
      |    SELECT substring(t, 2) AS t, 0 AS n FROM base WHERE length(t) >= 4
      |    UNION ALL
      |    SELECT substring(t, 1, length(t) - 1) AS t, 0 AS n
      |    FROM base WHERE length(t) >= 4
      |  ) GROUP BY t
      |), v AS (
      |  SELECT t, length(t) AS len FROM vocab
      |), blocks AS (
      |  SELECT t, 'F|' || substring(t, 1, 1) || '|' || len AS bkey FROM v
      |  UNION ALL
      |  SELECT t, 'F|' || substring(t, 1, 1) || '|' || (len + 1) FROM v
      |  UNION ALL
      |  SELECT t, 'L|' || substring(t, -1, 1) || '|' || len FROM v
      |  UNION ALL
      |  SELECT t, 'L|' || substring(t, -1, 1) || '|' || (len + 1) FROM v
      |  UNION ALL
      |  SELECT t, 'S' FROM v WHERE len = 1
      |), cand AS (
      |  SELECT DISTINCT x.t AS t1, y.t AS t2
      |  FROM blocks x JOIN blocks y ON x.bkey = y.bkey AND x.t < y.t
      |)
      |SELECT t1, t2, CAST(va.n AS BIGINT) AS n_t1, CAST(vb.n AS BIGINT) AS n_t2
      |FROM cand
      |JOIN vocab va ON va.t = cand.t1
      |JOIN vocab vb ON vb.t = cand.t2
      |WHERE levenshtein(t1, t2) <= 1""".stripMargin

  // --------------------------------------------------------------- q119
  /** Boilerplate POSITION coverage — the removal-accounting counterpart
    * to q53's window-pair detection: a window of `w` tokens whose text
    * recurs in ≥ `minSources` distinct SOURCES is template boilerplate
    * (cross-source recurrence separates site furniture from legitimate
    * within-source quotation), and the number a curation pipeline needs
    * is how much of each document boilerplate REMOVAL would delete.
    * Window-count ratios (q53's dup_ratio) overstate that: overlapping
    * duplicated windows double-count tokens. This operator unions the
    * covered token POSITIONS — each flagged window at start p covers
    * p..p+w−1; distinct-counting positions gives the exact removable
    * fraction, reported in integer millis.
    *
    * Plan: one scan → in-order window explode (position = posexplode
    * index, the shingle kernel keeps duplicates) → window-text hash agg
    * (distinct sources) → equi-join flagged windows back → per-window
    * position explode (w small, map-side) → per-doc distinct-position
    * count. At 100 TB the join key becomes the 64-bit shingle hash and
    * the flagged-window table broadcasts (boilerplate vocabularies are
    * tiny relative to the corpus — Zipf again).
    */
  def boilerplateCoverage(docs: DataFrame, w: Int = 8, minSources: Int = 3,
                          idCol: String = "doc_id", textCol: String = "text",
                          srcCol: String = "source"): DataFrame = {
    val wins = docs.select(col(idCol), col(srcCol),
      size(tokens(col(textCol))).as("n_tokens"),
      posexplode_outer(graft.functions.shingleStrings(col(textCol), w))
        .as(Seq("p", "win")))
    val boiler = wins.filter(col("win").isNotNull)
      .groupBy("win")
      .agg(countDistinct(col(srcCol)).as("ns"))
      .filter(col("ns") >= minSources)
      .select("win")
    val covered = wins
      .join(boiler, Seq("win"))
      .select(col(idCol), explode(sequence(col("p"), col("p") + (w - 1))).as("pos"))
      .groupBy(idCol)
      .agg(countDistinct(col("pos")).as("n_cov"))
    docs.select(col(idCol), size(tokens(col(textCol))).as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_cov"), lit(0L)).as("n_cov"),
        when(col("n_tokens") > 0,
          expr("(1000 * coalesce(n_cov, CAST(0 AS BIGINT))) div n_tokens"))
          .otherwise(lit(0L)).as("cov_millis"))
  }

  /** Gated q119: per-document boilerplate coverage over the documents
    * corpus (8-token windows, ≥3 distinct sources). Integer-exact — the
    * covered-position count and the millis division have no float path.
    */
  def boilerplateCoverageDocs(spark: SparkSession, dir: String): DataFrame =
    boilerplateCoverage(Tables.documents(spark, dir))

  private val boilerplateCoverageSql = {
    val w = 8
    val gram = (0 until w).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents
       |), ws AS (
       |  SELECT doc_id, source, toks,
       |    unnest(generate_series(1, len(toks)-${w - 1})) AS i
       |  FROM toks
       |), wins AS (
       |  SELECT doc_id, source, i - 1 AS p, $gram AS win FROM ws
       |), boiler AS (
       |  SELECT win FROM wins GROUP BY win HAVING count(DISTINCT source) >= 3
       |), cov AS (
       |  SELECT w.doc_id, count(DISTINCT w.p + o.o) AS n_cov
       |  FROM wins w JOIN boiler b USING (win),
       |       (SELECT unnest(range(0, $w)) AS o) o
       |  GROUP BY 1
       |)
       |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(c.n_cov, 0) AS BIGINT) AS n_cov,
       |  CAST(CASE WHEN len(t.toks) > 0
       |       THEN (1000 * coalesce(c.n_cov, 0)) // len(t.toks)
       |       ELSE 0 END AS BIGINT) AS cov_millis
       |FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q225
  /** Dedup-rate growth curve — the duplication SCALING LAW probe: the
    * exact-dup rate of a corpus is not a constant, it GROWS with corpus
    * size (more chances to collide), so the rate measured on a pilot
    * sample understates what the full crawl will carry. Measure it on
    * NESTED deterministic samples (25% ⊂ 50% ⊂ 100% by an md5 channel)
    * in one pass and read the trend directly — the planning number for
    * "how much dedup capacity does the 10× crawl need?".
    *
    * One-pass nesting trick: per fingerprint, keep min(u) and the
    * conditional doc counts; a fingerprint is PRESENT in sample level t
    * iff min(u) < t, so every level's (n, distinct, dupes) falls out of
    * the same fingerprint-grain aggregate — the corpus is scanned once
    * for all three levels. All counts exact BIGINT; rates exact
    * truncating ppm.
    *
    * Scale shape: corpus scan → fingerprint-grain hash agg (the q15
    * kernel's shuffle) → 3-row rollup.
    */
  def dedupGrowth(docs: DataFrame): DataFrame = {
    val u = conv(substring(md5(concat(lit("smp:"),
      col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % 1000000L
    val perFp = docs
      .select(fingerprint(col("text")).as("fp"), u.as("u"))
      .groupBy("fp")
      .agg(min("u").as("min_u"),
        sum(when(col("u") < 250000L, 1L).otherwise(0L)).as("c25"),
        sum(when(col("u") < 500000L, 1L).otherwise(0L)).as("c50"),
        count(lit(1)).as("c100"))
    // One rollup row carries all three levels, then a 3-row stack — the
    // fingerprint aggregate (and the corpus scan under it) runs ONCE.
    perFp.agg(
        sum("c25").as("n25"),
        sum(when(col("min_u") < 250000L, 1L).otherwise(0L)).as("d25"),
        sum("c50").as("n50"),
        sum(when(col("min_u") < 500000L, 1L).otherwise(0L)).as("d50"),
        sum("c100").as("n100"),
        count(lit(1)).as("d100"))
      .select(expr(
        """stack(3, 25L, n25, d25, 50L, n50, d50, 100L, n100, d100)
          | AS (level_pct, n_docs, n_distinct)""".stripMargin))
      .withColumn("n_dupes", col("n_docs") - col("n_distinct"))
      .withColumn("dup_ppm", expr("(1000000 * n_dupes) div n_docs"))
  }

  def dedupGrowthGate(spark: SparkSession, dir: String): DataFrame =
    dedupGrowth(Tables.documents(spark, dir))

  private val dedupGrowthSql =
    """WITH d AS (
      |  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS u
      |  FROM documents
      |),
      |perfp AS (
      |  SELECT fp, min(u) AS min_u,
      |    sum(CASE WHEN u < 250000 THEN 1 ELSE 0 END) AS c25,
      |    sum(CASE WHEN u < 500000 THEN 1 ELSE 0 END) AS c50,
      |    count(*) AS c100
      |  FROM d GROUP BY 1
      |),
      |lv AS (
      |  SELECT 25 AS level_pct, sum(c25) AS n_docs,
      |    sum(CASE WHEN min_u < 250000 THEN 1 ELSE 0 END) AS n_distinct
      |  FROM perfp
      |  UNION ALL
      |  SELECT 50, sum(c50),
      |    sum(CASE WHEN min_u < 500000 THEN 1 ELSE 0 END)
      |  FROM perfp
      |  UNION ALL
      |  SELECT 100, sum(c100),
      |    sum(CASE WHEN min_u < 1000000 THEN 1 ELSE 0 END)
      |  FROM perfp
      |)
      |SELECT CAST(level_pct AS BIGINT) AS level_pct,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_distinct AS BIGINT) AS n_distinct,
      |  CAST(n_docs - n_distinct AS BIGINT) AS n_dupes,
      |  CAST((1000000 * (n_docs - n_distinct)) // n_docs AS BIGINT) AS dup_ppm
      |FROM lv""".stripMargin

  // --------------------------------------------------------------- q159
  /** Per-document bigram cross-entropy under the corpus's own add-one-
    * smoothed bigram language model — the perplexity-style quality
    * filter LLM curation pipelines run (CCNet/RedPajama gate on LM
    * perplexity; an n-gram LM is its warehouse-native, training-free
    * form): documents whose token transitions are improbable under the
    * corpus model (boilerplate salad, OCR noise, wrong-language
    * fragments) score high and get culled.
    *
    * Model: P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V), V = corpus unigram
    * vocabulary. Per-bigram surprisal −ln P is ONE ln over a cast-
    * to-double ratio of exact integers, floored to integer micro-nats
    * (the q77/q79 discipline), so each document's total is an
    * order-independent BIGINT sum and the mean is a truncating integer
    * division — engine-exact end to end.
    *
    * Scale shape: one bigram explode (corpus-linear), two hash aggs to
    * the bigram/context count tables, one vocab scalar, and a model
    * equi-join back to the bigram stream — no pair space, no corpus
    * self-join; the model tables are vocabulary-sized, never
    * corpus-sized.
    */
  def bigramCrossEntropyOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    val big = toks
      .select(col("doc_id"), explode(expr(
        "transform(slice(t, 1, size(t) - 1)," +
          " (w, i) -> struct(w AS w1, element_at(t, i + 2) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("t")).as("w")).agg(
      count_distinct(col("w")).as("v"))
    val model = c12.join(c1, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        floor(log((col("c1") + col("v")).cast("double") /
          (col("c12") + 1L).cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("surprisal_unats"))
    big.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("surprisal_unats").as("xent_sum_unats"))
      .withColumn("xent_mean_unats",
        expr("xent_sum_unats div n_bigrams"))
  }

  def bigramCrossEntropy(spark: SparkSession, dir: String): DataFrame =
    bigramCrossEntropyOf(Tables.documents(spark, dir))

  private val bigramCrossEntropySql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(str_split(text, ' '), w -> len(w) > 0) AS t
      |  FROM documents
      |), big AS (
      |  SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
      |  FROM t, (SELECT unnest(range(1, 100000)) AS i) i
      |  WHERE i.i < len(t)
      |), c12 AS (
      |  SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2
      |), c1 AS (
      |  SELECT w1, count(*) AS c1 FROM big GROUP BY 1
      |), v AS (
      |  SELECT count(DISTINCT w) AS v
      |  FROM (SELECT unnest(t) AS w FROM t)
      |), model AS (
      |  SELECT c12.w1, c12.w2,
      |    CAST(floor(ln(CAST(c1.c1 + v.v AS DOUBLE)
      |      / CAST(c12.c12 + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      |      AS surprisal_unats
      |  FROM c12 JOIN c1 USING (w1), v
      |)
      |SELECT b.doc_id, count(*) AS n_bigrams,
      |  CAST(sum(m.surprisal_unats) AS BIGINT) AS xent_sum_unats,
      |  CAST(sum(m.surprisal_unats) // count(*) AS BIGINT) AS xent_mean_unats
      |FROM big b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
      |GROUP BY 1""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q159_bigram_xent", bigramCrossEntropy _,
      Some(bigramCrossEntropySql)),
    NamedQuery("q119_boilerplate_coverage", boilerplateCoverageDocs _,
      Some(boilerplateCoverageSql)),
    NamedQuery("q13_token_stats", tokenStats _, Some(tokenStatsSql)),
    NamedQuery("q96_fuzzy_token_pairs", fuzzyTokenPairs _,
      Some(fuzzyTokenPairsSql)),
    NamedQuery("q14_lang_quality", langQuality _, Some(langQualitySql)),
    NamedQuery("q15_exact_dedup", exactDedup _, Some(exactDedupSql)),
    NamedQuery("q16_jaccard_pairs", jaccardPairs _, Some(jaccardPairsSql)),
    NamedQuery("q235_ngram_repetition", ngramRepetitionProfile _, Some(repetitionSql)),
    NamedQuery("q43_repetition_quality", repetitionQuality _, Some(repetitionQualitySql)),
    NamedQuery("q46_tfidf_terms", (s, d) => tfIdfTopTerms(s, d), Some(tfIdfTopTermsSql)),
    NamedQuery("q54_vocab_coverage", vocabCoverageByLang _, Some(vocabCoverageSql)),
    NamedQuery("q58_heavy_tokens", heavyTokens _, Some(heavyTokensSql)),
    NamedQuery("q77_token_salience", (s, d) => tokenSalience(s, d), Some(tokenSalienceSql)),
    NamedQuery("q79_pmi_pairs", (s, d) => pmiPairs(s, d), Some(pmiPairsSql)),
    NamedQuery("q83_source_overlap", (s, d) => sourceOverlap(s, d), Some(sourceOverlapSql)),
    NamedQuery("q108_source_divergence", sourceDivergence _,
      Some(sourceDivergenceSql)),
    NamedQuery("q109_source_diversity", sourceDiversity _,
      Some(sourceDiversitySql)),
    NamedQuery("q113_skipgram_pairs", (s, d) => skipgramPairs(s, d),
      Some(skipgramPairsSql)),
    NamedQuery("q90_nfc_clean", nfcCleanAudit _, Some(nfcCleanAuditSql)),
    // shingleNoveltySql is a lazy val: this Seq sits above the q124
    // definitions, and an eager val would capture null during object
    // init (object vals initialize in declaration order).
    NamedQuery("q124_ngram_novelty", shingleNovelty _, Some(shingleNoveltySql)),
    NamedQuery("q130_bpe_pair_stats", (s, d) => bpePairStats(s, d),
      Some(bpePairStatsSql)),
    NamedQuery("q137_vocab_growth", vocabGrowthDocs _, Some(vocabGrowthSql)),
    NamedQuery("q208_good_turing", goodTuringProfile _, Some(goodTuringSql)),
    NamedQuery("q219_chao1_richness", richnessEstimate _, Some(richnessSql)),
    NamedQuery("q222_coverage_curve", coverageCurveGate _,
      Some(coverageCurveSql)),
    NamedQuery("q225_dedup_growth", dedupGrowthGate _, Some(dedupGrowthSql)),
    NamedQuery("q211_zipf_slope", zipfSlope _, Some(zipfSlopeSql)),
    NamedQuery("q241_gopher_quality", gopherQualityProfile _,
      Some(gopherQualitySql)),
    NamedQuery("q245_readability", readabilityProfile _,
      Some(readabilitySql)),
    NamedQuery("q247_rake_keywords", rakeTopPhrases _, Some(rakeSql)))

  // --------------------------------------------------------------- q130
  /** BPE merge-candidate statistics — the inner loop of byte-pair-encoding
    * tokenizer training (Sennrich, Haddow & Birch, ACL'16): over the
    * corpus word-frequency table, count adjacent symbol pairs weighted by
    * word frequency; the top-ranked pair IS the next BPE merge. The
    * operator exposes the full ranked pair table (top `topK`) so the
    * choice is auditable; iterating merges re-runs this over re-segmented
    * words with the driver holding only the merge list (vocab-sized, not
    * corpus-sized).
    *
    * Round-0 symbols are single characters; words are restricted to
    * lowercase `[a-z]+` so the pair space is the classic alphabetic BPE
    * setup (and exactly codepoint-parity across engines).
    *
    * Scale shape: the corpus collapses to its word-frequency table in one
    * hash aggregate (vocab-sized from then on — the corpus is never
    * touched again, however many merge rounds run); pair explode and
    * re-aggregate are vocab-linear; the ranking window orders the
    * pair-count table, bounded by 26² regardless of corpus size.
    */
  def bpePairStats(spark: SparkSession, dir: String, topK: Int = 20): DataFrame =
    bpePairStats(Tables.documents(spark, dir), topK)

  def bpePairStats(docs: DataFrame, topK: Int): DataFrame = {
    val words = docs
      .select(explode(tokens(col("text"))).as("t"))
      .select(lower(col("t")).as("w"))
      .where(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val pairs = words.select(col("w"), col("n_w"),
      explode(expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"))
    val agg = pairs.groupBy("pair").agg(
      sum(col("n_w")).as("total_count"),
      countDistinct(col("w")).as("n_words"))
    // 26²-bounded table — the global ranking window is not a corpus sort.
    val rw = Window.orderBy(col("total_count").desc, col("pair"))
    agg.withColumn("rank", row_number().over(rw).cast("int"))
      .where(col("rank") <= topK)
      .select(col("rank"), col("pair"), col("n_words"), col("total_count"))
  }

  // --------------------------------------------------------------- q137
  /** Heaps-law vocabulary growth curve — cumulative token and distinct-
    * vocabulary counts at fixed doc-count checkpoints (doc-id order),
    * plus the type-token ratio in ppm. The corpus-health measurement
    * behind "is more data still adding vocabulary": vocab_cum flattening
    * against tokens_cum says the source is exhausted (Heaps' law
    * V ≈ K·nᵝ, reported as the raw curve — fitting β is a driver-side
    * two-point log ratio if wanted, never an engine concern).
    *
    * Scale shape: cumulative-distinct is the q124 trick — a token's
    * checkpoint of FIRST occurrence (min doc_id) is a hash aggregate, so
    * "distinct tokens by checkpoint c" = Σ new_vocab over cp ≤ c. Both
    * cumulative sums ride the CHECKPOINT table (corpus_size / CkptDocs
    * rows); the corpus shuffles only for the two keyed aggregates. No
    * window ever sees a corpus-sized partition.
    */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    // ceil(doc/C) in INTEGER arithmetic (Column./ would promote to double).
    def cpOf(c: String): Column =
      expr(s"CAST(($c + ${CkptDocs - 1}) DIV $CkptDocs AS BIGINT)")
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val perCp = tok.groupBy(cpOf("doc_id").as("cp"))
      .agg(count(lit(1)).as("toks"), countDistinct(col("doc_id")).as("docs"))
    val newVocab = tok.groupBy("t").agg(min(col("doc_id")).as("first_doc"))
      .groupBy(cpOf("first_doc").as("cp"))
      .agg(count(lit(1)).as("new_vocab"))
    val w = Window.orderBy("cp").rowsBetween(Window.unboundedPreceding, 0)
    perCp.join(newVocab, Seq("cp"), "left")
      .withColumn("docs_cum", sum(col("docs")).over(w))
      .withColumn("tokens_cum", sum(col("toks")).over(w))
      .withColumn("vocab_cum", sum(coalesce(col("new_vocab"), lit(0L))).over(w))
      .select(col("cp"), col("docs_cum"), col("tokens_cum"), col("vocab_cum"),
        expr("CAST(vocab_cum * 1000000 DIV tokens_cum AS BIGINT)")
          .as("ttr_ppm"))
  }

  def vocabGrowthDocs(spark: SparkSession, dir: String): DataFrame =
    vocabGrowth(Tables.documents(spark, dir))

  // lazy: declared below the queries Seq (object-init-order, as q124).
  private lazy val vocabGrowthSql =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS t
       |  FROM documents
       |), per_cp AS (
       |  SELECT (doc_id + ${CkptDocs - 1}) // $CkptDocs AS cp,
       |    count(*) AS toks, count(DISTINCT doc_id) AS docs
       |  FROM tok GROUP BY 1
       |), nv AS (
       |  SELECT (first_doc + ${CkptDocs - 1}) // $CkptDocs AS cp,
       |    count(*) AS new_vocab
       |  FROM (SELECT t, min(doc_id) AS first_doc FROM tok GROUP BY 1)
       |  GROUP BY 1
       |)
       |SELECT p.cp,
       |  CAST(sum(p.docs) OVER w AS BIGINT) AS docs_cum,
       |  CAST(sum(p.toks) OVER w AS BIGINT) AS tokens_cum,
       |  CAST(sum(coalesce(n.new_vocab, 0)) OVER w AS BIGINT) AS vocab_cum,
       |  CAST((sum(coalesce(n.new_vocab, 0)) OVER w) * 1000000
       |    // (sum(p.toks) OVER w) AS BIGINT) AS ttr_ppm
       |FROM per_cp p LEFT JOIN nv n ON n.cp = p.cp
       |WINDOW w AS (ORDER BY p.cp ROWS BETWEEN UNBOUNDED PRECEDING
       |             AND CURRENT ROW)""".stripMargin

  // lazy for the same object-init-order reason as shingleNoveltySql.
  private lazy val bpePairStatsSql =
    """WITH toks AS (
      |  SELECT unnest(list_filter(str_split(text, ' '), t -> len(t) > 0)) AS t
      |  FROM documents
      |), wc AS (
      |  SELECT lower(t) AS w, count(*) AS n_w FROM toks
      |  WHERE regexp_matches(lower(t), '^[a-z]+$') AND len(t) >= 2
      |  GROUP BY 1
      |), p AS (
      |  SELECT w, n_w, substr(w, i, 2) AS pair
      |  FROM (SELECT w, n_w, unnest(generate_series(1, len(w)-1)) AS i FROM wc)
      |), a AS (
      |  SELECT pair, CAST(sum(n_w) AS BIGINT) AS total_count,
      |    CAST(count(DISTINCT w) AS BIGINT) AS n_words
      |  FROM p GROUP BY 1
      |)
      |SELECT CAST(row_number() OVER (ORDER BY total_count DESC, pair) AS INTEGER) AS rank,
      |  pair, n_words, total_count
      |FROM a ORDER BY total_count DESC, pair LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q124
  /** Per-document n-gram novelty — what fraction of a doc's word
    * 3-gram shingles appear for the FIRST time (by doc_id order) in
    * this doc. The curation signal between exact dedup and near-dup
    * clustering: a low-novelty doc is mostly recombined existing text
    * (template spam, scraped aggregations) even when no single pair
    * crosses a Jaccard threshold — the standard "contribution to corpus
    * diversity" score for training-data selection.
    *
    * Scale shape: one shingle explode (corpus-linear), a min-aggregate
    * keyed by shingle (first occurrence), and two doc-keyed count
    * aggregates — three hash shuffles, no joins against the corpus, no
    * pair generation at all (novelty is a property of the shingle→
    * first-doc map, not of doc pairs). At 100 TB swap the string grams
    * for [[Dedup.shingleHashSet]]'s 64-bit hashes (novelty over hashes
    * equals novelty over grams modulo ~1e-11 collisions) so the shuffle
    * carries 8-byte keys; the gated face keeps strings so DuckDB
    * reproduces the exact gram space (the q17 oracle contract).
    *
    * Docs with zero shingles (< 3 tokens) have no defined novelty and
    * are absent, in both engines, by the same explode-drops-empty rule.
    */
  def shingleNovelty(spark: SparkSession, dir: String): DataFrame = {
    val n = Dedup.ShingleN
    val gram = (0 until n).map(o => s"toks[i-1+$o]").mkString(", ")
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(when(size(col("toks")) >= n,
        expr(s"array_distinct(transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', $gram)))"))
        .otherwise(array().cast("array<string>"))).as("s"))
    val novel = sh.groupBy("s").agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc").as("doc_id")).agg(count(lit(1)).as("n_novel"))
    sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm",
        expr("CAST(n_novel * 1000000 DIV n_shingles AS BIGINT)"))
  }

  private lazy val shingleNoveltySql = {
    val n = Dedup.ShingleN
    val gram = (0 until n).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(str_split(text, ' '), t -> len(t) > 0) AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(toks) >= $n THEN
       |    list_distinct(list_transform(generate_series(1, len(toks)-${n - 1}),
       |      i -> $gram))
       |    ELSE []::VARCHAR[] END AS ws
       |  FROM toks
       |), sh_ex AS (
       |  SELECT doc_id, unnest(ws) AS s FROM sh
       |), novel AS (
       |  SELECT first_doc AS doc_id, count(*) AS n_novel
       |  FROM (SELECT s, min(doc_id) AS first_doc FROM sh_ex GROUP BY 1)
       |  GROUP BY 1
       |), totals AS (
       |  SELECT doc_id, count(*) AS n_shingles FROM sh_ex GROUP BY 1
       |)
       |SELECT t.doc_id, t.n_shingles,
       |  CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
       |  CAST(coalesce(n.n_novel, 0) * 1000000 // t.n_shingles AS BIGINT)
       |    AS novelty_ppm
       |FROM totals t LEFT JOIN novel n ON n.doc_id = t.doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q241
  /** Gopher quality-rule battery — the full MassiveText document-level
    * filter set (Rae et al. 2021, "Scaling Language Models", App. A1.1),
    * the published-pipeline standard that q235's repetition signals
    * complement: per document,
    * (1) word count in [50, 100 000]; (2) mean word length in [3, 10]
    * characters; (3) symbol-to-word ratio ('#' chars plus non-overlapping
    * '...'/'…' occurrences) ≤ 0.1; (4) ≤ 90% of lines start with a bullet
    * ('-', '*', '•'); (5) ≤ 30% of lines end with an ellipsis; (6) ≥ 80%
    * of words contain ≥ 1 alphabetic character; (7) ≥ 2 of the eight
    * required stopwords {the, be, to, of, and, that, have, with} present.
    *
    * Exactness: every signal is integer arithmetic — counts, milli-chars
    * (×1000 div) and ppm (×1e6 div) integer quotients — so an external
    * engine reproduces the battery bit-exactly. `rule_mask` packs the
    * seven verdicts as bits 0..6 (1 = rule passed); `pass` = all seven.
    * Lines are '\n' segments with non-blank trim; a newline-free document
    * is one line (rules 4/5 then read 0 ppm — vacuously clean, matching
    * the published intent that those rules target list/link spam pages).
    *
    * Scale shape: a single per-row projection — array ops over the
    * document's own tokens, no explode, no shuffle, whole-stage codegen
    * end to end. At 100 TB this is scan-bound, the best possible shape;
    * the filter composes with any downstream gate as a pushed predicate.
    */
  def gopherQualityRules(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val d = docs.select(col(idCol), col(textCol).as("t"))
      .withColumn("w", expr("filter(split(t, ' '), x -> length(x) > 0)"))
      .withColumn("lines", expr("filter(split(t, '\n'), l -> trim(l) <> '')"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("word_chars",
        expr("aggregate(w, 0L, (a, x) -> a + length(x))"))
      .withColumn("symbols",
        (length(col("t")) - length(expr("replace(t, '#', '')"))
          + (length(col("t")) - length(expr("replace(t, '...', '')"))) / 3
          + (length(col("t")) - length(expr("replace(t, '…', '')"))))
          .cast("long"))
      .withColumn("bullet_lines", expr(
        "size(filter(lines, l -> left(ltrim(l), 1) IN ('-', '*', '•')))")
        .cast("long"))
      .withColumn("ellipsis_lines", expr(
        "size(filter(lines, l -> right(rtrim(l), 3) = '...' " +
          "OR right(rtrim(l), 1) = '…'))").cast("long"))
      .withColumn("alpha_words",
        expr("size(filter(w, x -> x rlike '[A-Za-z]'))").cast("long"))
      .withColumn("stopword_hits", expr(
        "size(array_intersect(array_distinct(transform(w, x -> lower(x))), " +
          "array('the','be','to','of','and','that','have','with')))")
        .cast("long"))
    val sig = d.select(col(idCol), col("n_words"),
      when(col("n_words") === 0, 0L)
        .otherwise(expr("word_chars * 1000 div n_words")).as("mean_len_milli"),
      when(col("n_words") === 0, 0L)
        .otherwise(expr("symbols * 1000000 div n_words")).as("symbol_ppm"),
      when(col("n_lines") === 0, 0L)
        .otherwise(expr("bullet_lines * 1000000 div n_lines")).as("bullet_ppm"),
      when(col("n_lines") === 0, 0L)
        .otherwise(expr("ellipsis_lines * 1000000 div n_lines"))
        .as("ellipsis_ppm"),
      when(col("n_words") === 0, 0L)
        .otherwise(expr("alpha_words * 1000000 div n_words")).as("alpha_ppm"),
      col("stopword_hits"))
    sig
      .withColumn("rule_mask",
        (when(col("n_words").between(50L, 100000L), 1L).otherwise(0L)
          + when(col("mean_len_milli").between(3000L, 10000L), 2L).otherwise(0L)
          + when(col("symbol_ppm") <= 100000L, 4L).otherwise(0L)
          + when(col("bullet_ppm") <= 900000L, 8L).otherwise(0L)
          + when(col("ellipsis_ppm") <= 300000L, 16L).otherwise(0L)
          + when(col("alpha_ppm") >= 800000L, 32L).otherwise(0L)
          + when(col("stopword_hits") >= 2L, 64L).otherwise(0L)))
      .withColumn("pass", when(col("rule_mask") === 127L, 1L).otherwise(0L))
  }

  def gopherQualityProfile(spark: SparkSession, dir: String): DataFrame =
    gopherQualityRules(Tables.documents(spark, dir))

  // lazy: the queries Seq above initializes first (the q124 note).
  private lazy val gopherQualitySql =
    """WITH base AS (
      |  SELECT doc_id, text AS t,
      |    list_filter(str_split(text, ' '), x -> len(x) > 0) AS w,
      |    list_filter(str_split(text, chr(10)), l -> trim(l) <> '') AS lines
      |  FROM documents
      |),
      |sig0 AS (
      |  SELECT doc_id,
      |    len(w) AS n_words, len(lines) AS n_lines,
      |    coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS word_chars,
      |    (len(t) - len(replace(t, '#', '')))
      |      + (len(t) - len(replace(t, '...', ''))) // 3
      |      + (len(t) - len(replace(t, '…', ''))) AS symbols,
      |    len(list_filter(lines, l -> left(ltrim(l), 1) IN ('-', '*', '•')))
      |      AS bullet_lines,
      |    len(list_filter(lines, l -> right(rtrim(l), 3) = '...'
      |      OR right(rtrim(l), 1) = '…')) AS ellipsis_lines,
      |    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
      |      AS alpha_words,
      |    len(list_intersect(list_distinct(list_transform(w, x -> lower(x))),
      |      ['the','be','to','of','and','that','have','with']))
      |      AS stopword_hits
      |  FROM base
      |),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(n_words AS BIGINT) AS n_words,
      |    CAST(CASE WHEN n_words = 0 THEN 0
      |      ELSE word_chars * 1000 // n_words END AS BIGINT) AS mean_len_milli,
      |    CAST(CASE WHEN n_words = 0 THEN 0
      |      ELSE symbols * 1000000 // n_words END AS BIGINT) AS symbol_ppm,
      |    CAST(CASE WHEN n_lines = 0 THEN 0
      |      ELSE bullet_lines * 1000000 // n_lines END AS BIGINT) AS bullet_ppm,
      |    CAST(CASE WHEN n_lines = 0 THEN 0
      |      ELSE ellipsis_lines * 1000000 // n_lines END AS BIGINT)
      |      AS ellipsis_ppm,
      |    CAST(CASE WHEN n_words = 0 THEN 0
      |      ELSE alpha_words * 1000000 // n_words END AS BIGINT) AS alpha_ppm,
      |    CAST(stopword_hits AS BIGINT) AS stopword_hits
      |  FROM sig0
      |)
      |SELECT *,
      |  CAST((CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
      |    + (CASE WHEN mean_len_milli BETWEEN 3000 AND 10000 THEN 2 ELSE 0 END)
      |    + (CASE WHEN symbol_ppm <= 100000 THEN 4 ELSE 0 END)
      |    + (CASE WHEN bullet_ppm <= 900000 THEN 8 ELSE 0 END)
      |    + (CASE WHEN ellipsis_ppm <= 300000 THEN 16 ELSE 0 END)
      |    + (CASE WHEN alpha_ppm >= 800000 THEN 32 ELSE 0 END)
      |    + (CASE WHEN stopword_hits >= 2 THEN 64 ELSE 0 END) AS BIGINT)
      |    AS rule_mask,
      |  CAST(CASE WHEN (CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
      |    + (CASE WHEN mean_len_milli BETWEEN 3000 AND 10000 THEN 2 ELSE 0 END)
      |    + (CASE WHEN symbol_ppm <= 100000 THEN 4 ELSE 0 END)
      |    + (CASE WHEN bullet_ppm <= 900000 THEN 8 ELSE 0 END)
      |    + (CASE WHEN ellipsis_ppm <= 300000 THEN 16 ELSE 0 END)
      |    + (CASE WHEN alpha_ppm >= 800000 THEN 32 ELSE 0 END)
      |    + (CASE WHEN stopword_hits >= 2 THEN 64 ELSE 0 END) = 127
      |    THEN 1 ELSE 0 END AS BIGINT) AS pass
      |FROM sig""".stripMargin

  // --------------------------------------------------------------- q245
  /** Flesch readability scoring — the classic surface-form readability
    * battery (Flesch 1948; Kincaid et al. 1975) a curation pipeline
    * runs next to the quality gates (q50/q80/q241): per document,
    * reading ease RE = 206.835 − 1.015·(W/S) − 84.6·(Y/W) and grade
    * level GL = 0.39·(W/S) + 11.8·(Y/W) − 15.59, with W words,
    * S sentences and Y syllables.
    *
    * Syllables use the deterministic vowel-group heuristic — per word,
    * the count of maximal `[aeiouy]+` runs in the lowercased word,
    * floored at 1 — the standard cheap estimator (exact dictionaries
    * are model assets, not engine ops). Sentences are maximal non-blank
    * segments after splitting on `[.!?]+`; punctuation-free text is one
    * sentence (the whole document), so the W/S term degrades gracefully
    * to document length.
    *
    * Exactness: W, S, Y are exact integer counts; both scores are ONE
    * fixed double sequence over those integers, floored to micro-units.
    *
    * Scale shape: a single per-row projection (array transforms over
    * the document's own tokens — no explode, no shuffle, whole-stage
    * codegen), scan-bound at any corpus size like q241.
    */
  def fleschReadability(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    docs.select(col(idCol), col(textCol).as("t"))
      .withColumn("w", expr("filter(split(t, ' '), x -> length(x) > 0)"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("n_sentences", greatest(lit(1L), expr(
        "size(filter(split(t, '[.!?]+'), s -> trim(s) <> ''))").cast("long")))
      .withColumn("n_syllables", expr(
        "aggregate(w, 0L, (a, x) -> a + greatest(1, " +
          "size(regexp_extract_all(lower(x), '[aeiouy]+', 0))))"))
      .filter(col("n_words") > 0)
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        floor((lit(206.835)
          - lit(1.015) * col("n_words").cast("double")
            / col("n_sentences").cast("double")
          - lit(84.6) * col("n_syllables").cast("double")
            / col("n_words").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("ease_micro"),
        floor((lit(0.39) * col("n_words").cast("double")
            / col("n_sentences").cast("double")
          + lit(11.8) * col("n_syllables").cast("double")
            / col("n_words").cast("double")
          - lit(15.59))
          * lit(1000000.0) + lit(0.5)).cast("long").as("grade_micro"))

  def readabilityProfile(spark: SparkSession, dir: String): DataFrame =
    fleschReadability(Tables.documents(spark, dir))

  // lazy: the queries Seq above initializes first (the q124 note).
  private lazy val readabilitySql =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(str_split(text, ' '), x -> len(x) > 0) AS w,
      |    greatest(1, len(list_filter(string_split_regex(text, '[.!?]+'),
      |      s -> trim(s) <> ''))) AS n_sentences
      |  FROM documents
      |),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(n_sentences AS BIGINT) AS n_sentences,
      |    CAST(coalesce(list_sum(list_transform(w, x -> greatest(1,
      |      len(regexp_extract_all(lower(x), '[aeiouy]+'))))), 0) AS BIGINT)
      |      AS n_syllables
      |  FROM base
      |)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CAST(floor((206.835::DOUBLE
      |    - 1.015::DOUBLE * n_words::DOUBLE / n_sentences::DOUBLE
      |    - 84.6::DOUBLE * n_syllables::DOUBLE / n_words::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS ease_micro,
      |  CAST(floor((0.39::DOUBLE * n_words::DOUBLE / n_sentences::DOUBLE
      |    + 11.8::DOUBLE * n_syllables::DOUBLE / n_words::DOUBLE
      |    - 15.59::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS grade_micro
      |FROM sig WHERE n_words > 0""".stripMargin

  // --------------------------------------------------------------- q247
  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents") — the classic unsupervised
    * keyphrase scorer: candidate phrases are maximal runs of non-stopword
    * tokens (stopwords and punctuation are phrase delimiters); each
    * word's score is degree/frequency, where frequency counts the word's
    * occurrences in candidate phrases and degree sums the lengths of the
    * phrases it occurs in (word co-occurrence including itself); a
    * phrase's score is the sum of its member-word scores. Top-K distinct
    * phrases corpus-wide.
    *
    * The stopword list is the fixed 16-word function-word core (engine
    * literal, documented here) — RAKE's published behavior depends only
    * on the list being function words; callers with a richer list pass
    * their own. Exactness: degree and frequency are exact integer
    * counts; word scores are emitted in integer micro-units
    * (degree·1e6 div freq), and a phrase's score_micro is the ORDER-
    * INDEPENDENT integer sum of member micro-scores — the documented
    * integer-exact variant of RAKE's float sum (identical ranking unless
    * scores differ below 1e-6, which the gate would surface). Tie-break
    * (score desc, phrase asc) is total.
    *
    * Candidate phrases longer than `maxWords` are discarded — the
    * published practical cap (Rose et al. §1.2 limit RAKE's known
    * long-run bias this way): without it, any stopword-sparse document
    * scores its own entire body as one giant "keyword", since phrase
    * score grows with member count.
    *
    * Scale shape: one posexplode → running stopword count per doc (a
    * doc-partitioned window) → two corpus-linear hash aggregates (word
    * stats, phrase assembly) → vocabulary-sized join + top-K. No pair
    * joins; the phrase re-assembly sorts WITHIN each phrase's own
    * handful of tokens (sort_array over struct(pos, score)), never
    * across documents.
    */
  // lazy: referenced by rakeSql during the queries-Seq init (q124 note).
  lazy val RakeStopwords: Seq[String] = Seq("the", "a", "an", "and", "of",
    "to", "in", "is", "it", "that", "with", "as", "for", "on", "at", "by")

  def rakeKeywords(docs: DataFrame, topK: Int = 25, maxWords: Int = 4,
                   stopwords: Seq[String] = RakeStopwords): DataFrame = {
    val stopArr = array(stopwords.map(lit): _*)
    val toks = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")
      .withColumn("w", lower(col("tok")))
      .withColumn("is_stop", array_contains(stopArr, col("w")))
      .withColumn("phrase_id",
        sum(when(col("is_stop"), 1L).otherwise(0L))
          .over(Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(!col("is_stop"))
      .localCheckpoint()
    val phraseLen = toks.groupBy("doc_id", "phrase_id")
      .agg(count(lit(1)).as("p_len"))
      .filter(col("p_len") <= maxWords)
    val wordStats = toks.join(phraseLen, Seq("doc_id", "phrase_id"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("p_len").as("degree"))
      .withColumn("score_micro", expr("degree * 1000000 div freq"))
    val phrases = toks.join(phraseLen.select("doc_id", "phrase_id"),
        Seq("doc_id", "phrase_id"))
      .join(wordStats.select("w", "score_micro"), Seq("w"))
      .groupBy("doc_id", "phrase_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("ws"),
        sum("score_micro").as("score_micro"),
        count(lit(1)).as("n_words"))
      .withColumn("phrase", expr("concat_ws(' ', transform(ws, s -> s.w))"))
    phrases.groupBy("phrase")
      .agg(max("n_words").as("n_words"), count(lit(1)).as("n_occ"),
        max("score_micro").as("score_micro"))
      .orderBy(desc("score_micro"), asc("phrase"))
      .limit(topK)
  }

  def rakeTopPhrases(spark: SparkSession, dir: String): DataFrame =
    rakeKeywords(Tables.documents(spark, dir))

  // lazy: the queries Seq above initializes first (the q124 note).
  private lazy val rakeSql = {
    val stops = RakeStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH toks0 AS (
       |  SELECT doc_id, i - 1 AS pos, lower(w[i]) AS w
       |  FROM (SELECT doc_id,
       |          list_filter(str_split(text, ' '), t -> len(t) > 0) AS w
       |        FROM documents),
       |    unnest(range(1, len(w) + 1)) AS t(i)
       |),
       |marked AS (
       |  SELECT doc_id, pos, w, w IN ($stops) AS is_stop,
       |    sum(CASE WHEN w IN ($stops) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
       |  FROM toks0
       |),
       |toks AS (
       |  SELECT doc_id, pos, w, phrase_id FROM marked WHERE NOT is_stop
       |),
       |plen AS (
       |  SELECT doc_id, phrase_id, count(*) AS p_len
       |  FROM toks GROUP BY 1, 2
       |  HAVING count(*) <= 4
       |),
       |wstats AS (
       |  SELECT t.w, count(*) AS freq, sum(p.p_len) AS degree
       |  FROM toks t JOIN plen p
       |    ON p.doc_id = t.doc_id AND p.phrase_id = t.phrase_id
       |  GROUP BY 1
       |),
       |wscore AS (
       |  SELECT w, degree * 1000000 // freq AS score_micro FROM wstats
       |),
       |phrases AS (
       |  SELECT t.doc_id, t.phrase_id,
       |    array_to_string(list_transform(
       |      list_sort(list(ROW(t.pos, t.w))), s -> s[2]), ' ') AS phrase,
       |    sum(ws.score_micro) AS score_micro,
       |    count(*) AS n_words
       |  FROM toks t
       |  JOIN plen p ON p.doc_id = t.doc_id AND p.phrase_id = t.phrase_id
       |  JOIN wscore ws ON ws.w = t.w
       |  GROUP BY 1, 2
       |)
       |SELECT phrase,
       |  CAST(max(n_words) AS BIGINT) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_occ,
       |  CAST(max(score_micro) AS BIGINT) AS score_micro
       |FROM phrases
       |GROUP BY 1
       |ORDER BY score_micro DESC, phrase ASC
       |LIMIT 25""".stripMargin
  }
}
