package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Model-evaluation battery over scored corpora — the measurements a
  * training-data pipeline runs on every candidate quality/filter model
  * before trusting it to gate a corpus: ranking power (AUC), probability
  * calibration (reliability bins), and multiple-testing control when many
  * segment-level metrics are compared at once (Benjamini–Hochberg).
  *
  * Scores/labels for the gated faces are the q80/q160 stand-in pattern: a
  * deterministic md5-derived score in micro-units with a label drawn from a
  * SECOND independent md5 channel thresholded at the score, so the synthetic
  * scorer is calibrated by construction (P(label) = score) and the AUC is
  * meaningfully above ½ — the evaluation PLUMBING is what is under test and
  * oracle-gated, exactly as q80 gates inference with synthetic weights.
  *
  * Exactness design (the q99/q107 discipline): every gated column is integer
  * arithmetic end to end — average-rank ties are carried as DOUBLED ranks
  * (2·avg-rank is always an integer), ratios are emitted in micro-units via
  * the two-step truncating division `(q div d)·1e6 + (1e6·(q mod d)) div d`
  * (Spark `div` ≡ DuckDB `//`), so no float ever crosses the gate.
  *
  * Scale shape: each face is one corpus scan into either a per-group rank
  * window (groups sort in parallel — the q107 shape) or a ≤10-group hash
  * aggregate; nothing corpus-sized is ever collected or single-partitioned.
  */
object ModelEval {

  /** Deterministic synthetic scored corpus: (doc_id, source, score_micro ∈
    * [0, 1e6), label) with P(label | score) = score/1e6 by construction —
    * the md5 channels are independent (distinct prefixes), so the scorer is
    * perfectly calibrated in expectation and ranking-informative.
    */
  def scoredDocs(docs: DataFrame): DataFrame = {
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % 1000000L
    docs.select(col("doc_id"), col("source"),
        h(col("doc_id").cast("string")).as("score_micro"),
        h(concat(lit("lbl:"), col("doc_id").cast("string"))).as("u"))
      .withColumn("label", col("u") < col("score_micro"))
      .drop("u")
  }

  // --------------------------------------------------------------- q173
  /** Exact tie-aware ROC AUC per group — the rank-statistic identity
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with AVERAGE ranks over score
    * ties (the statistically standard treatment: a tie contributes ½).
    * Average ranks are fractional, so the whole statistic rides doubled
    * integers: rk2 = 2·min_rank + tie_size − 1 (= 2·avg-rank, always an
    * integer), u2 = Σ⁺rk2 − 2·n⁺(n⁺+1)/2·... = Σ⁺rk2 − n⁺(n⁺+1), and
    * auc_micro = (u2·1e6) div (2·n⁺·n⁻) via the overflow-safe two-step
    * division. Headroom: u2 ≤ 2n² and n⁺·n⁻ ≤ n²/4 stay under 2⁶³ for
    * n ≤ ~2·10⁹ rows per group — far past any per-source corpus slice
    * the bench runs, and the two-step division never multiplies u2 by
    * 1e6 directly.
    *
    * Groups where either class is absent report null AUC (undefined),
    * not a division error — same contract as q107's empty-side rule.
    *
    * Scale shape (the q107 window discipline): ONE key-partitioned
    * window sort per group (parallel across groups) + one hash
    * aggregate; no global sort, nothing driver-sized.
    */
  def aucExact(scored: DataFrame, groupCol: String, scoreCol: String,
               labelCol: String): DataFrame = {
    val wr = Window.partitionBy(groupCol).orderBy(col(scoreCol))
    val wt = Window.partitionBy(groupCol, scoreCol)
    scored
      .withColumn("min_rk", rank().over(wr).cast("long"))
      .withColumn("tie_n", count(lit(1)).over(wt).cast("long"))
      .withColumn("rk2", col("min_rk") * 2L + col("tie_n") - 1L)
      .groupBy(groupCol)
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col(labelCol), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col(labelCol), col("rk2")).otherwise(0L)).as("r2_pos"))
      .withColumn("u2", expr("r2_pos - n_pos * (n_pos + 1)"))
      .withColumn("auc_micro",
        when(col("n_pos") > 0 && col("n_neg") > 0, expr(
          """(u2 div (2 * n_pos * n_neg)) * 1000000
            | + (1000000 * (u2 - (u2 div (2 * n_pos * n_neg)) * (2 * n_pos * n_neg)))
            |   div (2 * n_pos * n_neg)""".stripMargin)))
  }

  /** Gated q173: AUC of the synthetic calibrated scorer per source. */
  def classifierAuc(spark: SparkSession, dir: String): DataFrame =
    aucExact(scoredDocs(Tables.documents(spark, dir)),
      "source", "score_micro", "label")
      .select(col("source"), col("n_pos"), col("n_neg"), col("u2"),
        col("auc_micro"))

  private val classifierAucSql =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |),
      |ranked AS (
      |  SELECT source, label,
      |    2 * CAST(rank() OVER (PARTITION BY source ORDER BY score_micro) AS BIGINT)
      |      + CAST(count(*) OVER (PARTITION BY source, score_micro) AS BIGINT)
      |      - 1 AS rk2
      |  FROM scored
      |),
      |s AS (
      |  SELECT source,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
      |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg,
      |    sum(CASE WHEN label THEN rk2 ELSE 0 END) AS r2_pos
      |  FROM ranked GROUP BY 1
      |),
      |u AS (
      |  SELECT source, n_pos, n_neg,
      |    r2_pos - n_pos * (n_pos + 1) AS u2
      |  FROM s
      |)
      |SELECT source, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_neg AS BIGINT) AS n_neg, CAST(u2 AS BIGINT) AS u2,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN CAST(
      |    (u2 // (2 * n_pos * n_neg)) * 1000000
      |    + (1000000 * (u2 - (u2 // (2 * n_pos * n_neg)) * (2 * n_pos * n_neg)))
      |      // (2 * n_pos * n_neg) AS BIGINT) END AS auc_micro
      |FROM u""".stripMargin

  // --------------------------------------------------------------- q174
  /** Calibration reliability table — the per-bin half of an ECE report:
    * predictions bucketed into 10 equal-width probability bins, each bin
    * reporting its count, mean predicted probability, observed positive
    * rate, and |gap| — all in integer micro-units (mean via the two-step
    * division, so Σscore_micro never multiplies by 1e6). A calibrated
    * model shows gap_micro ≈ 0 in every bin; the synthetic scorer is
    * calibrated by construction, so the gate doubles as a distribution
    * check on the md5 channels.
    *
    * Scale shape: one scan → 10-group hash aggregate (fully partial);
    * the output is constant-sized regardless of corpus size.
    */
  def reliabilityBins(scored: DataFrame, scoreCol: String,
                      labelCol: String): DataFrame =
    scored
      .groupBy((col(scoreCol) / 100000L).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(scoreCol)).as("sum_score"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("avg_score_micro", expr("sum_score div n"))
      .withColumn("pos_rate_micro", expr(
        "(n_pos div n) * 1000000 + (1000000 * (n_pos - (n_pos div n) * n)) div n"))
      .withColumn("gap_micro",
        abs(col("avg_score_micro") - col("pos_rate_micro")))

  /** Gated q174: reliability bins of the synthetic calibrated scorer. */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame =
    reliabilityBins(scoredDocs(Tables.documents(spark, dir)),
      "score_micro", "label")
      .select(col("bin"), col("n"), col("n_pos"), col("avg_score_micro"),
        col("pos_rate_micro"), col("gap_micro"))

  private val calibrationBinsSql =
    """WITH scored AS (
      |  SELECT
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |),
      |b AS (
      |  SELECT score_micro // 100000 AS bin, count(*) AS n,
      |    sum(score_micro) AS sum_score,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos
      |  FROM scored GROUP BY 1
      |),
      |m AS (
      |  SELECT bin, n, n_pos, sum_score // n AS avg_score_micro,
      |    (n_pos // n) * 1000000
      |      + (1000000 * (n_pos - (n_pos // n) * n)) // n AS pos_rate_micro
      |  FROM b
      |)
      |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
      |  CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(avg_score_micro AS BIGINT) AS avg_score_micro,
      |  CAST(pos_rate_micro AS BIGINT) AS pos_rate_micro,
      |  CAST(abs(avg_score_micro - pos_rate_micro) AS BIGINT) AS gap_micro
      |FROM m""".stripMargin

  // --------------------------------------------------------------- q212
  /** Murphy decomposition of the Brier score (Murphy 1973) — the WHY
    * behind q174's per-bin gaps, as one number each per source:
    * reliability (how far bin forecasts sit from bin outcomes — smaller
    * is better-calibrated), resolution (how far bin outcomes spread from
    * the base rate — larger is more discriminating), uncertainty
    * (ō·(1−ō), the irreducible floor), and the raw Brier mean itself.
    * Murphy's identity Brier = UNC + REL − RES holds up to within-bin
    * variance (forecasts inside a 0.1-wide bin are not constant) and
    * micro truncation — the spec pins that residual; the oracle pins
    * every emitted value exactly.
    *
    * Integer discipline: per-row squared error (score − 1e6·o)² ≤ 1e12
    * rides a DECIMAL(38,0) sum; per-bin gap numerators d = Σscore −
    * 1e6·pos and e = 1e6·pos − n·ō_micro are BIGINT (|·| ≤ n_bin·1e6,
    * exact through ~9·10¹² rows per source-bin), squared in
    * DECIMAL(38,0) (the q158 widen-then-check discipline), and every
    * division is a truncating `div` both engines floor identically.
    * ō_micro is the TRUNCATED base rate — resolution is defined against
    * it, deterministically in both engines.
    *
    * Scale shape: one corpus scan → (source, bin) hash aggregate (≤10
    * rows per source) → bin-frame total windows (the q199 shape) → one
    * per-source rollup. Nothing corpus-sized past the first aggregate.
    */
  def brierDecomposition(scored: DataFrame, groupCol: String,
                         scoreCol: String, labelCol: String): DataFrame = {
    val bins = scored
      .groupBy(col(groupCol), (col(scoreCol) / 100000L).cast("long").as("bin"))
      .agg(count(lit(1)).as("nb"),
        sum(col(scoreCol)).as("sb"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pb"),
        sum(((col(scoreCol) - when(col(labelCol), 1000000L).otherwise(0L)) *
          (col(scoreCol) - when(col(labelCol), 1000000L).otherwise(0L)))
          .cast("decimal(38,0)")).as("ssq"))
    val w = Window.partitionBy(groupCol)
    bins
      .withColumn("n", sum("nb").over(w))
      .withColumn("n_pos", sum("pb").over(w))
      .withColumn("obar_micro", expr("(1000000 * n_pos) div n"))
      .withColumn("rel_t", expr(
        "(CAST(sb - 1000000 * pb AS DECIMAL(38,0)) * (sb - 1000000 * pb))" +
          " div (nb * 1000000)"))
      .withColumn("res_t", expr(
        "(CAST(1000000 * pb - nb * obar_micro AS DECIMAL(38,0))" +
          " * (1000000 * pb - nb * obar_micro)) div (nb * 1000000)"))
      .groupBy(col(groupCol), col("n"), col("n_pos"), col("obar_micro"))
      .agg(sum("ssq").as("ssq_tot"), sum("rel_t").as("rel_num"),
        sum("res_t").as("res_num"))
      .withColumn("brier_micro", expr("CAST(ssq_tot div (n * 1000000) AS BIGINT)"))
      .withColumn("rel_micro", expr("CAST(rel_num div n AS BIGINT)"))
      .withColumn("res_micro", expr("CAST(res_num div n AS BIGINT)"))
      .withColumn("unc_micro", expr(
        "(obar_micro * (1000000 - obar_micro)) div 1000000"))
      .drop("ssq_tot", "rel_num", "res_num")
  }

  /** Gated q212: Brier decomposition of the synthetic calibrated scorer
    * per source — REL ≈ 0 and RES ≈ UNC are the calibrated-scorer
    * signatures the gate doubles as a check on.
    */
  def brierBySource(spark: SparkSession, dir: String): DataFrame =
    brierDecomposition(scoredDocs(Tables.documents(spark, dir)),
      "source", "score_micro", "label")

  private val brierSql =
    """WITH scored AS (
      |  SELECT source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |), b AS (
      |  SELECT source, score_micro // 100000 AS bin, count(*) AS nb,
      |    sum(score_micro) AS sb,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS pb,
      |    sum(CAST(score_micro - CASE WHEN label THEN 1000000 ELSE 0 END
      |        AS HUGEINT)
      |      * (score_micro - CASE WHEN label THEN 1000000 ELSE 0 END)) AS ssq
      |  FROM scored GROUP BY 1, 2
      |), t AS (
      |  SELECT *, sum(nb) OVER (PARTITION BY source) AS n,
      |    sum(pb) OVER (PARTITION BY source) AS n_pos
      |  FROM b
      |), m AS (
      |  SELECT *, (1000000 * n_pos) // n AS obar_micro,
      |    (CAST(sb - 1000000 * pb AS HUGEINT) * (sb - 1000000 * pb))
      |      // (nb * 1000000) AS rel_t,
      |    (CAST(1000000 * pb - nb * ((1000000 * n_pos) // n) AS HUGEINT)
      |      * (1000000 * pb - nb * ((1000000 * n_pos) // n)))
      |      // (nb * 1000000) AS res_t
      |  FROM t
      |)
      |SELECT source, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(obar_micro AS BIGINT) AS obar_micro,
      |  CAST(sum(ssq) // (n * 1000000) AS BIGINT) AS brier_micro,
      |  CAST(sum(rel_t) // n AS BIGINT) AS rel_micro,
      |  CAST(sum(res_t) // n AS BIGINT) AS res_micro,
      |  CAST((obar_micro * (1000000 - obar_micro)) // 1000000 AS BIGINT)
      |    AS unc_micro
      |FROM m GROUP BY source, n, n_pos, obar_micro""".stripMargin

  // --------------------------------------------------------------- q213
  /** Operating-point sweep — the deployment-threshold table read next to
    * q173's AUC (which ranks) and q174's bins (which calibrate): at each
    * candidate cut t ∈ {0.1, …, 0.9}, the confusion counts and exact
    * precision / recall / F1 in micro units, so "where do we set the
    * gate?" is answered from one table. F1 avoids the unstable
    * harmonic-of-ratios form: f1 = 2·tp / (2·tp + fp + fn) in one
    * truncating division — exact through tp ≤ ~4.6·10¹² rows.
    *
    * Scale shape: one corpus scan → 10-bin hash aggregate; the sweep is
    * cumulative sums over the 10-row bin frame (the q199 bin-frame
    * window — singleParts carries 10 rows, never the corpus), one row
    * per threshold. Thresholds align with bin boundaries by
    * construction, so the cumulative IS the exact confusion count.
    */
  def thresholdSweep(scored: DataFrame, scoreCol: String,
                     labelCol: String): DataFrame =
    sweepFromBins(scored
      .groupBy((col(scoreCol) / 100000L).cast("long").as("bin"))
      .agg(count(lit(1)).as("nb"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pb")))

  /** The q213 finisher over an already-aggregated bin frame
    * (bin, nb, pb) — split out so the incremental eval state
    * ([[graft.warehouse.EvalState]]) can sweep its persisted counts with
    * the identical arithmetic.
    */
  def sweepFromBins(bins: DataFrame): DataFrame = {
    // Cum-from-top: rows predicted POSITIVE at threshold t = bin·1e5 are
    // the bins ≥ t; the frame is ≤10 rows.
    val wUp = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    bins
      .withColumn("pred_pos", sum("nb").over(wUp))
      .withColumn("tp", sum("pb").over(wUp))
      .withColumn("n", sum("nb").over(wAll))
      .withColumn("n_pos", sum("pb").over(wAll))
      .filter(col("bin").between(1L, 9L))
      .select(
        (col("bin") * 100000L).as("threshold_micro"),
        col("pred_pos"), col("tp"),
        (col("pred_pos") - col("tp")).as("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("n") - col("pred_pos") - col("n_pos") + col("tp")).as("tn"))
      .withColumn("precision_micro",
        when(col("pred_pos") > 0, expr("(1000000 * tp) div pred_pos")))
      .withColumn("recall_micro",
        when(col("tp") + col("fn") > 0, expr("(1000000 * tp) div (tp + fn)")))
      .withColumn("f1_micro",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          expr("(2000000 * tp) div (2 * tp + fp + fn)")))
  }

  /** Gated q213: the sweep over the synthetic calibrated scorer. */
  def thresholdSweepDocs(spark: SparkSession, dir: String): DataFrame =
    thresholdSweep(scoredDocs(Tables.documents(spark, dir)),
      "score_micro", "label")

  private val thresholdSweepSql =
    """WITH scored AS (
      |  SELECT
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |), b AS (
      |  SELECT score_micro // 100000 AS bin, count(*) AS nb,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS pb
      |  FROM scored GROUP BY 1
      |), c AS (
      |  SELECT bin,
      |    sum(nb) OVER (ORDER BY bin DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pred_pos,
      |    sum(pb) OVER (ORDER BY bin DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
      |    sum(nb) OVER () AS n, sum(pb) OVER () AS n_pos
      |  FROM b
      |)
      |SELECT CAST(bin * 100000 AS BIGINT) AS threshold_micro,
      |  CAST(pred_pos AS BIGINT) AS pred_pos, CAST(tp AS BIGINT) AS tp,
      |  CAST(pred_pos - tp AS BIGINT) AS fp,
      |  CAST(n_pos - tp AS BIGINT) AS fn,
      |  CAST(n - pred_pos - n_pos + tp AS BIGINT) AS tn,
      |  CASE WHEN pred_pos > 0
      |    THEN CAST((1000000 * tp) // pred_pos AS BIGINT) END AS precision_micro,
      |  CASE WHEN n_pos > 0
      |    THEN CAST((1000000 * tp) // n_pos AS BIGINT) END AS recall_micro,
      |  CASE WHEN 2 * tp + (pred_pos - tp) + (n_pos - tp) > 0
      |    THEN CAST((2000000 * tp) // (2 * tp + (pred_pos - tp) + (n_pos - tp))
      |      AS BIGINT) END AS f1_micro
      |FROM c WHERE bin BETWEEN 1 AND 9""".stripMargin

  // --------------------------------------------------------------- q215
  /** McNemar's paired-classifier test — the statistically honest way to
    * claim "model A beats model B" when both score the SAME documents:
    * accuracy deltas double-count the rows both models get right (or
    * wrong); only the DISCORDANT pairs b (A right, B wrong) and
    * c (B right, A wrong) carry evidence. The continuity-corrected
    * statistic (|b−c|−1)²/(b+c) is χ²₁-distributed under H₀ — next to
    * q202's kappa (do two raters agree?) this answers "is the
    * disagreement DIRECTIONAL?".
    *
    * Exactness: the full 2×2 concordance table (n11/n00/b/c) is exact
    * BIGINT from one aggregation; the statistic is integer micro via the
    * overflow-safe two-step truncating division — (|b−c|−1)² ≤ n² stays
    * under 2⁶³ through n ≈ 3·10⁹ rows per source, and the two-step form
    * never multiplies it by 1e6 directly. b+c = 0 reports null (no
    * discordant evidence), not a division error.
    *
    * Paired models for the gated face: classifier A is the calibrated
    * q173 scorer (P(label) = score); classifier B is an INDEPENDENT md5
    * channel — informative vs uninformative at the same 0.5 cut, so the
    * test should fire on every source slice.
    *
    * Scale shape: one corpus scan → per-source hash aggregate (fully
    * partial, source-cardinality output). Nothing windowed, nothing
    * single-partitioned.
    */
  def mcnemar(paired: DataFrame, groupCol: String, correctACol: String,
              correctBCol: String): DataFrame =
    paired
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(correctACol) && col(correctBCol), 1L).otherwise(0L))
          .as("n11"),
        sum(when(!col(correctACol) && !col(correctBCol), 1L).otherwise(0L))
          .as("n00"),
        sum(when(col(correctACol) && !col(correctBCol), 1L).otherwise(0L))
          .as("b"),
        sum(when(!col(correctACol) && col(correctBCol), 1L).otherwise(0L))
          .as("c"))
      .withColumn("mcnemar_micro",
        when(col("b") + col("c") > 0, expr(
          """((abs(b - c) - 1) * (abs(b - c) - 1) div (b + c)) * 1000000
            | + (1000000 * ((abs(b - c) - 1) * (abs(b - c) - 1)
            |    - ((abs(b - c) - 1) * (abs(b - c) - 1) div (b + c)) * (b + c)))
            |   div (b + c)""".stripMargin)))

  /** Gated q215: calibrated scorer vs independent-channel scorer at the
    * 0.5 operating point, per source.
    */
  def pairedModelMcnemar(spark: SparkSession, dir: String): DataFrame = {
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % 1000000L
    val paired = Tables.documents(spark, dir).select(
        col("source"),
        h(col("doc_id").cast("string")).as("s1"),
        h(concat(lit("m2:"), col("doc_id").cast("string"))).as("s2"),
        h(concat(lit("lbl:"), col("doc_id").cast("string"))).as("u"))
      .withColumn("label", col("u") < col("s1"))
      .withColumn("correct_a", (col("s1") >= 500000L) === col("label"))
      .withColumn("correct_b", (col("s2") >= 500000L) === col("label"))
    mcnemar(paired, "source", "correct_a", "correct_b")
  }

  private val mcnemarSql =
    """WITH paired AS (
      |  SELECT source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS s1,
      |    ('0x' || substr(md5('m2:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS s2,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS u
      |  FROM documents
      |),
      |flags AS (
      |  SELECT source,
      |    (s1 >= 500000) = (u < s1) AS correct_a,
      |    (s2 >= 500000) = (u < s1) AS correct_b
      |  FROM paired
      |),
      |t AS (
      |  SELECT source, count(*) AS n,
      |    sum(CASE WHEN correct_a AND correct_b THEN 1 ELSE 0 END) AS n11,
      |    sum(CASE WHEN NOT correct_a AND NOT correct_b THEN 1 ELSE 0 END) AS n00,
      |    sum(CASE WHEN correct_a AND NOT correct_b THEN 1 ELSE 0 END) AS b,
      |    sum(CASE WHEN NOT correct_a AND correct_b THEN 1 ELSE 0 END) AS c
      |  FROM flags GROUP BY 1
      |)
      |SELECT source, CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
      |  CAST(n00 AS BIGINT) AS n00, CAST(b AS BIGINT) AS b,
      |  CAST(c AS BIGINT) AS c,
      |  CASE WHEN b + c > 0 THEN CAST(
      |    ((abs(b - c) - 1) * (abs(b - c) - 1) // (b + c)) * 1000000
      |    + (1000000 * ((abs(b - c) - 1) * (abs(b - c) - 1)
      |       - ((abs(b - c) - 1) * (abs(b - c) - 1) // (b + c)) * (b + c)))
      |      // (b + c) AS BIGINT) END AS mcnemar_micro
      |FROM t""".stripMargin

  // --------------------------------------------------------------- q178
  /** Benjamini–Hochberg step-up FDR control — when a pipeline tests many
    * segment metrics at once (one z-test per cohort, one drift test per
    * feature…), raw p < 0.05 cuts produce false alarms ∝ the number of
    * tests; BH finds the largest rank k with p₍ₖ₎ ≤ (k/m)·q and rejects
    * exactly ranks ≤ k, controlling the expected false-discovery rate at
    * q. Implemented entirely in integers: p in micro-units, the step-up
    * criterion as p_micro·m ≤ rank·q_micro (cross-multiplied — no
    * division at all), k via a global max over flagged ranks.
    *
    * The gated face runs m = |source×lang| hypotheses with md5-derived
    * p-values where a deterministic half of the cells are planted "true
    * effects" (p concentrated below 1e-3), so the step-up boundary is
    * actually exercised — some planted cells are rejected, null cells
    * survive.
    *
    * Scale shape: hypotheses are AGGREGATE-level rows (one per segment —
    * metadata-sized by construction); the sort is one window over that
    * table. The corpus-sized work, had the p-values come from real
    * tests, happens upstream in the tests themselves (q163/q111/q116).
    */
  def bhStepUp(tests: DataFrame, pCol: String, idCols: Seq[String],
               qMicro: Long = 50000L): DataFrame = {
    val wAll = Window.partitionBy()
    val ord = Window.orderBy(col(pCol) +: idCols.map(col): _*)
    tests
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll).cast("long"))
      .withColumn("crit_met", col(pCol) * col("m") <= col("rk") * lit(qMicro))
      .withColumn("k_max",
        max(when(col("crit_met"), col("rk"))).over(wAll))
      .withColumn("rejected",
        col("k_max").isNotNull && col("rk") <= col("k_max"))
      .drop("crit_met")
  }

  /** Gated q178: BH at q=0.05 over per-(source, lang) planted p-values. */
  def bhFdr(spark: SparkSession, dir: String): DataFrame = {
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
    val cells = Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("key", concat(col("source"), lit("/"), col("lang")))
      .withColumn("p_micro",
        when(h(concat(lit("eff:"), col("key"))) % 2L === 0L,
          h(concat(lit("p:"), col("key"))) % 1000L)
          .otherwise(h(concat(lit("p:"), col("key"))) % 1000000L))
    bhStepUp(cells, "p_micro", Seq("key"))
      .select(col("source"), col("lang"), col("n_docs"), col("p_micro"),
        col("rk"), col("m"), col("k_max"), col("rejected"))
  }

  private val bhFdrSql =
    """WITH cells AS (
      |  SELECT source, lang, count(*) AS n_docs,
      |    source || '/' || lang AS key
      |  FROM documents GROUP BY 1, 2
      |),
      |ps AS (
      |  SELECT source, lang, n_docs, key,
      |    CASE WHEN ('0x' || substr(md5('eff:' || key), 1, 8))::BIGINT % 2 = 0
      |      THEN ('0x' || substr(md5('p:' || key), 1, 8))::BIGINT % 1000
      |      ELSE ('0x' || substr(md5('p:' || key), 1, 8))::BIGINT % 1000000
      |    END AS p_micro
      |  FROM cells
      |),
      |rk AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY p_micro, key) AS BIGINT) AS rk,
      |    CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM ps
      |),
      |km AS (
      |  SELECT *,
      |    max(CASE WHEN p_micro * m <= rk * 50000 THEN rk END) OVER () AS k_max
      |  FROM rk
      |)
      |SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(p_micro AS BIGINT) AS p_micro, rk, m,
      |  CAST(k_max AS BIGINT) AS k_max,
      |  k_max IS NOT NULL AND rk <= k_max AS rejected
      |FROM km""".stripMargin

  // --------------------------------------------------------------- q224
  /** Holm–Bonferroni step-down FWER control — the STRICT sibling of
    * q178's BH: BH bounds the expected FALSE-DISCOVERY RATE (fine for
    * screening many segment alarms), Holm bounds the probability of
    * even ONE false rejection (what a launch/no-launch decision or a
    * compliance report needs), uniformly more powerful than plain
    * Bonferroni and valid under arbitrary dependence. Sort p ascending;
    * reject ranks while p₍ᵣ₎ ≤ α/(m−r+1) and STOP at the first failure
    * (step-down: everything after the first survivor survives).
    *
    * Integer form (the q178 discipline): the criterion is the
    * cross-multiplied p_micro·(m−rk+1) ≤ α_micro — no division — and
    * the stop point is one window min over failed ranks. Ties on p are
    * broken by the id columns, deterministically in both engines.
    *
    * Scale shape: identical to q178 — hypotheses are aggregate-level
    * rows (metadata-sized by construction); one window over that frame.
    */
  def holmStepDown(tests: DataFrame, pCol: String, idCols: Seq[String],
                   alphaMicro: Long = 50000L): DataFrame = {
    val wAll = Window.partitionBy()
    val ord = Window.orderBy(col(pCol) +: idCols.map(col): _*)
    tests
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll).cast("long"))
      .withColumn("crit_met",
        col(pCol) * (col("m") - col("rk") + 1L) <= lit(alphaMicro))
      .withColumn("k_stop",
        min(when(!col("crit_met"), col("rk"))).over(wAll))
      .withColumn("rejected",
        col("k_stop").isNull || col("rk") < col("k_stop"))
      .drop("crit_met")
  }

  /** Gated q224: Holm at α=0.05 over the SAME planted per-(source, lang)
    * p-values as q178 — so the two tables read side by side show the
    * FDR-vs-FWER gap (Holm's rejections are a subset of BH's).
    */
  def holmFwer(spark: SparkSession, dir: String): DataFrame = {
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
    val cells = Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("key", concat(col("source"), lit("/"), col("lang")))
      .withColumn("p_micro",
        when(h(concat(lit("eff:"), col("key"))) % 2L === 0L,
          h(concat(lit("p:"), col("key"))) % 1000L)
          .otherwise(h(concat(lit("p:"), col("key"))) % 1000000L))
    holmStepDown(cells, "p_micro", Seq("key"))
      .select(col("source"), col("lang"), col("n_docs"), col("p_micro"),
        col("rk"), col("m"), col("k_stop"), col("rejected"))
  }

  private val holmFwerSql =
    """WITH cells AS (
      |  SELECT source, lang, count(*) AS n_docs,
      |    source || '/' || lang AS key
      |  FROM documents GROUP BY 1, 2
      |),
      |ps AS (
      |  SELECT source, lang, n_docs, key,
      |    CASE WHEN ('0x' || substr(md5('eff:' || key), 1, 8))::BIGINT % 2 = 0
      |      THEN ('0x' || substr(md5('p:' || key), 1, 8))::BIGINT % 1000
      |      ELSE ('0x' || substr(md5('p:' || key), 1, 8))::BIGINT % 1000000
      |    END AS p_micro
      |  FROM cells
      |),
      |rk AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY p_micro, key) AS BIGINT) AS rk,
      |    CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM ps
      |),
      |ks AS (
      |  SELECT *,
      |    min(CASE WHEN p_micro * (m - rk + 1) > 50000 THEN rk END) OVER ()
      |      AS k_stop
      |  FROM rk
      |)
      |SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(p_micro AS BIGINT) AS p_micro, rk, m,
      |  CAST(k_stop AS BIGINT) AS k_stop,
      |  k_stop IS NULL OR rk < k_stop AS rejected
      |FROM ks""".stripMargin

  // --------------------------------------------------------------- q180
  /** Inverse-propensity-scored offline policy evaluation — the
    * counterfactual "what would the NEW policy have earned?" replay every
    * recommender/bandit pipeline runs on logged interaction data before
    * an online test: V̂(π) = (1/n)·Σ rᵢ·1[π(xᵢ)=aᵢ]/p̂(aᵢ), keeping only
    * logged events whose action matches the candidate policy's choice and
    * re-weighting each by its logged propensity (here the empirical
    * action share n_a/n — the uniform-ish logger the events table
    * records). The algebra telescopes per action:
    * V̂ = Σ_a sum_r_match_a / n_a, so the gate emits one EXACT row per
    * action (rewards in integer cents; the contribution via the
    * micro-unit two-step division) and never sums truncated terms.
    *
    * The candidate policy is deterministic md5-over-user (the q80
    * stand-in discipline): π(user) = action whose alphabetical index is
    * H(user) mod k — any real scoring policy slots into the same plumbing.
    *
    * Scale shape: one events scan + a 5-row broadcast (the action
    * index), one hash aggregate per action. Nothing user- or
    * event-sized shuffles except the single keyed aggregate.
    */
  def ipsPolicyValue(logged: DataFrame, actionCol: String, userCol: String,
                     rewardCol: String): DataFrame = {
    // Internal renames keep the operator usable when the caller's own
    // column is already named "action".
    val base = logged.select(col(actionCol).as("_a"), col(userCol).as("_u"),
      col(rewardCol).as("_r"))
    // The action index is a ≤k-row frame; its global window is k-sized,
    // not data-sized (the q178 metadata-window exception).
    val idx = base.select(col("_a").as("action")).distinct()
      .withColumn("a_idx",
        row_number().over(Window.orderBy(col("action"))).cast("long") - 1L)
      .withColumn("k", count(lit(1)).over(Window.partitionBy()).cast("long"))
    base
      .join(broadcast(idx), col("_a") === col("action"))
      .withColumn("pi_idx",
        conv(substring(md5(concat(lit("pi:"), col("_u").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % col("k"))
      .withColumn("matched", col("a_idx") === col("pi_idx"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_a"),
        sum(when(col("matched"), 1L).otherwise(0L)).as("n_match"),
        sum(when(col("matched"), col("_r")).otherwise(0L))
          .as("match_cents"),
        sum(col("_r")).as("logged_cents"))
      .withColumn("ips_contrib_micro", expr(
        """(match_cents div n_a) * 1000000
          | + (1000000 * (match_cents - (match_cents div n_a) * n_a)) div n_a"""
          .stripMargin))
      .withColumn("avg_logged_micro", expr(
        """(logged_cents div n_a) * 1000000
          | + (1000000 * (logged_cents - (logged_cents div n_a) * n_a)) div n_a"""
          .stripMargin))
  }

  /** Gated q180: replay a hash-over-user candidate policy on the events
    * log; reward = event value in cents.
    */
  def offlinePolicyValue(spark: SparkSession, dir: String): DataFrame =
    ipsPolicyValue(
      Tables.events(spark, dir)
        .select(col("event_type"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents")),
      "event_type", "user_id", "cents")
      .select(col("action"), col("n_a"), col("n_match"), col("match_cents"),
        col("ips_contrib_micro"), col("avg_logged_micro"))

  private val offlinePolicyValueSql =
    """WITH idx AS (
      |  SELECT event_type AS action,
      |    CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) - 1 AS a_idx,
      |    CAST(count(*) OVER () AS BIGINT) AS k
      |  FROM (SELECT DISTINCT event_type FROM events)
      |),
      |logged AS (
      |  SELECT e.event_type AS action, i.a_idx, i.k,
      |    CAST(round(e.value * 100) AS BIGINT) AS cents,
      |    ('0x' || substr(md5('pi:' || CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT
      |      % i.k AS pi_idx
      |  FROM events e JOIN idx i ON i.action = e.event_type
      |),
      |s AS (
      |  SELECT action, count(*) AS n_a,
      |    sum(CASE WHEN a_idx = pi_idx THEN 1 ELSE 0 END) AS n_match,
      |    sum(CASE WHEN a_idx = pi_idx THEN cents ELSE 0 END) AS match_cents,
      |    sum(cents) AS logged_cents
      |  FROM logged GROUP BY 1
      |)
      |SELECT action, CAST(n_a AS BIGINT) AS n_a,
      |  CAST(n_match AS BIGINT) AS n_match,
      |  CAST(match_cents AS BIGINT) AS match_cents,
      |  CAST((match_cents // n_a) * 1000000
      |    + (1000000 * (match_cents - (match_cents // n_a) * n_a)) // n_a
      |    AS BIGINT) AS ips_contrib_micro,
      |  CAST((logged_cents // n_a) * 1000000
      |    + (1000000 * (logged_cents - (logged_cents // n_a) * n_a)) // n_a
      |    AS BIGINT) AS avg_logged_micro
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q190
  /** Cumulative gain / lift table — the decile chart a targeting team
    * reads before spending on the model's top segments: rank by score
    * descending, cut into 10 equal ntiles, and report per decile the
    * response rate, the cumulative capture of all positives, and the
    * lift over the base rate. Completes the threshold-free ranking
    * battery (q173 AUC summarizes it; q135 sweeps thresholds; this is
    * the business-facing slice). Every column is integer micro/ppm via
    * cross-multiplied exact division — lift_ppm = (n_pos·tot_n·1e6) div
    * (n·tot_pos) never computes a float rate.
    *
    * ntile ties break by the deterministic (score desc, doc_id) order,
    * identical in both engines.
    *
    * Scale shape — NO global sort (the r9 verdict's one `weak` plan,
    * fixed): the global rank is computed distributively in two passes.
    * Pass 1 hash-aggregates row counts per DISTINCT score value and
    * prefix-sums them in one tiny window over the score DOMAIN (score
    * cardinality, ≤1e6 for micro-unit scores — metadata-sized however
    * big the corpus is). Pass 2 joins each row to its score's rank
    * offset and adds `row_number` WITHIN the score partition (scores
    * sort in parallel — never a corpus in one partition). The ntile
    * bucket then falls out of the rank via the closed form Spark itself
    * uses (first n mod k buckets get ⌈n/k⌉ rows), so the result is
    * BIT-IDENTICAL to `ntile(10) OVER (ORDER BY score DESC, id)` — the
    * oracle stays the plain-SQL ntile — while the plan's only single-
    * partition exchange carries the distinct-score aggregate, not the
    * corpus (PlanAuditSpec pins exactly that). Per-score partitions are
    * balanced for any non-degenerate scorer; a scorer that emits one
    * constant score would re-concentrate and should pre-quantize.
    */
  /** Distributed exact ntile — bit-identical to
    * `ntile(k) OVER (ORDER BY score DESC, id)` with NO global sort:
    * rank offsets are prefix sums over the DISTINCT-score frame (the
    * only single-partition input, domain-sized at any corpus scale),
    * each row adds `row_number` WITHIN its score partition (scores sort
    * in parallel), and the tile falls out of the global rank via the
    * closed form Spark itself uses (first n mod k tiles take ⌈n/k⌉
    * rows). Adds `decile` (1..k) and `tot_rows`; callers drop what they
    * don't need. Factored out of q190 so every decile-shaped operator
    * (gain/lift, Lorenz concentration, Qini uplift) shares the one
    * scale-safe implementation.
    */
  private[analytics] def distributedNtile(scored: DataFrame, scoreCol: String,
                                          idCol: String, k: Int): DataFrame = {
    val perScore = scored.groupBy(col(scoreCol))
      .agg(count(lit(1)).as("score_n"))
    val offsets = perScore
      .withColumn("rank_start", coalesce(
        sum("score_n").over(Window.orderBy(col(scoreCol).desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(scoreCol), col("rank_start"))
    // tot_rows folds off the score-domain aggregate — no third corpus
    // scan; at 100 TB the corpus is read exactly twice (counts + join).
    val tot = perScore.agg(sum("score_n").as("tot_rows"))
    scored
      .join(offsets, Seq(scoreCol))
      .crossJoin(broadcast(tot))
      .withColumn("rk", col("rank_start") + row_number()
        .over(Window.partitionBy(col(scoreCol)).orderBy(col(idCol))))
      // ntile(k) closed form on the global rank: q = n div k and the
      // first n mod k tiles take q+1 rows (when q = 0 the first branch
      // covers every row, so the q-divisor branch never runs).
      .withColumn("decile", expr(
        s"""CASE WHEN rk <= (tot_rows % $k) * (tot_rows div $k + 1)
           |  THEN CAST((rk - 1) div (tot_rows div $k + 1) + 1 AS INT)
           |  ELSE CAST((tot_rows % $k)
           |    + (rk - (tot_rows % $k) * (tot_rows div $k + 1) - 1)
           |      div (tot_rows div $k) + 1 AS INT)
           |END""".stripMargin))
      .drop("rank_start", "rk")
  }

  def gainTable(scored: DataFrame, scoreCol: String, labelCol: String,
                idCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    distributedNtile(scored, scoreCol, idCol, 10)
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("tot_n", sum(col("n")).over(wAll))
      .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("resp_ppm", expr("(1000000 * n_pos) div n"))
      .withColumn("capture_ppm", expr("(1000000 * cum_pos) div tot_pos"))
      .withColumn("lift_ppm", expr("(1000000 * n_pos * tot_n) div (n * tot_pos)"))
      .drop("tot_n", "tot_pos")
  }

  /** Gated q190: gain/lift deciles of the synthetic calibrated scorer. */
  def classifierGainChart(spark: SparkSession, dir: String): DataFrame =
    gainTable(scoredDocs(Tables.documents(spark, dir)),
      "score_micro", "label", "doc_id")
      .select(col("decile"), col("n"), col("n_pos"), col("cum_pos"),
        col("resp_ppm"), col("capture_ppm"), col("lift_ppm"))

  private val classifierGainChartSql =
    """WITH scored AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |),
      |d AS (
      |  SELECT label,
      |    ntile(10) OVER (ORDER BY score_micro DESC, doc_id) AS decile
      |  FROM scored
      |),
      |g AS (
      |  SELECT decile, count(*) AS n,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos
      |  FROM d GROUP BY 1
      |),
      |t AS (
      |  SELECT *, sum(n) OVER () AS tot_n, sum(n_pos) OVER () AS tot_pos,
      |    sum(n_pos) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
      |  FROM g
      |)
      |SELECT CAST(decile AS INTEGER) AS decile, CAST(n AS BIGINT) AS n,
      |  CAST(n_pos AS BIGINT) AS n_pos, CAST(cum_pos AS BIGINT) AS cum_pos,
      |  CAST((1000000 * n_pos) // n AS BIGINT) AS resp_ppm,
      |  CAST((1000000 * cum_pos) // tot_pos AS BIGINT) AS capture_ppm,
      |  CAST((1000000 * n_pos * tot_n) // (n * tot_pos) AS BIGINT) AS lift_ppm
      |FROM t""".stripMargin

  // --------------------------------------------------------------- q218
  /** Qini / uplift decile table — q190's gain chart for TREATMENT
    * EFFECT: a targeting model is only worth deploying if the customers
    * it ranks highest respond BECAUSE of the treatment, not anyway.
    * Rank by model score descending (the q190 distributed exact ntile —
    * no global sort), then per decile compare treated vs control
    * response rates and accumulate the Qini value
    * Q(k) = cum_rt − cum_rc·(cum_nt/cum_nc) — the incremental responders
    * the treatment bought among the top k deciles, control-scaled.
    *
    * Exactness: all counts exact BIGINT from one hash aggregate; the
    * per-decile uplift and cumulative Qini ride the overflow-safe
    * two-step truncating division (numerators ≤ n², exact through
    * n ≈ 3·10⁹ rows). Deciles where a side is absent report null rates
    * (the q173 single-class rule).
    *
    * The gated face draws treatment from an independent md5 channel
    * (50/50) and gives treated rows a +10% response boost on top of the
    * calibrated base rate — so true uplift is FLAT across deciles
    * (~100k ppm) while response rises with score: exactly the case
    * where a naive response-ranked read overstates targeting value,
    * which is the lesson the table teaches.
    *
    * Scale shape: inherits [[distributedNtile]] (the only
    * single-partition exchange carries the distinct-score frame), then
    * one 10-group hash aggregate and 10-row frame windows.
    */
  def qiniTable(scored: DataFrame, scoreCol: String, treatedCol: String,
                outcomeCol: String, idCol: String): DataFrame = {
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    distributedNtile(scored, scoreCol, idCol, 10)
      .groupBy("decile")
      .agg(
        sum(when(col(treatedCol), 1L).otherwise(0L)).as("n_t"),
        sum(when(!col(treatedCol), 1L).otherwise(0L)).as("n_c"),
        sum(when(col(treatedCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("r_t"),
        sum(when(!col(treatedCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("r_c"))
      .withColumn("uplift_ppm",
        when(col("n_t") > 0 && col("n_c") > 0, expr(
          "(1000000 * r_t) div n_t - (1000000 * r_c) div n_c")))
      .withColumn("cum_nt", sum("n_t").over(wCum))
      .withColumn("cum_nc", sum("n_c").over(wCum))
      .withColumn("cum_rt", sum("r_t").over(wCum))
      .withColumn("cum_rc", sum("r_c").over(wCum))
      .withColumn("qini_micro",
        when(col("cum_nc") > 0, expr(
          """((cum_rt * cum_nc - cum_rc * cum_nt) div cum_nc) * 1000000
            | + (1000000 * (cum_rt * cum_nc - cum_rc * cum_nt
            |    - ((cum_rt * cum_nc - cum_rc * cum_nt) div cum_nc) * cum_nc))
            |   div cum_nc""".stripMargin)))
      .select(col("decile"), col("n_t"), col("n_c"), col("r_t"), col("r_c"),
        col("uplift_ppm"), col("qini_micro"))
  }

  /** Gated q218: Qini deciles of the calibrated scorer under a synthetic
    * +10%-uplift treatment drawn from an independent channel.
    */
  def classifierQini(spark: SparkSession, dir: String): DataFrame = {
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % 1000000L
    val rows = Tables.documents(spark, dir).select(
        col("doc_id"),
        h(col("doc_id").cast("string")).as("score_micro"),
        h(concat(lit("lbl:"), col("doc_id").cast("string"))).as("u"),
        (h(concat(lit("trt:"), col("doc_id").cast("string"))) < 500000L)
          .as("treated"))
      .withColumn("outcome", col("u") < when(col("treated"),
        least(col("score_micro") + 100000L, lit(1000000L)))
        .otherwise(col("score_micro")))
    qiniTable(rows, "score_micro", "treated", "outcome", "doc_id")
  }

  private val classifierQiniSql =
    """WITH rows_ AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS u,
      |    ('0x' || substr(md5('trt:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 < 500000 AS treated
      |  FROM documents
      |),
      |o AS (
      |  SELECT doc_id, score_micro, treated,
      |    u < CASE WHEN treated
      |      THEN least(score_micro + 100000, 1000000)
      |      ELSE score_micro END AS outcome
      |  FROM rows_
      |),
      |d AS (
      |  SELECT treated, outcome,
      |    ntile(10) OVER (ORDER BY score_micro DESC, doc_id) AS decile
      |  FROM o
      |),
      |g AS (
      |  SELECT decile,
      |    sum(CASE WHEN treated THEN 1 ELSE 0 END) AS n_t,
      |    sum(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS n_c,
      |    sum(CASE WHEN treated AND outcome THEN 1 ELSE 0 END) AS r_t,
      |    sum(CASE WHEN NOT treated AND outcome THEN 1 ELSE 0 END) AS r_c
      |  FROM d GROUP BY 1
      |),
      |c AS (
      |  SELECT *,
      |    sum(n_t) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_nt,
      |    sum(n_c) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_nc,
      |    sum(r_t) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rt,
      |    sum(r_c) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rc
      |  FROM g
      |)
      |SELECT CAST(decile AS INTEGER) AS decile, CAST(n_t AS BIGINT) AS n_t,
      |  CAST(n_c AS BIGINT) AS n_c, CAST(r_t AS BIGINT) AS r_t,
      |  CAST(r_c AS BIGINT) AS r_c,
      |  CASE WHEN n_t > 0 AND n_c > 0 THEN CAST(
      |    (1000000 * r_t) // n_t - (1000000 * r_c) // n_c AS BIGINT)
      |    END AS uplift_ppm,
      |  CASE WHEN cum_nc > 0 THEN CAST(
      |    ((cum_rt * cum_nc - cum_rc * cum_nt) // cum_nc) * 1000000
      |    + (1000000 * (cum_rt * cum_nc - cum_rc * cum_nt
      |       - ((cum_rt * cum_nc - cum_rc * cum_nt) // cum_nc) * cum_nc))
      |      // cum_nc AS BIGINT) END AS qini_micro
      |FROM c""".stripMargin

  // --------------------------------------------------------------- q191
  /** Cross-validated metric stability — one AUC per q181-style fold, the
    * "is the headline number luck?" check: a metric whose per-fold
    * spread is wide is not a metric to ship on. Pure composition of two
    * gated kernels (the q181 deterministic fold hash as the group, the
    * q173 doubled-rank AUC as the statistic) — which is the point:
    * evaluation primitives must compose without new machinery.
    */
  def cvAuc(spark: SparkSession, dir: String): DataFrame = {
    val folded = scoredDocs(Tables.documents(spark, dir))
      .withColumn("fold",
        conv(substring(md5(concat(lit("fold:"), col("doc_id").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % 5L)
    aucExact(folded, "fold", "score_micro", "label")
      .select(col("fold"), col("n_pos"), col("n_neg"), col("auc_micro"))
  }

  private val cvAucSql =
    """WITH scored AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 5 AS fold,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |),
      |ranked AS (
      |  SELECT fold, label,
      |    2 * CAST(rank() OVER (PARTITION BY fold ORDER BY score_micro) AS BIGINT)
      |      + CAST(count(*) OVER (PARTITION BY fold, score_micro) AS BIGINT)
      |      - 1 AS rk2
      |  FROM scored
      |),
      |s AS (
      |  SELECT fold,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
      |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg,
      |    sum(CASE WHEN label THEN rk2 ELSE 0 END) AS r2_pos
      |  FROM ranked GROUP BY 1
      |),
      |u AS (
      |  SELECT fold, n_pos, n_neg, r2_pos - n_pos * (n_pos + 1) AS u2 FROM s
      |)
      |SELECT fold, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_neg AS BIGINT) AS n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN CAST(
      |    (u2 // (2 * n_pos * n_neg)) * 1000000
      |    + (1000000 * (u2 - (u2 // (2 * n_pos * n_neg)) * (2 * n_pos * n_neg)))
      |      // (2 * n_pos * n_neg) AS BIGINT) END AS auc_micro
      |FROM u""".stripMargin

  // --------------------------------------------------------------- q199
  /** Weight-of-Evidence / Information-Value binning — the credit-scoring
    * feature audit: per feature bin, WOE = ln(pos-share / neg-share)
    * says which way the bin votes, and IV = Σ (pos-share − neg-share)·WOE
    * ranks features by separating power (IV < 0.02 useless, > 0.5
    * suspiciously strong). Structurally PSI's supervised sibling — the
    * same smoothed-share ln arithmetic with (positives, negatives)
    * replacing (reference, current) — and gated under the same
    * discipline: add-one smoothing so ln never sees 0, per-bin terms
    * floored to micro/ppm individually so any total is an integer sum.
    *
    * Scale shape: one scan → bins-sized aggregate; shares derive from
    * two global sums over the bin frame.
    */
  def woeIv(scored: DataFrame, binCol: String, labelCol: String,
            nBins: Int): DataFrame = {
    val wAll = Window.partitionBy()
    scored
      .groupBy(col(binCol).as("bin"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col(labelCol), 1L).otherwise(0L)).as("n_neg"))
      .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("tot_neg", sum(col("n_neg")).over(wAll))
      .withColumn("p", (col("n_pos") + 1).cast("double")
        / (col("tot_pos") + nBins).cast("double"))
      .withColumn("q", (col("n_neg") + 1).cast("double")
        / (col("tot_neg") + nBins).cast("double"))
      .withColumn("woe_micro",
        floor(log(col("p") / col("q")) * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("iv_ppm",
        floor((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e6)
          + lit(0.5)).cast("long"))
      .drop("p", "q")
  }

  /** Gated q199: WOE/IV of the synthetic calibrated score's deciles. */
  def scoreWoeIv(spark: SparkSession, dir: String): DataFrame =
    woeIv(scoredDocs(Tables.documents(spark, dir))
      .withColumn("bin", expr("score_micro div 100000")),
      "bin", "label", 10)
      .select(col("bin"), col("n_pos"), col("n_neg"), col("tot_pos"),
        col("tot_neg"), col("woe_micro"), col("iv_ppm"))

  private val scoreWoeIvSql =
    """WITH scored AS (
      |  SELECT
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |),
      |b AS (
      |  SELECT score_micro // 100000 AS bin,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
      |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
      |  FROM scored GROUP BY 1
      |),
      |t AS (
      |  SELECT *, sum(n_pos) OVER () AS tot_pos, sum(n_neg) OVER () AS tot_neg
      |  FROM b
      |)
      |SELECT CAST(bin AS BIGINT) AS bin, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_neg AS BIGINT) AS n_neg, CAST(tot_pos AS BIGINT) AS tot_pos,
      |  CAST(tot_neg AS BIGINT) AS tot_neg,
      |  CAST(floor(ln(((n_pos + 1)::DOUBLE / (tot_pos + 10)::DOUBLE)
      |    / ((n_neg + 1)::DOUBLE / (tot_neg + 10)::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS woe_micro,
      |  CAST(floor(((n_pos + 1)::DOUBLE / (tot_pos + 10)::DOUBLE
      |    - (n_neg + 1)::DOUBLE / (tot_neg + 10)::DOUBLE)
      |    * ln(((n_pos + 1)::DOUBLE / (tot_pos + 10)::DOUBLE)
      |      / ((n_neg + 1)::DOUBLE / (tot_neg + 10)::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS iv_ppm
      |FROM t""".stripMargin

  // --------------------------------------------------------------- q202
  /** Cohen's kappa between two REAL quality gates — the labeling-QA
    * measure: raw agreement between two filters overstates consensus
    * when both keep most documents; kappa subtracts the agreement their
    * marginal keep-rates would produce by chance. Rater A is the q50
    * per-language token-count quartile gate; rater B is the q80 hashed
    * linear classifier — two filters a curation pipeline actually runs
    * side by side. The 2×2 confusion cells (a,b,c,d) are exact BIGINTs;
    * kappa = (N(a+d) − [(a+b)(a+c)+(c+d)(b+d)]) / (N² − [...]) finishes
    * through the q167 CUPED fixed-double-sequence + floor(+½) because
    * N² outgrows BIGINT at corpus scale (the q195 lesson, applied
    * preemptively).
    *
    * Scale shape: the two gates' own audited plans (per-language window;
    * explode + broadcast model join) joined on doc_id, collapsed to one
    * 4-cell aggregate.
    */
  def raterKappa(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val gateA = TrainingData.percentileGate(
      docs.select(col("lang"), col("doc_id"),
        size(graft.functions.shingleStrings(col("text"), 1)).cast("long")
          .as("n_toks")),
      col("lang"), col("n_toks"), col("doc_id"), keepFrom = 0.75)
      .select(col("doc_id"), (col("kept") === 1).as("keep_a"))
    val weights = spark.range(TrainingData.ClfBuckets).toDF("b")
      .select(col("b"),
        ((conv(substring(md5(col("b").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long") % lit(2001L)) - lit(1000L)).as("weight"))
    val gateB = TrainingData.classifierScore(docs, weights)
      .select(col("doc_id"), (col("mean_units") > 0).as("keep_b"))
    gateA.join(gateB, Seq("doc_id"))
      .groupBy()
      .agg(
        sum(when(col("keep_a") && col("keep_b"), 1L).otherwise(0L)).as("a"),
        sum(when(col("keep_a") && !col("keep_b"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("keep_a") && col("keep_b"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("keep_a") && !col("keep_b"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("kappa_ppm",
        floor((col("n").cast("double")
          * (col("a") + col("d")).cast("double")
          - ((col("a") + col("b")).cast("double")
            * (col("a") + col("c")).cast("double")
            + (col("c") + col("d")).cast("double")
              * (col("b") + col("d")).cast("double")))
          / (col("n").cast("double") * col("n").cast("double")
            - ((col("a") + col("b")).cast("double")
              * (col("a") + col("c")).cast("double")
              + (col("c") + col("d")).cast("double")
                * (col("b") + col("d")).cast("double")))
          * lit(1e6) + lit(0.5)).cast("long"))
  }

  private val raterKappaSql =
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |    len(list_filter(string_split_regex(lower(text), '\\s+'),
       |        x -> x <> '')) AS n_toks
       |  FROM documents
       |),
       |ga AS (
       |  SELECT doc_id,
       |    percent_rank() OVER (PARTITION BY lang ORDER BY n_toks, doc_id)
       |      >= 0.75 AS keep_a
       |  FROM t
       |),
       |ws AS (
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
       |    ('0x' || substr(md5(f), 1, 8))::BIGINT % ${TrainingData.ClfBuckets} AS b
       |  FROM feat GROUP BY doc_id, b
       |),
       |wt AS (
       |  SELECT b, ('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 8))::BIGINT
       |    % 2001 - 1000 AS weight
       |  FROM (SELECT unnest(range(${TrainingData.ClfBuckets})) AS b)
       |),
       |gb AS (
       |  SELECT doc_id,
       |    (sum(n_fb * weight) // sum(n_fb)) > 0 AS keep_b
       |  FROM fb JOIN wt USING (b) GROUP BY doc_id
       |),
       |cells AS (
       |  SELECT
       |    sum(CASE WHEN keep_a AND keep_b THEN 1 ELSE 0 END) AS a,
       |    sum(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS b,
       |    sum(CASE WHEN NOT keep_a AND keep_b THEN 1 ELSE 0 END) AS c,
       |    sum(CASE WHEN NOT keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS d
       |  FROM ga JOIN gb USING (doc_id)
       |)
       |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       |  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       |  CAST(a + b + c + d AS BIGINT) AS n,
       |  CAST(floor(((a + b + c + d)::DOUBLE * (a + d)::DOUBLE
       |    - ((a + b)::DOUBLE * (a + c)::DOUBLE
       |       + (c + d)::DOUBLE * (b + d)::DOUBLE))
       |    / ((a + b + c + d)::DOUBLE * (a + b + c + d)::DOUBLE
       |      - ((a + b)::DOUBLE * (a + c)::DOUBLE
       |         + (c + d)::DOUBLE * (b + d)::DOUBLE))
       |    * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS kappa_ppm
       |FROM cells""".stripMargin

  // --------------------------------------------------------------- q255
  /** Isotonic calibration via the minimax closed form — the standard
    * probability-calibration fit (Zadrozny & Elkan 2002) that q174's
    * reliability bins diagnose the need for: the weighted isotonic
    * regression over score bins has the exact solution
    * iso(t) = max_{i≤t} min_{j≥t} wavg(i..j) (the max-min formula dual
    * to PAVA), monotone by construction.
    *
    * Exactness: bin weights/positives and their prefix sums are exact
    * BIGINT; each interval average is ONE double division of exact
    * integers, so the min/max lattice selects identical values on both
    * engines, and the fitted rate floors to micro once at the end.
    *
    * Scale shape: the corpus collapses to score BINS in one hash
    * aggregate; the (i, j, t) lattice is bins³ ≤ 10³ rows of metadata —
    * the q232 grid discipline — so the fit costs one corpus scan
    * regardless of size. (Bin-level PAVA is the standard large-scale
    * practice; per-row isotonic at 100 TB is neither needed nor
    * statistically different once bins are fine enough.)
    */
  def isotonicCalibration(scored: DataFrame, scoreCol: String,
                          labelCol: String): DataFrame = {
    val wOrd = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = scored
      .groupBy((col(scoreCol) / 100000L).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("cw", sum("n").over(wOrd))
      .withColumn("cp", sum("n_pos").over(wOrd))
      .localCheckpoint()
    val a = pre.select(col("bin").as("i"), (col("cw") - col("n")).as("cw0"),
      (col("cp") - col("n_pos")).as("cp0"))
    val b = pre.select(col("bin").as("j"), col("cw").as("cwj"),
      col("cp").as("cpj"))
    val pairs = a.join(b, col("i") <= col("j"))
      .withColumn("avg", (col("cpj") - col("cp0")).cast("double")
        / (col("cwj") - col("cw0")).cast("double"))
    val iso = pairs
      .join(pre.select(col("bin").as("t")),
        col("i") <= col("t") && col("t") <= col("j"))
      .groupBy("t", "i").agg(min("avg").as("m"))
      .groupBy("t").agg(max("m").as("iso_rate"))
    pre.join(iso, col("bin") === col("t"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos div n) * 1000000 + (1000000 * (n_pos - (n_pos div n) * n)) div n")
          .as("raw_rate_micro"),
        floor(col("iso_rate") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("iso_rate_micro"))
  }

  /** Gated q255: the isotonic fit of the synthetic scorer's reliability
    * bins — read next to q174's raw bins; iso_rate_micro is monotone in
    * bin by construction.
    */
  def calibrationIsotonic(spark: SparkSession, dir: String): DataFrame =
    isotonicCalibration(scoredDocs(Tables.documents(spark, dir)),
      "score_micro", "label")

  private val calibrationIsotonicSql =
    """WITH scored AS (
      |  SELECT
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |),
      |bins AS (
      |  SELECT score_micro // 100000 AS bin, count(*) AS n,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos
      |  FROM scored GROUP BY 1
      |),
      |pre AS (
      |  SELECT bin, n, n_pos,
      |    sum(n) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    sum(n_pos) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
      |  FROM bins
      |),
      |pairs AS (
      |  SELECT a.bin AS i, b.bin AS j,
      |    (b.cp - (a.cp - a.n_pos))::DOUBLE
      |      / (b.cw - (a.cw - a.n))::DOUBLE AS avg
      |  FROM pre a JOIN pre b ON a.bin <= b.bin
      |),
      |iso AS (
      |  SELECT t, max(m) AS iso_rate FROM (
      |    SELECT tt.bin AS t, p.i, min(p.avg) AS m
      |    FROM pairs p JOIN pre tt ON p.i <= tt.bin AND tt.bin <= p.j
      |    GROUP BY 1, 2)
      |  GROUP BY 1
      |)
      |SELECT p.bin, CAST(p.n AS BIGINT) AS n, CAST(p.n_pos AS BIGINT) AS n_pos,
      |  CAST((p.n_pos // p.n) * 1000000
      |    + (1000000 * (p.n_pos - (p.n_pos // p.n) * p.n)) // p.n AS BIGINT)
      |    AS raw_rate_micro,
      |  CAST(floor(i.iso_rate * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
      |    AS iso_rate_micro
      |FROM pre p JOIN iso i ON i.t = p.bin""".stripMargin

  // --------------------------------------------------------------- q256
  /** DeLong confidence interval for the ROC AUC (DeLong, DeLong &
    * Clarke-Pearson 1988) — the error bar q173's point estimate and
    * q191's fold spread gesture at: SE² = S10/n⁺ + S01/n⁻ where S10/S01
    * are the sample variances of the positive/negative placement values
    * V10(x⁺) = (#neg < x⁺ + ½·ties)/n⁻ and V01 symmetric.
    *
    * Exactness: placements ride doubled integer counts on the SCORE
    * DOMAIN — v2_10 = 2·(neg below) + neg ties per distinct score, so
    * Σw·v2 and Σw·v2² are exact DECIMAL(38,0) moments, AUC =
    * Σ⁺v2_10/(2n⁺n⁻) is the exact integer two-step division (equal to
    * q173's rank identity), and S10/S01/SE/CI are fixed double
    * sequences over the exact moments. The 1.96 normal quantile is an
    * engine-literal constant (the q201 SPRT-constant discipline).
    * Groups without ≥2 of each class report null CI.
    *
    * Scale shape: one corpus scan → (group, score) cells; placement
    * windows run on the domain-bounded frame (the q214 rationale); the
    * fold is group-sized.
    */
  def delongAucCi(scored: DataFrame, groupCol: String, scoreCol: String,
                  labelCol: String): DataFrame = {
    val cells = scored
      .groupBy(col(groupCol).as("g"), col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("np"),
        sum(when(!col(labelCol), 1L).otherwise(0L)).as("nn"))
    val wBelow = Window.partitionBy("g").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("g")
    val placed = cells
      .withColumn("negb", coalesce(sum("nn").over(wBelow), lit(0L)))
      .withColumn("posb", coalesce(sum("np").over(wBelow), lit(0L)))
      .withColumn("n1", sum("np").over(wAll))
      .withColumn("n0", sum("nn").over(wAll))
      .withColumn("v2p", col("negb") * 2L + col("nn"))
      .withColumn("v2n",
        (col("n1") - col("posb") - col("np")) * 2L + col("np"))
    val g = placed.groupBy("g")
      .agg(max("n1").as("n1"), max("n0").as("n0"),
        sum(col("np").cast("decimal(38,0)") * col("v2p")).as("sp1"),
        sum(col("np").cast("decimal(38,0)") * col("v2p") * col("v2p"))
          .as("sp2"),
        sum(col("nn").cast("decimal(38,0)") * col("v2n")).as("sn1"),
        sum(col("nn").cast("decimal(38,0)") * col("v2n") * col("v2n"))
          .as("sn2"))
      .filter(col("n1") >= 1L && col("n0") >= 1L)
      .withColumn("auc_micro", expr(
        """(sp1 div (2 * n1 * n0)) * 1000000
          | + (1000000 * (sp1 - (sp1 div (2 * n1 * n0)) * (2 * n1 * n0)))
          |   div (2 * n1 * n0)""".stripMargin).cast("long"))
    val auc = col("sp1").cast("double") /
      (lit(2.0) * col("n1").cast("double") * col("n0").cast("double"))
    val s10 = (col("sp2").cast("double")
      - col("sp1").cast("double") * col("sp1").cast("double")
        / col("n1").cast("double")) /
      (col("n1") - 1L).cast("double") /
      (lit(4.0) * col("n0").cast("double") * col("n0").cast("double"))
    val s01 = (col("sn2").cast("double")
      - col("sn1").cast("double") * col("sn1").cast("double")
        / col("n0").cast("double")) /
      (col("n0") - 1L).cast("double") /
      (lit(4.0) * col("n1").cast("double") * col("n1").cast("double"))
    val se = sqrt(s10 / col("n1").cast("double") + s01 / col("n0").cast("double"))
    g.withColumn("se_micro",
        when(col("n1") >= 2L && col("n0") >= 2L,
          floor(se * lit(1000000.0) + lit(0.5)).cast("long")))
      .withColumn("lo_micro",
        when(col("n1") >= 2L && col("n0") >= 2L,
          floor((auc - lit(1.96) * se) * lit(1000000.0) + lit(0.5))
            .cast("long")))
      .withColumn("hi_micro",
        when(col("n1") >= 2L && col("n0") >= 2L,
          floor((auc + lit(1.96) * se) * lit(1000000.0) + lit(0.5))
            .cast("long")))
      .select(col("g"), col("n1").as("n_pos"), col("n0").as("n_neg"),
        col("auc_micro"), col("se_micro"), col("lo_micro"), col("hi_micro"))
  }

  /** Gated q256: the DeLong 95% CI around each source's AUC — the same
    * synthetic scorer as q173, now with its error bar.
    */
  def classifierAucCi(spark: SparkSession, dir: String): DataFrame =
    delongAucCi(scoredDocs(Tables.documents(spark, dir)),
      "source", "score_micro", "label")
      .withColumnRenamed("g", "source")

  private val classifierAucCiSql =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS s,
      |    ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS label
      |  FROM documents
      |),
      |cells AS (
      |  SELECT source AS g, s,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS np,
      |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS nn
      |  FROM scored GROUP BY 1, 2
      |),
      |placed AS (
      |  SELECT g, np, nn,
      |    coalesce(sum(nn) OVER (PARTITION BY g ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS negb,
      |    coalesce(sum(np) OVER (PARTITION BY g ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS posb,
      |    sum(np) OVER (PARTITION BY g) AS n1,
      |    sum(nn) OVER (PARTITION BY g) AS n0
      |  FROM cells
      |),
      |folded AS (
      |  SELECT g, max(n1) AS n1, max(n0) AS n0,
      |    sum(np::HUGEINT * (negb * 2 + nn)) AS sp1,
      |    sum(np::HUGEINT * (negb * 2 + nn) * (negb * 2 + nn)) AS sp2,
      |    sum(nn::HUGEINT * ((n1 - posb - np) * 2 + np)) AS sn1,
      |    sum(nn::HUGEINT * ((n1 - posb - np) * 2 + np)
      |      * ((n1 - posb - np) * 2 + np)) AS sn2
      |  FROM placed GROUP BY 1
      |  HAVING max(n1) >= 1 AND max(n0) >= 1
      |)
      |SELECT g AS source, CAST(n1 AS BIGINT) AS n_pos,
      |  CAST(n0 AS BIGINT) AS n_neg,
      |  CAST((sp1 // (2 * n1 * n0)) * 1000000
      |    + (1000000 * (sp1 - (sp1 // (2 * n1 * n0)) * (2 * n1 * n0)))
      |      // (2 * n1 * n0) AS BIGINT) AS auc_micro,
      |  CAST(CASE WHEN n1 >= 2 AND n0 >= 2 THEN floor(
      |    sqrt((sp2::DOUBLE - sp1::DOUBLE * sp1::DOUBLE / n1::DOUBLE)
      |        / (n1 - 1)::DOUBLE
      |        / (4.0::DOUBLE * n0::DOUBLE * n0::DOUBLE) / n1::DOUBLE
      |      + (sn2::DOUBLE - sn1::DOUBLE * sn1::DOUBLE / n0::DOUBLE)
      |        / (n0 - 1)::DOUBLE
      |        / (4.0::DOUBLE * n1::DOUBLE * n1::DOUBLE) / n0::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) END AS BIGINT) AS se_micro,
      |  CAST(CASE WHEN n1 >= 2 AND n0 >= 2 THEN floor(
      |    (sp1::DOUBLE / (2.0::DOUBLE * n1::DOUBLE * n0::DOUBLE)
      |      - 1.96::DOUBLE * sqrt(
      |        (sp2::DOUBLE - sp1::DOUBLE * sp1::DOUBLE / n1::DOUBLE)
      |          / (n1 - 1)::DOUBLE
      |          / (4.0::DOUBLE * n0::DOUBLE * n0::DOUBLE) / n1::DOUBLE
      |        + (sn2::DOUBLE - sn1::DOUBLE * sn1::DOUBLE / n0::DOUBLE)
      |          / (n0 - 1)::DOUBLE
      |          / (4.0::DOUBLE * n1::DOUBLE * n1::DOUBLE) / n0::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) END AS BIGINT) AS lo_micro,
      |  CAST(CASE WHEN n1 >= 2 AND n0 >= 2 THEN floor(
      |    (sp1::DOUBLE / (2.0::DOUBLE * n1::DOUBLE * n0::DOUBLE)
      |      + 1.96::DOUBLE * sqrt(
      |        (sp2::DOUBLE - sp1::DOUBLE * sp1::DOUBLE / n1::DOUBLE)
      |          / (n1 - 1)::DOUBLE
      |          / (4.0::DOUBLE * n0::DOUBLE * n0::DOUBLE) / n1::DOUBLE
      |        + (sn2::DOUBLE - sn1::DOUBLE * sn1::DOUBLE / n0::DOUBLE)
      |          / (n0 - 1)::DOUBLE
      |          / (4.0::DOUBLE * n1::DOUBLE * n1::DOUBLE) / n0::DOUBLE))
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) END AS BIGINT) AS hi_micro
      |FROM folded""".stripMargin

  // --------------------------------------------------------------- q257
  /** Krippendorff's alpha (nominal, complete panel) — the multi-rater
    * reliability coefficient beyond q202's two-rater Cohen's kappa: for
    * m raters per unit and binary nominal values, the coincidence-matrix
    * algebra collapses to the EXACT integer ratio
    * α = 1 − Do_num·(n_tot−1) / ((m−1)·n_0·n_1), where Do_num =
    * Σ_u c_u·(m−c_u) (within-unit disagreeing ordered pairs numerator),
    * n_v the value marginals and n_tot = m·U — so alpha_micro is a pure
    * integer division, no float anywhere (Krippendorff 2004, ch. 11;
    * the binary-nominal closed form).
    *
    * Complete-panel contract: units with a rating count ≠ m are
    * excluded (the q228 guard shape) — the missing-data generalization
    * changes the per-unit denominator to m_u−1 and is a documented
    * non-goal of the gated form.
    *
    * Scale shape: one scan of the (unit, rater, value) table → per-unit
    * counts → one scalar fold. Products ride DECIMAL(38,0) (n_0·n_1
    * crosses 2⁶³ past ~3·10⁹ ratings).
    */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
                        labelCol: String, m: Int): DataFrame =
    ratings
      .groupBy(col(unitCol))
      .agg(count(lit(1)).as("m_u"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("c_u"))
      .filter(col("m_u") === m.toLong)
      .agg(count(lit(1)).as("n_units"),
        sum(col("c_u") * (lit(m.toLong) - col("c_u"))).as("do_num"),
        sum("c_u").as("n_pos"))
      .withColumn("n_tot", col("n_units") * m.toLong)
      .withColumn("n_neg", col("n_tot") - col("n_pos"))
      .withColumn("alpha_micro",
        when(col("n_pos") > 0L && col("n_neg") > 0L, expr(
          s"""1000000 - (1000000 * CAST(do_num AS DECIMAL(38,0))
             |  * (n_tot - 1))
             |  div (${m - 1} * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"""
            .stripMargin).cast("long")))
      .select(col("n_units"), col("n_tot"), col("n_pos"), col("do_num"),
        col("alpha_micro"))

  /** Gated q257: a deterministic 3-rater panel over the synthetic
    * scorer — rater j flags a doc via an independent hash draw against
    * the doc's score, so raters agree more on extreme scores. One row:
    * the exact integer alpha.
    */
  def raterPanelAlpha(spark: SparkSession, dir: String): DataFrame = {
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % 1000000L
    val base = scoredDocs(Tables.documents(spark, dir))
    val ratings = (1 to 3).map { j =>
      base.select(col("doc_id"),
        (h(concat(lit(s"r$j:"), col("doc_id").cast("string")))
          < col("score_micro")).as("label"))
    }.reduce(_ unionByName _)
    krippendorffAlpha(ratings, "doc_id", "label", m = 3)
  }

  private val raterPanelAlphaSql =
    """WITH scored AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS score_micro
      |  FROM documents
      |),
      |ratings AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5('r' || CAST(j AS VARCHAR) || ':'
      |      || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
      |      < score_micro AS label
      |  FROM scored, unnest([1, 2, 3]) AS t(j)
      |),
      |units AS (
      |  SELECT doc_id, count(*) AS m_u,
      |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS c_u
      |  FROM ratings GROUP BY 1 HAVING count(*) = 3
      |),
      |folded AS (
      |  SELECT count(*) AS n_units, sum(c_u * (3 - c_u)) AS do_num,
      |    sum(c_u) AS n_pos
      |  FROM units
      |)
      |SELECT CAST(n_units AS BIGINT) AS n_units,
      |  CAST(n_units * 3 AS BIGINT) AS n_tot,
      |  CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(do_num AS BIGINT) AS do_num,
      |  CAST(CASE WHEN n_pos > 0 AND n_units * 3 - n_pos > 0 THEN
      |    1000000 - (1000000 * do_num::HUGEINT * (n_units * 3 - 1))
      |      // (2 * n_pos::HUGEINT * (n_units * 3 - n_pos))
      |    END AS BIGINT) AS alpha_micro
      |FROM folded""".stripMargin

  // --------------------------------------------------------------- q259
  /** Spiegelhalter's calibration z test (Spiegelhalter 1986) — the
    * HYPOTHESIS-TEST member of the calibration family: q174 bins the
    * reliability diagram, q255 fits the monotone correction, this asks
    * "is the observed miscalibration more than chance?" via
    * z = Σ(y−p)(1−2p) / √(Σ(1−2p)²·p·(1−p)), which under perfect
    * calibration is standard normal without any binning choice.
    *
    * Exactness: with p in micro units P and y ∈ {0, 10⁶}, the numerator
    * term ×10¹² is the exact integer (Y−P)(10⁶−2P) and the variance
    * term ×10²⁴ is (10⁶−2P)²·P·(10⁶−P) — both summed on DECIMAL(38,0),
    * and the 10¹²/√10²⁴ scales cancel, so z is ONE double division of
    * exact integers, floored to micro. Degenerate groups (all p ∈
    * {0, 1}) report null.
    *
    * Scale shape: a single scan → per-group fold of two exact sums —
    * the q205 aggregate class.
    */
  def spiegelhalterZ(scored: DataFrame, groupCol: String, scoreCol: String,
                     labelCol: String): DataFrame =
    scored
      .select(col(groupCol).as("g"), col(scoreCol).cast("long").as("p"),
        when(col(labelCol), 1000000L).otherwise(0L).as("y"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(((col("y") - col("p")).cast("decimal(38,0)")
          * (lit(1000000L) - col("p") * 2L))).as("num12"),
        sum(((lit(1000000L) - col("p") * 2L).cast("decimal(38,0)")
          * (lit(1000000L) - col("p") * 2L)
          * col("p") * (lit(1000000L) - col("p")))).as("den24"))
      .withColumn("z_micro",
        when(col("den24") > 0L,
          floor(col("num12").cast("double") / sqrt(col("den24").cast("double"))
            * lit(1000000.0) + lit(0.5)).cast("long")))
      .select(col("g"), col("n"), col("z_micro"))

  /** Gated q259: per source, is the synthetic scorer calibrated? (It is
    * by construction — P(y=1 | p) = p under the two independent hash
    * draws — so the emitted z values are the test's null behavior.)
    */
  def classifierCalibrationZ(spark: SparkSession, dir: String): DataFrame =
    spiegelhalterZ(scoredDocs(Tables.documents(spark, dir)),
      "source", "score_micro", "label")
      .withColumnRenamed("g", "source")

  private val classifierCalibrationZSql =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 AS p,
      |    CASE WHEN ('0x' || substr(md5('lbl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000
      |      < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      % 1000000 THEN 1000000 ELSE 0 END AS y
      |  FROM documents
      |),
      |folded AS (
      |  SELECT source AS g, count(*) AS n,
      |    sum((y - p)::HUGEINT * (1000000 - 2 * p)) AS num12,
      |    sum((1000000 - 2 * p)::HUGEINT * (1000000 - 2 * p)
      |      * p * (1000000 - p)) AS den24
      |  FROM scored GROUP BY 1
      |)
      |SELECT g AS source, CAST(n AS BIGINT) AS n,
      |  CAST(CASE WHEN den24 > 0 THEN floor(
      |    num12::DOUBLE / sqrt(den24::DOUBLE)
      |    * 1000000.0::DOUBLE + 0.5::DOUBLE) END AS BIGINT) AS z_micro
      |FROM folded""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q259_spiegelhalter_z", classifierCalibrationZ _,
      Some(classifierCalibrationZSql)),
    NamedQuery("q257_krippendorff_alpha", raterPanelAlpha _,
      Some(raterPanelAlphaSql)),
    NamedQuery("q255_isotonic_calibration", calibrationIsotonic _,
      Some(calibrationIsotonicSql)),
    NamedQuery("q256_delong_auc_ci", classifierAucCi _,
      Some(classifierAucCiSql)),
    NamedQuery("q202_rater_kappa", raterKappa _, Some(raterKappaSql)),
    NamedQuery("q199_woe_iv", scoreWoeIv _, Some(scoreWoeIvSql)),
    NamedQuery("q190_gain_chart", classifierGainChart _,
      Some(classifierGainChartSql)),
    NamedQuery("q191_cv_auc", cvAuc _, Some(cvAucSql)),
    NamedQuery("q173_classifier_auc", classifierAuc _, Some(classifierAucSql)),
    NamedQuery("q174_reliability_bins", calibrationBins _,
      Some(calibrationBinsSql)),
    NamedQuery("q212_brier_decomposition", brierBySource _, Some(brierSql)),
    NamedQuery("q213_threshold_sweep", thresholdSweepDocs _,
      Some(thresholdSweepSql)),
    NamedQuery("q215_mcnemar_paired", pairedModelMcnemar _,
      Some(mcnemarSql)),
    NamedQuery("q218_qini_uplift", classifierQini _,
      Some(classifierQiniSql)),
    NamedQuery("q178_bh_fdr", bhFdr _, Some(bhFdrSql)),
    NamedQuery("q224_holm_fwer", holmFwer _, Some(holmFwerSql)),
    NamedQuery("q180_offline_policy", offlinePolicyValue _,
      Some(offlinePolicyValueSql)))
}
