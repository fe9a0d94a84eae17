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
    * One shuffle on the stratum key.
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
    val trainFp = docs
      .select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
    eval.select(col("source"), TextAnalysis.fingerprint(col("text")).as("efp"))
      .join(trainFp, col("efp") === col("fp"), "left")
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

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q35_hash_split", hashSplitSummary _, Some(hashSplitSql)),
    NamedQuery("q36_contamination", contaminationCheck _, Some(contaminationSql)),
    NamedQuery("q37_stratified_sample", stratifiedSampleByLang _, Some(stratifiedSampleSql)),
    NamedQuery("q38_top_tokens", topTokensPerLang _, Some(topTokensSql)))
}
