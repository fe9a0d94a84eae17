package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Probabilistic record linkage — the Fellegi–Sunter shape every entity-
  * resolution pipeline runs when two sources lack a shared key: BLOCK
  * candidate pairs on cheap deterministic keys (never all-pairs), score
  * each pair by summing per-field agreement/disagreement LOG-ODDS
  * weights, and threshold the sum. The q17/q104 candidate-generation
  * discipline applied to entities instead of documents: the pair space
  * is the blocked join, work ∝ Σ block sizes, and every comparator is
  * integer-exact (Levenshtein is an integer; money compares in cents),
  * so the score table is engine-exact with no float anywhere.
  *
  * Scale shape: one equi-join on the block key (hash-shuffled both
  * sides), per-pair comparators inside the join's codegen stage, one
  * output row per candidate. Block-key selectivity bounds the quadratic
  * term exactly as LSH banding does for near-dup text.
  */
object Linkage {

  /** Candidate pairs of `left` × `right` sharing every `blockCols` value.
    * Left columns come out as `a_<c>`, right as `b_<c>`.
    */
  def blockedPairs(left: DataFrame, right: DataFrame,
                   blockCols: Seq[String]): DataFrame = {
    def tag(df: DataFrame, p: String) = df.columns.foldLeft(df) {
      case (d, c) if blockCols.contains(c) => d
      case (d, c) => d.withColumnRenamed(c, s"$p$c")
    }
    tag(left, "a_").join(tag(right, "b_"), blockCols)
  }

  /** Fellegi–Sunter field score: `agreeWeight` when `agree` holds, else
    * `disagreeWeight` (both integer log-odds units).
    */
  def fieldScore(agree: Column, agreeWeight: Int, disagreeWeight: Int): Column =
    when(agree, lit(agreeWeight.toLong)).otherwise(lit(disagreeWeight.toLong))

  // --------------------------------------------------------------- q187
  /** Gated q187: link the customer table against a deterministically
    * DIRTIED copy of itself — every 10th customer reappears under a new
    * key with its name truncated by one character and (for half of them)
    * its balance off by one cent: the classic merge-two-CRMs fixture.
    * Blocking on (nation, segment, name-fragment) — the fragment is
    * `substring(name, 10, 7)`, the leading digits of the name's numeric
    * tail, a NAME-derived key (there is no shared join key between the
    * two sides), exactly the phonetic-key/prefix-key blocking real
    * Fellegi–Sunter deployments use. Its cardinality GROWS with the
    * table (~N/100 fragments), so candidate pairs stay ~O(N) instead of
    * the N²/|fixed-key-space| blowup a constant 125-key block space
    * gives (the r9 ADVICE finding): truncation removes the LAST name
    * character, so planted pairs always share the fragment, while the
    * fragment's final-digit neighbours keep BOTH Levenshtein branches
    * exercised in-block (same d8 → lev 1 agree; different d8 → lev 2
    * disagree). Comparators: Levenshtein(name) ≤ 1 (+40/−10) and
    * |Δbalance| ≤ 1 cent (+25/−5); match at score ≥ 50 — planted pairs
    * score 65 and random block-mates land ≤ 35, a margin the gate
    * verifies pair by pair.
    */
  def customerLinkage(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
        col("c_mktsegment"))
    val dirty = cust.filter(col("c_custkey") % 10 === 0)
      .select(
        (col("c_custkey") + 1000000L).as("c_custkey"),
        expr("substring(c_name, 1, length(c_name) - 1)").as("c_name"),
        col("c_nationkey"),
        (col("bal_cents") +
          when(col("c_custkey") % 20 === 0, 0L).otherwise(1L)).as("bal_cents"),
        col("c_mktsegment"))
    def withFrag(df: DataFrame): DataFrame =
      df.withColumn("name_frag", expr("substring(c_name, 10, 7)"))
    blockedPairs(
      withFrag(cust).withColumnRenamed("c_custkey", "key")
        .withColumnRenamed("c_name", "name"),
      withFrag(dirty).withColumnRenamed("c_custkey", "key")
        .withColumnRenamed("c_name", "name"),
      Seq("c_nationkey", "c_mktsegment", "name_frag"))
      .withColumn("lev_name", levenshtein(col("a_name"), col("b_name")))
      .withColumn("bal_diff", abs(col("a_bal_cents") - col("b_bal_cents")))
      .withColumn("s_name", fieldScore(col("lev_name") <= 1, 40, -10))
      .withColumn("s_bal", fieldScore(col("bal_diff") <= 1, 25, -5))
      .withColumn("score", col("s_name") + col("s_bal"))
      .withColumn("matched", col("score") >= 50)
      .select(col("a_key"), col("b_key"), col("lev_name").cast("long"),
        col("bal_diff"), col("s_name"), col("s_bal"), col("score"),
        col("matched"))
  }

  private val customerLinkageSql =
    """WITH cust AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents, c_mktsegment
      |  FROM customer
      |),
      |dirty AS (
      |  SELECT c_custkey + 1000000 AS c_custkey,
      |    substring(c_name, 1, length(c_name) - 1) AS c_name,
      |    c_nationkey,
      |    bal_cents + (CASE WHEN c_custkey % 20 = 0 THEN 0 ELSE 1 END)
      |      AS bal_cents,
      |    c_mktsegment
      |  FROM cust WHERE c_custkey % 10 = 0
      |),
      |pairs AS (
      |  SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
      |    CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev_name,
      |    abs(a.bal_cents - b.bal_cents) AS bal_diff
      |  FROM cust a JOIN dirty b
      |    ON a.c_nationkey = b.c_nationkey
      |    AND a.c_mktsegment = b.c_mktsegment
      |    AND substring(a.c_name, 10, 7) = substring(b.c_name, 10, 7)
      |),
      |scored AS (
      |  SELECT *,
      |    CASE WHEN lev_name <= 1 THEN 40 ELSE -10 END AS s_name,
      |    CASE WHEN bal_diff <= 1 THEN 25 ELSE -5 END AS s_bal
      |  FROM pairs
      |)
      |SELECT a_key, b_key, lev_name, CAST(bal_diff AS BIGINT) AS bal_diff,
      |  CAST(s_name AS BIGINT) AS s_name, CAST(s_bal AS BIGINT) AS s_bal,
      |  CAST(s_name + s_bal AS BIGINT) AS score,
      |  s_name + s_bal >= 50 AS matched
      |FROM scored""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q187_record_linkage", customerLinkage _,
      Some(customerLinkageSql)))
}
