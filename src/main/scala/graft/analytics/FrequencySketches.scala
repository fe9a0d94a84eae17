package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables
import graft.functions.{CountMin, KmvSketch}

/** Gated faces for the bounded-memory frequency/distinct sketches that
  * complement Misra–Gries (q58) and HLL (q31): a count-min sketch point
  * estimator (q97) and KMV set-operation estimates (q98). Both oracles
  * rebuild the ENTIRE sketch in DuckDB from the same md5-based
  * definitions and hash-compare exactly — the sketches are deterministic
  * functions of the data, not "approximately checked".
  */
object FrequencySketches {

  /** CMS width for the gated face: 16k distinct shingles into 512
    * columns forces real collisions, so the one-sided `estimate ≥ exact`
    * behavior is actually exercised (over_count > 0 rows exist) while
    * both engines still agree bit-for-bit.
    */
  val CmsWidth = 512

  val KmvK = 128

  /** 40-bit md5 hash domain for KMV — headroom for exact integer
    * distinct estimates ((k−1)·2^40 ≈ 1.4e14 ≪ 2^63) and engine-equal
    * collisions if any occur (both sides hash identically, so even a
    * collision dedupes identically).
    */
  val KmvHashBits = 40

  // ---------------------------------------------------------------- q97
  /** Count-min point estimates for the corpus's top-25 3-gram shingles:
    * build ONE 4×512 sketch over all (shingle, count) rows via the
    * typed-Aggregator partial-aggregate path, then probe it relationally
    * (codegen'd md5 positions + element_at — no collect). Output pairs
    * each exact count with its CMS estimate; the `over_count ≥ 0`
    * invariant is structural, and the exact estimate values gate the
    * whole cell matrix against DuckDB's relational recomputation.
    */
  def cmsShingleCounts(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(graft.functions.shingleStrings(col("text"), 3)).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("c"))
    val cells = counts.agg(
      CountMin.sketch(counts, col("sh"), col("c"), CmsWidth).as("cells"))
    val probes = counts
      .orderBy(col("c").desc, col("sh")).limit(25)
    probes.crossJoin(broadcast(cells))
      .select(col("sh").as("shingle"), col("c").as("exact_count"),
        CountMin.estimateCol(col("cells"), col("sh"), CmsWidth).as("cms_estimate"))
      .withColumn("over_count", col("cms_estimate") - col("exact_count"))
  }

  /** DuckDB cell positions for hash row `i` of [[CountMin]]: hex slice
    * `i % 2` of md5(item || '|' || i/2), mod width.
    */
  private def cmsPosSql(item: String, i: Int): String = {
    val (from, md5i) = (if (i % 2 == 0) 1 else 16, i / 2)
    s"('0x' || substr(md5($item || '|$md5i'), $from, 15))::BIGINT % $CmsWidth"
  }

  private def cmsShingleCountsSql: String = {
    val posRows = (0 until CountMin.Depth).map { i =>
      s"SELECT sh, c, $i AS i, ${cmsPosSql("sh", i)} AS p FROM tc"
    }.mkString("\n  UNION ALL ")
    s"""WITH ws AS (
       |  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |sh AS (
       |  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM ws WHERE len(w) >= 3
       |),
       |tc AS (SELECT sh, count(*) AS c FROM sh GROUP BY 1),
       |pos AS (
       |  $posRows
       |),
       |cells AS (SELECT i, p, sum(c) AS cell FROM pos GROUP BY 1, 2),
       |probe AS (
       |  SELECT sh, c FROM (
       |    SELECT sh, c, row_number() OVER (ORDER BY c DESC, sh) AS rk FROM tc)
       |  WHERE rk <= 25
       |),
       |est AS (
       |  SELECT pr.sh, pr.c, min(cl.cell) AS est
       |  FROM probe pr
       |  JOIN pos po ON po.sh = pr.sh
       |  JOIN cells cl ON cl.i = po.i AND cl.p = po.p
       |  GROUP BY 1, 2
       |)
       |SELECT sh AS shingle, CAST(c AS BIGINT) AS exact_count,
       |  CAST(est AS BIGINT) AS cms_estimate,
       |  CAST(est - c AS BIGINT) AS over_count
       |FROM est""".stripMargin
  }

  // ---------------------------------------------------------------- q98
  /** Cross-source overlap via KMV sketches — the sketch-scale answer to
    * q83's exact shingle join: each source keeps only its k=128 smallest
    * 40-bit shingle hashes (a typed-Aggregator partial aggregate, O(k)
    * state per source at ANY corpus size), and every pairwise
    * union/intersection/Jaccard estimate is then computed from the
    * 20 sketch rows alone — array ops over ≤ k elements, corpus never
    * touched again. Per-source distinct counts (~1.3k) genuinely exceed
    * k, so trimming and estimation are exercised, not vacuous.
    */
  def kmvSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    // Parallelism floor (core.Spread): the shingle explode + md5 per
    // shingle is the query's per-row work and would otherwise run on the
    // single scan partition (the q83 measurement).
    val hv = graft.core.Spread.ifNarrow(
        Tables.documents(spark, dir).select("source", "text"), 8L << 10)
      .select(col("source"),
        explode(graft.analytics.TextAnalysis.shingleSet(col("text"), 3)).as("sh"))
      .select(col("source"),
        conv(substring(md5(col("sh").cast("binary")), 1, KmvHashBits / 4), 16, 10)
          .cast("long").as("v"))
      .distinct()
    val km = hv.groupBy("source")
      .agg(KmvSketch.sketch(hv, col("v"), KmvK).as("karr"))
    val a = km.select(col("source").as("source_a"), col("karr").as("ka"))
    val b = km.select(col("source").as("source_b"), col("karr").as("kb"))
    val maxEst = lit((KmvK - 1).toLong * (1L << KmvHashBits))
    a.join(b, col("source_a") < col("source_b"))
      .withColumn("uk", KmvSketch.unionK(col("ka"), col("kb"), KmvK))
      .select(
        col("source_a"), col("source_b"),
        size(col("uk")).cast("long").as("union_k"),
        element_at(col("uk"), size(col("uk"))).as("kth_min"),
        KmvSketch.bothCount(col("uk"), col("ka"), col("kb")).as("both_k"))
      .withColumn("jaccard_micro", expr("(both_k * 1000000) div union_k"))
      .withColumn("union_est",
        when(col("union_k") < KmvK, col("union_k"))
          .otherwise(expr(s"${(KmvK - 1).toLong * (1L << KmvHashBits)}"
            + " div kth_min")))
  }

  private def kmvSourceOverlapSql: String =
    s"""WITH ws AS (
       |  SELECT source,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |),
       |ss AS (
       |  SELECT DISTINCT source,
       |    unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM ws WHERE len(w) >= 3
       |),
       |hv AS (
       |  SELECT DISTINCT source,
       |    ('0x' || substr(md5(sh), 1, ${KmvHashBits / 4}))::BIGINT AS v
       |  FROM ss
       |),
       |kk AS (
       |  SELECT source, v FROM (
       |    SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rk
       |    FROM hv)
       |  WHERE rk <= $KmvK
       |),
       |prs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM (SELECT DISTINCT source FROM hv) a
       |  JOIN (SELECT DISTINCT source FROM hv) b ON a.source < b.source
       |),
       |uv AS (
       |  SELECT DISTINCT p.sa, p.sb, k.v
       |  FROM prs p JOIN kk k ON k.source = p.sa OR k.source = p.sb
       |),
       |uk AS (
       |  SELECT sa, sb, v FROM (
       |    SELECT sa, sb, v, row_number() OVER (PARTITION BY sa, sb ORDER BY v) AS rk
       |    FROM uv)
       |  WHERE rk <= $KmvK
       |),
       |fl AS (
       |  SELECT uk.sa, uk.sb, uk.v,
       |    ka.v IS NOT NULL AS in_a, kb.v IS NOT NULL AS in_b
       |  FROM uk
       |  LEFT JOIN kk ka ON ka.source = uk.sa AND ka.v = uk.v
       |  LEFT JOIN kk kb ON kb.source = uk.sb AND kb.v = uk.v
       |),
       |st AS (
       |  SELECT sa, sb, count(*) AS union_k, max(v) AS kth_min,
       |    sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS both_k
       |  FROM fl GROUP BY 1, 2
       |)
       |SELECT sa AS source_a, sb AS source_b,
       |  CAST(union_k AS BIGINT) AS union_k, kth_min,
       |  CAST(both_k AS BIGINT) AS both_k,
       |  CAST((both_k * 1000000) // union_k AS BIGINT) AS jaccard_micro,
       |  CASE WHEN union_k < $KmvK THEN union_k
       |       ELSE ${(KmvK - 1).toLong * (1L << KmvHashBits)} // kth_min
       |  END AS union_est
       |FROM st""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q97_cms_shingle_counts", cmsShingleCounts _, Some(cmsShingleCountsSql)),
    NamedQuery("q98_kmv_source_overlap", kmvSourceOverlap _, Some(kmvSourceOverlapSql)))
}
