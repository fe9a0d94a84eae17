package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.NamedQuery
import graft.core.Tables
import graft.functions.{FrequentItems, QuantileSketch}

/** One-pass column profiler — the first thing a warehouse user runs on
  * any new table: per column, null count/fraction, min/max, approximate
  * distinct count (HLL++), top-k frequent values (Misra–Gries), and for
  * numeric columns mean/stddev and approximate quantiles (GK sketch) —
  * computed in a SINGLE scan.
  *
  * The one-scan shape is the 100 TB design point: every statistic is a
  * partial-aggregable function (native HLL/min/max/avg plus this
  * engine's own mergeable MG and GK typed Aggregators), so the whole
  * profile is ONE global aggregate — map-side partials, a
  * rows-×-columns-independent final reduce, no per-column jobs, no
  * domain-sized hash tables (MG is O(k)/column, GK is O(1/ε)/column).
  * Profiling an 11-column 100 TB table costs exactly one read of it.
  *
  * The per-column pivot happens AFTER aggregation, on the single
  * result row (explode of an 11-element struct array) — driver-trivial,
  * never touching the corpus again.
  */
object Profile {

  /** Parallelism floor for the fused sketch aggregate — see
    * [[graft.core.Spread]]: the per-row MG/GK/HLL update cost, not the
    * bytes, is the job; a no-op on any real-scale scan.
    */
  /** `heavy` = the MG/GK/HLL sketch face (real per-row update cost:
    * small per-task budget → full spread); the exact/agg-only faces are
    * plain hash aggregates where over-partitioning costs more in task
    * launch + partial-merge than it buys (the r18 scaling block's
    * 8-core-beats-32 inversion on q72).
    */
  private def spreadIfNarrow(df: DataFrame, heavy: Boolean): DataFrame =
    graft.core.Spread.ifNarrow(df, if (heavy) 8L << 10 else 1L << 20)

  /** Profile every column of `df`: one row per column —
    * (col_name, dtype, n_rows, n_nulls, null_frac, approx_distinct,
    * min_num, max_num, min_str, max_str, mean, stddev, top_values,
    * approx_quantiles). String-ish columns carry min/max as strings
    * (min_num/max_num null); numeric columns the reverse, plus
    * mean/stddev/quantiles. `top_values` is the MG summary (approximate
    * counts, every item with frequency > n/(topCapacity+1) guaranteed
    * present).
    */
  def profile(df0: DataFrame, topCapacity: Int = 8,
              quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
              relativeError: Double = 0.01,
              distinctRsd: Double = 0.02,
              withSketches: Boolean = true): DataFrame = {
    val df = spreadIfNarrow(df0)
    val fields = df.schema.fields.toSeq
    def isNum(f: StructField): Boolean = f.dataType.isInstanceOf[NumericType]
    def num(f: StructField): Column = col(f.name).cast("double")

    // `withSketches = false` drops the MG top-k, GK quantile, and
    // mean/stddev aggregates from the plan (their struct fields become
    // typed nulls). Callers that only read the exact surface — q72's
    // gated face selects none of those columns — would otherwise still
    // PAY for them: Catalyst cannot prune struct fields through the
    // explode(array(structs)) pivot, so the discarded sketches were
    // measured as the bulk of the profile stage (plan held 11 MisraGries
    // + 8 QuantileSketch + 16 avg/stddev aggregates whose outputs no
    // consumer read — guide §1.2: don't compute what you throw away).
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +: fields.flatMap { f =>
        val c = col(f.name)
        Seq(
          count(c).as(s"__nn_${f.name}"),
          approx_count_distinct(c, distinctRsd).as(s"__ad_${f.name}"),
          min(c).cast("string").as(s"__min_${f.name}"),
          max(c).cast("string").as(s"__max_${f.name}")) ++
          (if (withSketches) Seq(
            FrequentItems.misraGries(df, c.cast("string"), topCapacity)
              .as(s"__top_${f.name}"))
          else Nil) ++
          (if (isNum(f)) Seq(
            min(num(f)).as(s"__minn_${f.name}"),
            max(num(f)).as(s"__maxn_${f.name}")) ++
            (if (withSketches) Seq(
              avg(num(f)).as(s"__mean_${f.name}"),
              stddev_samp(num(f)).as(s"__std_${f.name}"),
              QuantileSketch.sketchAgg(df, num(f), relativeError).as(s"__qs_${f.name}"))
            else Nil)
          else Nil)
      }

    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val nullTop = lit(null).cast(MapType(StringType, LongType))
    val perCol = fields.map { f =>
      val n = col("__n")
      val nn = col(s"__nn_${f.name}")
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        n.as("n_rows"),
        (n - nn).as("n_nulls"),
        when(n > 0, (n - nn).cast("double") / n).otherwise(0.0).as("null_frac"),
        col(s"__ad_${f.name}").as("approx_distinct"),
        (if (isNum(f)) col(s"__minn_${f.name}") else nullD).as("min_num"),
        (if (isNum(f)) col(s"__maxn_${f.name}") else nullD).as("max_num"),
        (if (isNum(f)) nullS else col(s"__min_${f.name}")).as("min_str"),
        (if (isNum(f)) nullS else col(s"__max_${f.name}")).as("max_str"),
        (if (isNum(f) && withSketches) col(s"__mean_${f.name}") else nullD).as("mean"),
        (if (isNum(f) && withSketches) col(s"__std_${f.name}") else nullD).as("stddev"),
        (if (withSketches) col(s"__top_${f.name}") else nullTop).as("top_values"),
        (if (isNum(f) && withSketches)
          QuantileSketch.queryValues(col(s"__qs_${f.name}"), quantiles)
        else lit(null).cast(ArrayType(DoubleType, containsNull = false)))
          .as("approx_quantiles"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(perCol: _*)).as("p"))
      .select(col("p.*"))
  }

  // ---------------------------------------------------------------- q72
  private val LineitemNumCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val LineitemStrCols = Seq("l_returnflag", "l_linestatus", "l_shipdate")

  /** Profiler gate: profile lineitem (the operator under test — ONE
    * scan), then audit the approximate column against exact distinct
    * counts computed separately (gate-only work, the q70 pattern). The
    * hash-compared output is the exact surface — row/null counts,
    * numeric min/max as doubles, string/timestamp min/max as strings,
    * exact distincts — plus a boolean `add_ok` asserting HLL++ (rsd
    * 0.02) landed within 5% of truth for every column. Mean/stddev/
    * quantiles/top-k stay out of the hash (float-sum order-dependence /
    * sketch freedom) and are spec-gated instead (ProfileSpec).
    */
  def profileLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // Exact surface only: the gate's output reads none of the MG/GK/
    // mean/stddev columns, and the explode pivot blocks Catalyst from
    // pruning them out of the aggregate (measured: the discarded
    // sketches dominated the profile stage). The full-sketch profile
    // stays the default operator and is spec-gated by ProfileSpec.
    val prof = profile(li, withSketches = false)
    // The exact-distinct audit pass expands ×11 before aggregating — the
    // same single-small-file shape would serialize 6.6M expanded rows
    // onto one task, so it gets the same spread.
    val exactAggs = (LineitemNumCols ++ LineitemStrCols).map(c =>
      count_distinct(col(c)).as(c))
    val exact = spreadIfNarrow(li).agg(exactAggs.head, exactAggs.tail: _*)
    val exactPerCol = (LineitemNumCols ++ LineitemStrCols).map(c =>
      struct(lit(c).as("col_name"), col(c).as("n_distinct")))
    val exactRows = exact.select(explode(array(exactPerCol: _*)).as("e")).select(col("e.*"))
    prof.join(broadcast(exactRows), "col_name")
      .select(
        col("col_name"), col("n_rows"), col("n_nulls"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"),
        col("n_distinct"),
        (abs(col("approx_distinct") - col("n_distinct")) <=
          col("n_distinct").cast("double") * 0.05).as("add_ok"))
  }

  private val profileLineitemSql: String = {
    def sel(c: String, numeric: Boolean): String = {
      val minNum = if (numeric) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val maxNum = if (numeric) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val minStr = if (numeric) "CAST(NULL AS VARCHAR)" else s"CAST(min($c) AS VARCHAR)"
      val maxStr = if (numeric) "CAST(NULL AS VARCHAR)" else s"CAST(max($c) AS VARCHAR)"
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  $minNum AS min_num, $maxNum AS max_num,
         |  $minStr AS min_str, $maxStr AS max_str,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct, TRUE AS add_ok
         |FROM lineitem""".stripMargin
    }
    (LineitemNumCols.map(sel(_, numeric = true)) ++
      LineitemStrCols.map(sel(_, numeric = false))).mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------- q92
  /** Benford leading-digit audit — the classic fabricated-data /
    * broken-ETL smell test: compare each monetary column's first-
    * significant-digit distribution against Benford's log10(1 + 1/d)
    * law and report the per-digit deviation. One scan + one 9-bucket
    * hash aggregate per column (unioned) — at 100 TB it's two map-side
    * passes and a 18-row result.
    *
    * Exactness: values land in integer cents via `floor(x · 100)` (one
    * identical double op per row on both engines), the leading digit
    * comes from the BIGINT's string form (no log10 on data), observed
    * shares are truncating integer divisions, and the Benford
    * expectation is precomputed ONCE here in µ-units and inlined into
    * both plans as literals — no engine computes a transcendental.
    */
  private val benfordMicro: Map[Int, Long] = (1 to 9).map { d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong
  }.toMap

  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val expected = benfordMicro.foldLeft(lit(0L)) { case (acc, (d, m)) =>
      when(col("digit") === d, lit(m)).otherwise(acc)
    }
    def digits(df: DataFrame, colName: String, tag: String): DataFrame =
      df.select(floor(col(colName) * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        .select(lit(tag).as("col_name"), col("digit"), col("n_obs"))
    val counted =
      digits(Tables.orders(spark, dir), "o_totalprice", "o_totalprice")
        .unionAll(
          digits(Tables.lineitem(spark, dir), "l_extendedprice", "l_extendedprice"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("col_name")
    counted
      .withColumn("n_total", sum("n_obs").over(w))
      .withColumn("p_obs_micro", expr("(1000000 * n_obs) div n_total"))
      .withColumn("p_benford_micro", expected)
      .withColumn("dev_micro", col("p_obs_micro") - col("p_benford_micro"))
      .select("col_name", "digit", "n_obs", "n_total", "p_obs_micro",
        "p_benford_micro", "dev_micro")
  }

  private def benfordAuditSql: String = {
    val expectedCase = (1 to 9)
      .map(d => s"WHEN $d THEN ${benfordMicro(d)}").mkString(" ")
    def cte(table: String, c: String) =
      s"""SELECT '$c' AS col_name,
         |    CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         |    count(*) AS n_obs
         |  FROM (SELECT CAST(floor($c * 100) AS BIGINT) AS cents FROM $table)
         |  WHERE cents > 0 GROUP BY 1, 2""".stripMargin
    s"""WITH counted AS (
       |  ${cte("orders", "o_totalprice")}
       |  UNION ALL
       |  ${cte("lineitem", "l_extendedprice")}
       |)
       |SELECT col_name, digit, CAST(n_obs AS BIGINT) AS n_obs,
       |  CAST(sum(n_obs) OVER (PARTITION BY col_name) AS BIGINT) AS n_total,
       |  CAST((1000000 * n_obs) // sum(n_obs) OVER (PARTITION BY col_name)
       |    AS BIGINT) AS p_obs_micro,
       |  CAST(CASE digit $expectedCase END AS BIGINT) AS p_benford_micro,
       |  CAST((1000000 * n_obs) // sum(n_obs) OVER (PARTITION BY col_name)
       |    - (CASE digit $expectedCase END) AS BIGINT) AS dev_micro
       |FROM counted""".stripMargin
  }

  // --------------------------------------------------------------- q101
  /** Join-key skew profile — the diagnostic read before choosing a join
    * strategy at 100 TB: per candidate key, how concentrated is the row
    * distribution? Output is one row per (key, ⌊log₂ count⌋) bucket —
    * the counts-of-counts histogram — with the global stats (distinct
    * keys, rows, top-1 and top-10 share in integer micro-units) carried
    * on every row. A top-1 share in the percents says "salt this key"
    * (warehouse.Skew); an even histogram says a plain shuffle is fine.
    *
    * Scale shape: one hash aggregation to per-key counts, then a
    * keys-sized log₂-bucket aggregation; the top-10 is a partial top-k
    * (`orderBy.limit`), never a global sort. No step holds more than
    * the distinct-key space, and nothing is driver-materialized.
    *
    * Exactness: ⌊log₂ c⌋ is `length(bin(c)) − 1` — pure integer/string
    * ops on BIGINT, identical in both engines — and the shares are
    * integer micro-unit divisions.
    */
  def keySkew(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("c"))
    val buckets = counts
      .groupBy((length(bin(col("c"))) - 1).as("log2_bucket"))
      .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"))
    val top = counts.orderBy(col("c").desc, col("k")).limit(10)
      .agg(max("c").as("top1"), sum("c").as("top10"))
    val global = counts.agg(count(lit(1)).as("n_keys_total"),
      sum("c").as("n_rows_total"))
    buckets.crossJoin(broadcast(global)).crossJoin(broadcast(top))
      .select(lit(label).as("key_col"),
        col("log2_bucket").cast("long").as("log2_bucket"),
        col("n_keys"), col("n_rows"), col("n_keys_total"), col("n_rows_total"),
        expr("(1000000 * top1) div n_rows_total").as("top1_share_micro"),
        expr("(1000000 * top10) div n_rows_total").as("top10_share_micro"))
  }

  /** Gated q101: skew profiles of the two natural big-join keys —
    * events.user_id and lineitem.l_orderkey.
    */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame =
    keySkew(Tables.events(spark, dir), "user_id", "events.user_id")
      .unionByName(
        keySkew(Tables.lineitem(spark, dir), "l_orderkey", "lineitem.l_orderkey"))

  private def keySkewSqlFor(table: String, key: String): String =
    s"""SELECT '$table.$key' AS key_col,
       |  CAST(length(bin(c)) - 1 AS BIGINT) AS log2_bucket,
       |  count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
       |  (SELECT count(*) FROM ${table}_c) AS n_keys_total,
       |  (SELECT CAST(sum(c) AS BIGINT) FROM ${table}_c) AS n_rows_total,
       |  CAST((1000000 * (SELECT max(c) FROM (SELECT c FROM ${table}_c ORDER BY c DESC, k LIMIT 10)))
       |    // (SELECT sum(c) FROM ${table}_c) AS BIGINT) AS top1_share_micro,
       |  CAST((1000000 * (SELECT sum(c) FROM (SELECT c FROM ${table}_c ORDER BY c DESC, k LIMIT 10)))
       |    // (SELECT sum(c) FROM ${table}_c) AS BIGINT) AS top10_share_micro
       |FROM ${table}_c GROUP BY 1, 2""".stripMargin

  private val keySkewProfileSql =
    s"""WITH events_c AS (
       |  SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1
       |),
       |lineitem_c AS (
       |  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1
       |)
       |${keySkewSqlFor("events", "user_id")}
       |UNION ALL
       |${keySkewSqlFor("lineitem", "l_orderkey")}""".stripMargin

  // ---------------------------------------------------------------- q110
  /** One data-quality expectation: `violation` is a row-level predicate
    * counted when true (null ⇒ not a violation, matching SQL WHERE);
    * `uniqueCols` switches the check to `count(*) − count(distinct …)`
    * (rows with a null key column are excluded from the distinct count —
    * pair a not_null check with every unique check, as the face does).
    */
  final case class Expect(id: String, kind: String, target: String,
                          violation: Column = lit(false),
                          uniqueCols: Seq[String] = Nil)

  /** dbt-test-style constraint audit — the declarative "is this table
    * sane?" gate run after every load: unique keys, not-null columns,
    * accepted values, numeric ranges, cross-column consistency. All
    * checks against one table fold into a SINGLE aggregate projection
    * (one scan per table regardless of check count — the q72 profiler
    * discipline); the per-check rows are exploded from that one row.
    */
  def expectationsAudit(df: DataFrame, table: String,
                        checks: Seq[Expect]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case (e, i) =>
      (if (e.uniqueCols.nonEmpty)
        (count(lit(1)) - count_distinct(col(e.uniqueCols.head),
          e.uniqueCols.tail.map(col): _*))
      else sum(when(e.violation, 1L).otherwise(0L))).as(s"v_$i")
    }
    df.agg(count(lit(1)).as("checked"), aggs: _*)
      .select(explode(array(checks.zipWithIndex.map { case (e, i) =>
        struct(lit(e.id).as("check_id"), lit(e.kind).as("check_type"),
          lit(table).as("target_table"), lit(e.target).as("target"),
          col("checked"), col(s"v_$i").as("violations"))
      }: _*)).as("r"))
      .select(col("r.*"))
      .withColumn("pass", col("violations") === 0)
  }

  /** Gated face: the star-schema expectation suite — every check is one
    * row, so new violations show up as a changed row, not a failed job.
    */
  def starSchemaExpectations(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    expectationsAudit(Tables.customer(spark, dir), "customer", Seq(
      Expect("customer_key_unique", "unique", "c_custkey",
        uniqueCols = Seq("c_custkey")),
      Expect("customer_key_not_null", "not_null", "c_custkey",
        col("c_custkey").isNull),
      Expect("customer_segment_accepted", "accepted_values", "c_mktsegment",
        !col("c_mktsegment").isin(segs: _*))))
    .unionByName(expectationsAudit(Tables.orders(spark, dir), "orders", Seq(
      Expect("orders_key_unique", "unique", "o_orderkey",
        uniqueCols = Seq("o_orderkey")),
      Expect("orders_custkey_not_null", "not_null", "o_custkey",
        col("o_custkey").isNull),
      Expect("orders_status_accepted", "accepted_values", "o_orderstatus",
        !col("o_orderstatus").isin("O", "F", "P")),
      Expect("orders_priority_accepted", "accepted_values", "o_orderpriority",
        !col("o_orderpriority").isin(prios: _*)),
      Expect("orders_price_positive", "range", "o_totalprice",
        !(col("o_totalprice") > 0)))))
    .unionByName(expectationsAudit(Tables.lineitem(spark, dir), "lineitem", Seq(
      Expect("lineitem_key_unique", "unique", "l_orderkey,l_linenumber",
        uniqueCols = Seq("l_orderkey", "l_linenumber")),
      Expect("lineitem_qty_range", "range", "l_quantity",
        !(col("l_quantity") >= 1 && col("l_quantity") <= 50)),
      Expect("lineitem_discount_range", "range", "l_discount",
        !(col("l_discount") >= 0 && col("l_discount") <= 0.1)),
      Expect("lineitem_returnflag_accepted", "accepted_values", "l_returnflag",
        !col("l_returnflag").isin("A", "N", "R")),
      Expect("lineitem_linestatus_accepted", "accepted_values", "l_linestatus",
        !col("l_linestatus").isin("O", "F")))))
    .unionByName(expectationsAudit(Tables.part(spark, dir), "part", Seq(
      Expect("part_key_unique", "unique", "p_partkey",
        uniqueCols = Seq("p_partkey")),
      Expect("part_price_positive", "range", "p_retailprice",
        !(col("p_retailprice") > 0)))))
    .unionByName(expectationsAudit(Tables.supplier(spark, dir), "supplier", Seq(
      Expect("supplier_key_unique", "unique", "s_suppkey",
        uniqueCols = Seq("s_suppkey")),
      Expect("supplier_nation_not_null", "not_null", "s_nationkey",
        col("s_nationkey").isNull))))
    .unionByName(expectationsAudit(Tables.documents(spark, dir), "documents", Seq(
      Expect("documents_key_unique", "unique", "doc_id",
        uniqueCols = Seq("doc_id")),
      Expect("documents_text_not_null", "not_null", "text",
        col("text").isNull),
      Expect("documents_nchars_consistent", "consistency", "n_chars",
        col("n_chars") =!= length(col("text"))))))
  }

  private def expectSqlRow(id: String, kind: String, table: String,
                           target: String, violSql: String): String =
    s"""SELECT '$id' AS check_id, '$kind' AS check_type,
       |  '$table' AS target_table, '$target' AS target,
       |  (SELECT count(*) FROM $table) AS checked,
       |  CAST(($violSql) AS BIGINT) AS violations,
       |  ($violSql) = 0 AS pass""".stripMargin

  private val starSchemaExpectationsSql = Seq(
    expectSqlRow("customer_key_unique", "unique", "customer", "c_custkey",
      "(SELECT count(*) FROM customer) - (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IS NOT NULL))"),
    expectSqlRow("customer_key_not_null", "not_null", "customer", "c_custkey",
      "SELECT count(*) FROM customer WHERE c_custkey IS NULL"),
    expectSqlRow("customer_segment_accepted", "accepted_values", "customer", "c_mktsegment",
      "SELECT count(*) FROM customer WHERE NOT c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')"),
    expectSqlRow("orders_key_unique", "unique", "orders", "o_orderkey",
      "(SELECT count(*) FROM orders) - (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))"),
    expectSqlRow("orders_custkey_not_null", "not_null", "orders", "o_custkey",
      "SELECT count(*) FROM orders WHERE o_custkey IS NULL"),
    expectSqlRow("orders_status_accepted", "accepted_values", "orders", "o_orderstatus",
      "SELECT count(*) FROM orders WHERE NOT o_orderstatus IN ('O','F','P')"),
    expectSqlRow("orders_priority_accepted", "accepted_values", "orders", "o_orderpriority",
      "SELECT count(*) FROM orders WHERE NOT o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')"),
    expectSqlRow("orders_price_positive", "range", "orders", "o_totalprice",
      "SELECT count(*) FROM orders WHERE NOT (o_totalprice > 0)"),
    expectSqlRow("lineitem_key_unique", "unique", "lineitem", "l_orderkey,l_linenumber",
      "(SELECT count(*) FROM lineitem) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL))"),
    expectSqlRow("lineitem_qty_range", "range", "lineitem", "l_quantity",
      "SELECT count(*) FROM lineitem WHERE NOT (l_quantity >= 1 AND l_quantity <= 50)"),
    expectSqlRow("lineitem_discount_range", "range", "lineitem", "l_discount",
      "SELECT count(*) FROM lineitem WHERE NOT (l_discount >= 0 AND l_discount <= 0.1)"),
    expectSqlRow("lineitem_returnflag_accepted", "accepted_values", "lineitem", "l_returnflag",
      "SELECT count(*) FROM lineitem WHERE NOT l_returnflag IN ('A','N','R')"),
    expectSqlRow("lineitem_linestatus_accepted", "accepted_values", "lineitem", "l_linestatus",
      "SELECT count(*) FROM lineitem WHERE NOT l_linestatus IN ('O','F')"),
    expectSqlRow("part_key_unique", "unique", "part", "p_partkey",
      "(SELECT count(*) FROM part) - (SELECT count(*) FROM (SELECT DISTINCT p_partkey FROM part WHERE p_partkey IS NOT NULL))"),
    expectSqlRow("part_price_positive", "range", "part", "p_retailprice",
      "SELECT count(*) FROM part WHERE NOT (p_retailprice > 0)"),
    expectSqlRow("supplier_key_unique", "unique", "supplier", "s_suppkey",
      "(SELECT count(*) FROM supplier) - (SELECT count(*) FROM (SELECT DISTINCT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL))"),
    expectSqlRow("supplier_nation_not_null", "not_null", "supplier", "s_nationkey",
      "SELECT count(*) FROM supplier WHERE s_nationkey IS NULL"),
    expectSqlRow("documents_key_unique", "unique", "documents", "doc_id",
      "(SELECT count(*) FROM documents) - (SELECT count(*) FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL))"),
    expectSqlRow("documents_text_not_null", "not_null", "documents", "text",
      "SELECT count(*) FROM documents WHERE text IS NULL"),
    expectSqlRow("documents_nchars_consistent", "consistency", "documents", "n_chars",
      "SELECT count(*) FROM documents WHERE n_chars <> length(text)"))
    .mkString("", "\nUNION ALL\n", "")

  // --------------------------------------------------------------- q122
  /** Join-cardinality forecast — predict a join's output size and skew
    * WITHOUT executing it, from the per-key degree tables alone: for
    * each key, the join emits n_left × n_right rows, so the exact output
    * size is Σₖ nₗ(k)·nᵣ(k). At 100 TB this is the difference between
    * "the self-join is 10⁹ rows" and "the self-join is 10¹⁵ rows —
    * re-plan"; every pair-generation operator in this engine (LSH band
    * joins, blocking joins) is sized by exactly this sum.
    *
    * Output is a digit-magnitude histogram (keys bucketed by the decimal
    * digit count of their pair contribution — `length(CAST(n AS
    * STRING))`, pure integer/string ops, engine-identical) per forecast,
    * so one glance shows whether the total is spread over many small
    * keys or concentrated in a few mega-keys that need salting
    * (warehouse.Skew). Keys present on one side only land in the
    * pair_digits = 0 row: they forecast anti-join/miss volume.
    *
    * Scale shape: two hash aggregations to degree tables (keys-sized),
    * one keys-sized outer join between them, one digits-sized rollup.
    * The forecast never materializes a single joined row — that is the
    * entire point.
    */
  def joinCardinalityForecast(left: DataFrame, leftKey: String,
                              right: DataFrame, rightKey: String,
                              label: String): DataFrame = {
    val dl = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("nl"))
    val dr = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("nr"))
    dl.join(dr, Seq("k"), "full_outer")
      .select(coalesce(col("nl"), lit(0L)).as("nl"),
        coalesce(col("nr"), lit(0L)).as("nr"))
      .withColumn("pairs", col("nl") * col("nr"))
      .groupBy(when(col("pairs") === 0, lit(0))
        .otherwise(length(col("pairs").cast("string"))).cast("int").as("pair_digits"))
      .agg(count(lit(1)).as("n_keys"), sum("pairs").as("pairs_total"),
        sum("nl").as("lhs_rows"), sum("nr").as("rhs_rows"))
      .select(lit(label).as("join_name"), col("pair_digits"), col("n_keys"),
        col("pairs_total"), col("lhs_rows"), col("rhs_rows"))
  }

  /** Gated face: the FK join orders⋈lineitem (bounded fan-out — every
    * bucket small) next to the lineitem self-join on l_suppkey (the
    * classic quadratic-blowup shape LSH-style pair generation hits).
    */
  def joinForecasts(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    joinCardinalityForecast(orders, "o_orderkey", lineitem, "l_orderkey",
        "orders_lineitem")
      .unionByName(joinCardinalityForecast(lineitem, "l_suppkey",
        lineitem, "l_suppkey", "lineitem_self_supp"))
  }

  private val joinForecastsSql =
    """WITH dl1 AS (SELECT o_orderkey AS k, count(*) AS nl FROM orders GROUP BY 1),
      |dr1 AS (SELECT l_orderkey AS k, count(*) AS nr FROM lineitem GROUP BY 1),
      |j1 AS (
      |  SELECT coalesce(nl, 0) AS nl, coalesce(nr, 0) AS nr,
      |    coalesce(nl, 0) * coalesce(nr, 0) AS pairs
      |  FROM dl1 FULL JOIN dr1 ON dl1.k = dr1.k),
      |d2 AS (SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
      |j2 AS (SELECT n AS nl, n AS nr, n * n AS pairs FROM d2),
      |u AS (
      |  SELECT 'orders_lineitem' AS join_name, nl, nr, pairs FROM j1
      |  UNION ALL
      |  SELECT 'lineitem_self_supp' AS join_name, nl, nr, pairs FROM j2)
      |SELECT join_name,
      |  CAST(CASE WHEN pairs = 0 THEN 0
      |            ELSE length(CAST(pairs AS VARCHAR)) END AS INTEGER) AS pair_digits,
      |  count(*) AS n_keys,
      |  CAST(sum(pairs) AS BIGINT) AS pairs_total,
      |  CAST(sum(nl) AS BIGINT) AS lhs_rows,
      |  CAST(sum(nr) AS BIGINT) AS rhs_rows
      |FROM u GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q123
  /** Storage-layout advisor — the decision input for choosing a table's
    * sort/cluster key (the question warehouse.ZOrder answers the 2-D
    * version of): per candidate column, how run-length-compressible is
    * it under the CURRENT clustering (orderkey, linenumber), and how
    * much would dedicating the sort order to it help? `runs_clustered`
    * counts the value-change segments the encoder actually sees;
    * `runs_if_sorted` is its floor (= distinct values); the ppm gain is
    * the segment reduction a re-sort would buy. A column already riding
    * the clustering (few long runs) needs nothing; a high-cardinality
    * shuffled column (runs ≈ rows) is a z-order/sort candidate.
    *
    * Runs are counted WITHIN each orderkey partition (each order opens a
    * fresh run: Σ_orders (1 + changes)) — so the window is partitioned
    * by l_orderkey and NO global sort exists in the plan; this matches
    * how row groups see locally-clustered data and is the 100 TB-legal
    * formulation (a global row_number would single-partition the scan).
    * All six columns' change flags ride ONE window pass, and the rollup
    * is a single aggregate — one scan, one key-shuffle total. The exact
    * multi-column count-distinct is Spark's expand strategy (×7 rows in
    * the aggregate, still one scan); at 100 TB swap the exact distincts
    * for approx_count_distinct and the plan shape is unchanged.
    */
  def layoutAdvisor(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = Seq("l_returnflag", "l_linestatus", "l_shipday", "l_partkey",
      "l_suppkey", "l_quantity")
    // (orderkey, linenumber) is NOT unique in the harness data, so the
    // within-order sort tiebreaks on every compared column: rows still
    // tied are then identical in all compared columns, making the run
    // count invariant to their relative order in both engines.
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber") +: cols.map(col): _*)
    val base = Tables.lineitem(spark, dir)
      .withColumn("l_shipday", to_date(col("l_shipdate")))
    val flagged = cols.foldLeft(base) { (df, c) =>
      val prev = lag(col(c), 1).over(w)
      df.withColumn(s"__chg_$c",
        when(prev.isNull, lit(0L)).otherwise(when(col(c) =!= prev, lit(1L)).otherwise(lit(0L))))
    }
    val aggCols = count(lit(1)).as("n_rows") +:
      countDistinct(col("l_orderkey")).as("n_orders") +:
      cols.flatMap(c => Seq(
        sum(col(s"__chg_$c")).as(s"__sum_$c"),
        countDistinct(col(c)).as(s"__nd_$c")))
    val agg = flagged.agg(aggCols.head, aggCols.tail: _*)
    // Pivot to long form INSIDE the one plan (explode of a 6-struct
    // array over the single aggregate row) — a per-column union of
    // selects would re-execute the corpus aggregate once per column.
    agg.select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"), col("n_rows"),
        col(s"__nd_$c").as("n_distinct"),
        (col("n_orders") + col(s"__sum_$c")).as("runs_clustered"))): _*)).as("r"))
      .select("r.*")
      .withColumn("avg_run_len_x1000",
        expr("CAST(n_rows * 1000 DIV runs_clustered AS BIGINT)"))
      .withColumn("resort_gain_ppm",
        expr("CAST((runs_clustered - n_distinct) * 1000000 DIV runs_clustered AS BIGINT)"))
  }

  private val layoutAdvisorSql = {
    val cols = Seq("l_returnflag" -> "l_returnflag",
      "l_linestatus" -> "l_linestatus", "l_shipday" -> "CAST(l_shipdate AS DATE)",
      "l_partkey" -> "l_partkey", "l_suppkey" -> "l_suppkey",
      "l_quantity" -> "l_quantity")
    val flags = cols.map { case (n, e) =>
      s"""    CASE WHEN lag($e) OVER w IS NULL THEN 0
         |         WHEN $e <> lag($e) OVER w THEN 1 ELSE 0 END AS chg_$n""".stripMargin
    }.mkString(",\n")
    val aggs = cols.map { case (n, e) =>
      s"    CAST(sum(chg_$n) AS BIGINT) AS sum_$n, count(DISTINCT $e) AS nd_$n"
    }.mkString(",\n")
    val rows = cols.map { case (n, _) =>
      s"""SELECT '$n' AS column_name, n_rows, nd_$n AS n_distinct,
         |  n_orders + sum_$n AS runs_clustered FROM agg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH f AS (
       |  SELECT *,
       |$flags
       |  FROM lineitem
       |  WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber,
       |    l_returnflag, l_linestatus, CAST(l_shipdate AS DATE), l_partkey,
       |    l_suppkey, l_quantity)
       |), agg AS (
       |  SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
       |$aggs
       |  FROM f
       |), long AS ($rows)
       |SELECT column_name, n_rows, n_distinct, runs_clustered,
       |  CAST(n_rows * 1000 // runs_clustered AS BIGINT) AS avg_run_len_x1000,
       |  CAST((runs_clustered - n_distinct) * 1000000 // runs_clustered AS BIGINT)
       |    AS resort_gain_ppm
       |FROM long""".stripMargin
  }

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q72_profile_lineitem", profileLineitem _, Some(profileLineitemSql)),
    NamedQuery("q122_join_cardinality", joinForecasts _, Some(joinForecastsSql)),
    NamedQuery("q123_layout_advisor", layoutAdvisor _, Some(layoutAdvisorSql)),
    NamedQuery("q92_benford_audit", benfordAudit _, Some(benfordAuditSql)),
    NamedQuery("q101_key_skew", keySkewProfile _, Some(keySkewProfileSql)),
    NamedQuery("q110_expectations_audit", starSchemaExpectations _,
      Some(starSchemaExpectationsSql)))
}
