package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Snapshot diff — the CDC-shaped question every warehouse asks after a
  * reload: between version A and version B of a table, what was ADDED,
  * REMOVED, and CHANGED (and in which columns)? One full-outer equi-join
  * on the key, column comparisons as codegen'd expressions; no sort, no
  * driver materialization — the diff of two 100 TB snapshots is one
  * key-shuffle.
  *
  * Null-safe semantics: column change detection uses `<=>` negation, so
  * NULL→value and value→NULL count as changes while NULL→NULL does not.
  */
object TableDiff {

  /** Per-row diff status of `b` vs `a` on `keyCols`: each row keyed
    * `added` / `removed` / `changed` / `same`, with the list of changed
    * columns (empty unless `changed`). Compared columns are the shared
    * non-key columns.
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val shared = a.columns.filter(b.columns.contains).filterNot(keyCols.contains)
    val aa = a.select(keyCols.map(col) ++
      shared.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__inA"): _*)
    val bb = b.select(keyCols.map(col) ++
      shared.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__inB"): _*)
    val changedCols: Column = concat_ws(",", shared.map(c =>
      when(!(col(s"__a_$c") <=> col(s"__b_$c")), lit(c))): _*)
    aa.join(bb, keyCols, "full_outer")
      .withColumn("status",
        when(col("__inA").isNull, lit("added"))
          .when(col("__inB").isNull, lit("removed"))
          .when(changedCols =!= "", lit("changed"))
          .otherwise(lit("same")))
      .withColumn("changed_cols", when(col("status") === "changed", changedCols)
        .otherwise(lit("")))
  }

  /** Roll a [[diff]] up to the summary a reload monitor alerts on:
    * per-status row counts plus per-column change counts.
    */
  def diffSummary(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val shared = a.columns.filter(b.columns.contains).filterNot(keyCols.contains)
    val d = diff(a, b, keyCols)
    val aggs =
      Seq("added", "removed", "changed", "same").map(s =>
        sum(when(col("status") === s, 1L).otherwise(0L)).as(s"n_$s")) ++
        shared.map(c => sum(when(
          array_contains(split(col("changed_cols"), ","), c), 1L).otherwise(0L))
          .as(s"chg_$c"))
    d.agg(aggs.head, aggs.tail: _*)
  }

  // ---------------------------------------------------------------- q86
  /** Gated face: diff two deterministic "snapshots" of orders — A drops
    * every 7th order, B drops every 5th and bumps every 3rd's price by
    * one cent — and summarize. Exercises added/removed/changed/same and
    * per-column attribution in one pass over exact integer counts.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"),
      col("o_orderpriority"))
    val a = o.filter(col("o_orderkey") % 7 =!= 0)
    val b = o.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("price_cents",
        when(col("o_orderkey") % 3 === 0, col("price_cents") + 1)
          .otherwise(col("price_cents")))
    diffSummary(a, b, Seq("o_orderkey"))
  }

  private val snapshotDiffSql =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |    o_orderpriority
      |  FROM orders
      |),
      |a AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0),
      |b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |        CASE WHEN o_orderkey % 3 = 0 THEN price_cents + 1
      |             ELSE price_cents END AS price_cents,
      |        o_orderpriority
      |      FROM o WHERE o_orderkey % 5 <> 0),
      |d AS (
      |  SELECT
      |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
      |         WHEN b.o_orderkey IS NULL THEN 'removed'
      |         WHEN NOT (a.o_custkey IS NOT DISTINCT FROM b.o_custkey)
      |           OR NOT (a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus)
      |           OR NOT (a.price_cents IS NOT DISTINCT FROM b.price_cents)
      |           OR NOT (a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority)
      |           THEN 'changed' ELSE 'same' END AS status,
      |    (NOT (a.o_custkey IS NOT DISTINCT FROM b.o_custkey)
      |      AND a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL) AS c_cust,
      |    (NOT (a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus)
      |      AND a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL) AS c_status,
      |    (NOT (a.price_cents IS NOT DISTINCT FROM b.price_cents)
      |      AND a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL) AS c_price,
      |    (NOT (a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority)
      |      AND a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL) AS c_prio
      |  FROM a FULL OUTER JOIN b USING (o_orderkey)
      |)
      |SELECT
      |  CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(sum(CASE WHEN status = 'same' THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
      |  CAST(sum(CASE WHEN c_cust THEN 1 ELSE 0 END) AS BIGINT) AS chg_o_custkey,
      |  CAST(sum(CASE WHEN c_status THEN 1 ELSE 0 END) AS BIGINT) AS chg_o_orderstatus,
      |  CAST(sum(CASE WHEN c_price THEN 1 ELSE 0 END) AS BIGINT) AS chg_price_cents,
      |  CAST(sum(CASE WHEN c_prio THEN 1 ELSE 0 END) AS BIGINT) AS chg_o_orderpriority
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- q87
  /** Referential-integrity audit across the star schema — orphan counts
    * per FK edge (child rows whose key has no parent) plus childless-
    * parent counts for the fact edges: the data-quality gate a warehouse
    * runs after every load. Each edge is one anti-join (broadcast when
    * the parent is a dim); counts are exact; one row per edge, ordered
    * by edge name for a deterministic gate.
    */
  def fkAudit(spark: SparkSession, dir: String): DataFrame = {
    // Fully lazy — each edge is two outer-join aggregates (parent keys
    // are PKs, so the child-side outer join cannot inflate), crossJoined
    // as one-row frames and unioned; no driver-side counting loop, the
    // whole audit is ONE plan the optimizer sees end to end.
    def edge(name: String, child: DataFrame, childKey: String,
             parent: DataFrame, parentKey: String): DataFrame = {
      val childSide = child.select(col(childKey).as("__ck"))
        .join(parent.select(col(parentKey).as("__pk")),
          col("__ck") === col("__pk"), "left_outer")
        .agg(count(lit(1)).as("n_child_rows"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
      val parentSide = parent.select(col(parentKey).as("__pk"))
        .join(child.select(col(childKey).as("__ck")).distinct(),
          col("__pk") === col("__ck"), "left_outer")
        .agg(sum(when(col("__ck").isNull, 1L).otherwise(0L))
          .as("n_childless_parents"))
      childSide.crossJoin(parentSide).select(lit(name).as("edge"),
        col("n_child_rows"), col("n_orphans"), col("n_childless_parents"))
    }
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    Seq(
      edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
      edge("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"),
      edge("orders->customer", o, "o_custkey", c, "c_custkey"),
      edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
      edge("supplier->nation", s, "s_nationkey", n, "n_nationkey"),
      edge("nation->region", n, "n_regionkey", r, "r_regionkey"))
      .reduce(_ unionByName _)
  }

  private val fkAuditSql =
    """SELECT * FROM (
      |  SELECT 'lineitem->orders' AS edge,
      |    (SELECT count(*) FROM lineitem) AS n_child_rows,
      |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS n_childless_parents
      |  UNION ALL
      |  SELECT 'lineitem->supplier',
      |    (SELECT count(*) FROM lineitem),
      |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
      |    (SELECT count(*) FROM supplier s WHERE NOT EXISTS
      |      (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey))
      |  UNION ALL
      |  SELECT 'orders->customer',
      |    (SELECT count(*) FROM orders),
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
      |  UNION ALL
      |  SELECT 'customer->nation',
      |    (SELECT count(*) FROM customer),
      |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
      |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
      |    (SELECT count(*) FROM nation n WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey))
      |  UNION ALL
      |  SELECT 'supplier->nation',
      |    (SELECT count(*) FROM supplier),
      |    (SELECT count(*) FROM supplier s WHERE NOT EXISTS
      |      (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)),
      |    (SELECT count(*) FROM nation n WHERE NOT EXISTS
      |      (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey))
      |  UNION ALL
      |  SELECT 'nation->region',
      |    (SELECT count(*) FROM nation),
      |    (SELECT count(*) FROM nation n WHERE NOT EXISTS
      |      (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)),
      |    (SELECT count(*) FROM region r WHERE NOT EXISTS
      |      (SELECT 1 FROM nation n WHERE n.n_regionkey = r.r_regionkey))
      |) t""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q86_snapshot_diff", snapshotDiff _, Some(snapshotDiffSql)),
    NamedQuery("q87_fk_audit", fkAudit _, Some(fkAuditSql)))
}
