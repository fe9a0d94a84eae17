package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.NamedQuery
import graft.core.Tables

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * dimensions so that sorting by the resulting code clusters rows that are
  * close in BOTH dimensions into the same files. A range/point predicate
  * on either dimension (or a rectangle on both) then intersects only the
  * few files whose footer min/max boxes touch it — multi-dimensional
  * data skipping from plain parquet statistics, no index structure.
  *
  * This is the layout story a 100 TB table needs when queries filter on
  * two independent columns: a linear sort clusters one dimension and
  * shreds the other (every file spans the full second-dimension range →
  * nothing skips), while the z-curve bounds each file to a tile of the
  * 2-D space. ZOrderSpec quantifies the difference from real footers.
  *
  * The code is a pure per-row expression (32 shift/mask/or terms, fully
  * codegen'd); the layout write is one range-partitioning exchange — the
  * same cost as any global sort, paid once at write time.
  */
object ZOrder {

  /** Bits kept per dimension (z codes are 2·Bits wide — 32 bits here, in
    * a long, so no sign issues).
    */
  val Bits = 16

  /** Morton code of two non-negative integral columns, each truncated to
    * the low [[Bits]] bits (callers bucket/shift wider or negative
    * domains first — bit interleaving needs a bounded non-negative
    * domain, exactly like any space-filling-curve index key).
    */
  def zValue(a: Column, b: Column): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until Bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered on (`aCol`, `bCol`): range-partition by the z
    * code (contiguous curve segments per partition → tight per-file
    * boxes), sort within partitions, drop the code column from the data.
    */
  def write(df: DataFrame, aCol: String, bCol: String, path: String,
            partitions: Int): Unit =
    df.withColumn("__z", zValue(col(aCol), col(bCol)))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  // ---------------------------------------------------------------- q57
  /** Customer z-codes over (nation, account-balance bucket) — the curve
    * key q57 gates cross-engine: both engines interleave the same 16+16
    * bits, so every code matches bit-for-bit. Balance is shifted +1000
    * (TPC-H balances start at -999.99) and floored into a non-negative
    * integer bucket first.
    */
  def customerZCodes(spark: SparkSession, dir: String): DataFrame = {
    val bal = floor(col("c_acctbal") + 1000).cast("long")
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        zValue(col("c_nationkey"), bal).as("z_code"))
  }

  private val customerZCodesSql =
    """SELECT c_custkey,
      |  CAST(list_sum(list_transform(range(16), i ->
      |    (((c_nationkey::BIGINT >> i) & 1) << (2*i)) +
      |    (((CAST(floor(c_acctbal + 1000) AS BIGINT) >> i) & 1) << (2*i + 1))
      |  )) AS BIGINT) AS z_code
      |FROM customer""".stripMargin

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery("q57_zorder_codes", customerZCodes _, Some(customerZCodesSql)))
}
