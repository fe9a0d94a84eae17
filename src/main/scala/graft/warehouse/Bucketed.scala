package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-bucketed tables for shuffle-free co-located joins.
  *
  * [[MergeWriter]]'s directory buckets give merge pruning; *catalog*
  * bucketing (`bucketBy` + `saveAsTable`) additionally records the hash
  * distribution in the catalog so Catalyst plans joins and aggregations on
  * the bucket key WITHOUT an Exchange on either side — the difference
  * between shuffling 100 TB and shuffling nothing when two fact tables
  * share a key. Both sides must use the same key and bucket count.
  */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int,
                    path: Option[String] = None): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path.getOrElse(defaultPath(df.sparkSession, table)))
      .saveAsTable(table)

  private def defaultPath(spark: SparkSession, table: String): String =
    s"${spark.conf.get("spark.sql.warehouse.dir")}/$table"

  /** Join two same-bucketed tables on their bucket key — planned without a
    * shuffle (verify with `.explain`: no Exchange above either scan).
    */
  def cogroupJoin(spark: SparkSession, leftTable: String, rightTable: String,
                  key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
