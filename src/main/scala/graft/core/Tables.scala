package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every reader is a plain parquet scan: Catalyst handles column pruning and
  * predicate pushdown into the scan (row-group min/max skipping), so callers
  * simply `.select`/`.filter` and the physical plan stays minimal. At cluster
  * scale these would be partitioned/bucketed catalog tables; the API shape
  * (dir + name) is the only thing that changes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is nanosecond-precision parquet. Spark ≤4.0 refuses to
    * read it as TimestampType, so we read raw int64 nanos (legacy conf) and
    * truncate to microseconds; Spark ≥4.1 instead reads ns natively as a
    * micros-truncated TIMESTAMP_NTZ (the legacy conf no longer yields a
    * long). Handle BOTH by dispatching on the delivered type — consumers
    * always see a normal session-UTC TimestampType column either way, and
    * oracle engines that keep ns agree once values are floored to seconds
    * or formatted, which every query does at its edge.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => // session tz is UTC, so ntz -> ltz is value-identical
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Every warehouse table by name, through its normalizing reader (so
    * `events` gets the ns-timestamp handling, not a raw scan).
    */
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the full warehouse as temp views so plain `spark.sql`
    * works over it — the ANSI-SQL front door next to the DataFrame
    * faces (Catalyst plans both identically; every oracle query in this
    * repo is runnable verbatim after this call). Returns the view names.
    */
  def registerAll(spark: SparkSession, dir: String): Seq[String] = {
    all.foreach { name =>
      val df = name match {
        case "events" => events(spark, dir)
        case other    => table(spark, dir, other)
      }
      df.createOrReplaceTempView(name)
    }
    all
  }
}
