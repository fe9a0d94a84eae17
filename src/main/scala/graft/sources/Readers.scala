package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File ingestion — the Spark restatement of the reference's bulk loader
  * (reference dump.py): JSON-array files, NDJSON files with per-line error
  * skip, a format sniffer, and parquet for warehouse-native data.
  */
object Readers {

  sealed trait Format
  case object JsonArray extends Format
  case object Ndjson extends Format
  case object Parquet extends Format
  case object Orc extends Format
  case object Csv extends Format

  /** Extension dispatch for the self-describing/columnar formats, then a
    * first-non-whitespace-byte sniff for the text ones: `[` → JSON array,
    * `{` → NDJSON, else CSV when the extension says so, defaulting to
    * NDJSON (reference dump.py:34-45). Reads one small block off the
    * filesystem — driver-side, O(1).
    */
  def detectFormat(spark: SparkSession, path: String): Format = {
    byExtension(path) match { case Some(f) => return f; case None => () }
    val p0 = new Path(path)
    val hfs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A directory of part files: sniff the first visible file.
    val p =
      if (hfs.getFileStatus(p0).isDirectory)
        hfs.listStatus(p0).map(_.getPath)
          .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
          .sortBy(_.getName)
          .headOption.getOrElse(sys.error(s"no data files under $path"))
      else p0
    byExtension(p.getName) match { case Some(f) => return f; case None => () }
    val in = hfs.open(p)
    try {
      val buf = new Array[Byte](4096)
      val n = in.read(buf)
      val firstNonWs = buf.take(math.max(n, 0)).find(b => !Character.isWhitespace(b.toInt))
      firstNonWs match {
        case Some(b) if b == '['.toByte => JsonArray
        case _                          => Ndjson
      }
    } finally in.close()
  }

  private def byExtension(name: String): Option[Format] =
    if (name.endsWith(".parquet")) Some(Parquet)
    else if (name.endsWith(".orc")) Some(Orc)
    else if (name.endsWith(".csv")) Some(Csv)
    else None

  /** Large `[...]` file — the reference streams it with ijson
    * (dump.py:117-122); Spark's multiLine JSON reader handles it natively.
    */
  def jsonArray(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", "true")
    schema.fold(r)(r.schema).json(path)
  }

  /** Line-delimited JSON with per-line error skip instead of job failure —
    * parity with the reference's skip-and-count semantics (dump.py:125-143).
    *
    * Default path is `DROPMALFORMED`: bad lines vanish at the scan, nothing
    * extra is materialized — the scalable engine path. Pass
    * `keepCorrupt = true` to get PERMISSIVE parsing with a
    * `_corrupt_record` column for auditing; split that DataFrame with
    * [[withCorruptSplit]], which owns the mandatory cache (Spark forbids
    * filtering a raw file scan on only the corrupt column) and releases
    * it when done.
    */
  def ndjson(spark: SparkSession, path: String, schema: Option[StructType] = None,
             keepCorrupt: Boolean = false): DataFrame =
    if (!keepCorrupt) {
      val r = spark.read.option("mode", "DROPMALFORMED")
      schema.fold(r)(r.schema).json(path)
    } else {
      val r = spark.read
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
      schema match {
        case Some(s) =>
          val withCorrupt =
            if (s.fieldNames.contains("_corrupt_record")) s
            else s.add("_corrupt_record", "string")
          r.schema(withCorrupt).json(path)
        case None => r.json(path)
      }
    }

  /** Valid rows of a PERMISSIVE parse. The input must be cached (Spark
    * forbids filtering a raw file scan on only the corrupt column) — use
    * [[withCorruptSplit]], which owns the cache lifecycle, rather than
    * calling this on a raw parse directly.
    */
  def good(df: DataFrame): DataFrame =
    if (df.columns.contains("_corrupt_record"))
      df.filter(df("_corrupt_record").isNull).drop("_corrupt_record")
    else df

  /** Corrupt rows of a PERMISSIVE parse — same caching contract as [[good]]. */
  def corrupt(df: DataFrame): DataFrame =
    if (df.columns.contains("_corrupt_record")) {
      // Fail actionably: Spark rejects queries referencing ONLY the
      // internal corrupt column of a raw file scan, so an uncached input
      // would die later with an opaque AnalysisException.
      require(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "corrupt() needs a cached input — use Readers.withCorruptSplit(df) { ... }, " +
          "which owns the cache lifecycle")
      df.filter(df("_corrupt_record").isNotNull).select("_corrupt_record")
    } else df.limit(0).selectExpr("CAST(NULL AS STRING) AS _corrupt_record")

  /** Split a PERMISSIVE parse into (good, corrupt) with a caller-scoped
    * cache: parse once, hand both views to `f`, always release the cache.
    * The cache is mandatory correctness-wise (filtering a raw scan on only
    * `_corrupt_record` is rejected by Spark) and the bracket keeps
    * long-lived drivers from accumulating storage memory one load at a
    * time.
    */
  def withCorruptSplit[A](df: DataFrame)(f: (DataFrame, DataFrame) => A): A = {
    val cached = df.cache()
    try f(good(cached), corrupt(cached))
    finally cached.unpersist()
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Header CSV. With a schema, malformed lines drop at the scan (same
    * contract as [[ndjson]]); schemaless falls back to inference.
    */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true").option("mode", "DROPMALFORMED")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** Sniff-and-dispatch load (reference dump.py main path). Malformed
    * NDJSON/CSV lines are dropped at the scan.
    */
  def load(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    detectFormat(spark, path) match {
      case JsonArray => jsonArray(spark, path, schema)
      case Ndjson    => ndjson(spark, path, schema)
      case Parquet   => parquet(spark, path)
      case Orc       => orc(spark, path)
      case Csv       => csv(spark, path, schema)
    }
}
