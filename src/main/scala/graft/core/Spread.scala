package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Parallelism floor for compute-bound single-scan operators.
  *
  * A row-dense table landing in one or two small files (the harness
  * shape: sf0.1 lineitem is ONE 11 MB file → one scan partition) makes
  * Spark run the whole per-row kernel — sketch updates, pair explodes,
  * per-element products — on a single task, because partition count
  * follows BYTES (`spark.sql.files.maxPartitionBytes`), not row-level
  * cost. When the per-row work is the job, buying parallelism with one
  * shuffle of the (small) input is the right trade.
  *
  * The TARGET is sized from the input, not from the core count alone
  * (r18 verdict item 5: an unconditional defaultParallelism target
  * over-partitioned tiny inputs — spread queries ran FASTER at 8 cores
  * than 32): target = clamp(1, defaultParallelism,
  * optimizer-size-estimate / `bytesPerTask`). `bytesPerTask` is the
  * caller's statement of per-row cost relative to the bytes — tiny for
  * kernels that do real work per row (JPEG decode: 4 KB of doc ids is
  * a full core's worth), large for plain aggregates over wide rows.
  *
  * At real scale this is a NO-OP by construction twice over: the size
  * estimate caps the target at defaultParallelism, and a 100 TB table
  * scans as thousands of partitions, so `parts * 2 < target` is false
  * and no shuffle is added — operators can call this unconditionally.
  */
object Spread {

  /** Default per-task input budget: moderate per-row work. */
  val DefaultBytesPerTask: Long = 32L << 10

  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false // HashExpression rejects maps at analysis time
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }

  def ifNarrow(df: DataFrame): DataFrame = ifNarrow(df, DefaultBytesPerTask)

  def ifNarrow(df: DataFrame, bytesPerTask: Long): DataFrame = {
    val max = df.sparkSession.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes = (est / math.max(bytesPerTask, 1L))
      .min(BigInt(max)).max(BigInt(1)).toInt
    val target = byBytes
    if (df.rdd.getNumPartitions * 2 < target) {
      // Hash-spread, not round-robin: a keyless repartition(n) first pays
      // a LOCAL SORT of its input (spark.sql.execution.sortBeforeRepartition,
      // on since SPARK-23207 so retried tasks reproduce their row→partition
      // assignment) — and by construction that sort runs inside the one
      // narrow upstream task, i.e. exactly the serial stage this helper
      // exists to remove (measured: the q72 spread exchange's map task was
      // scan + 6M-row sort + shuffle write). Hashing every column through
      // xxhash64 is deterministic under retries (the SPARK-38388 rule: the
      // key derives from row content, not from rand()/row position), needs
      // no sort, and 64× more key values than partitions keeps collision
      // skew negligible. Rows with fully identical content co-locate —
      // irrelevant for a parallelism floor. Callers remain order-robust by
      // contract: everything downstream of a Spread is an order-independent
      // aggregate (integer sums / min / max / counts / sketches).
      // Schemas with an unhashable column (MapType anywhere in the tree —
      // Spark rejects hash(map) at analysis) fall back to the round-robin
      // repartition the pre-r18 helper used (r18 ADVICE).
      if (df.schema.fields.forall(f => hashable(f.dataType))) {
        import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
        df.repartition(target, pmod(xxhash64(df.columns.map(col): _*),
          lit(target.toLong * 64)))
      } else df.repartition(target)
    } else df
  }
}
