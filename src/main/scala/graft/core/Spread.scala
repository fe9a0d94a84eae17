package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism floor for compute-bound single-scan operators.
  *
  * A row-dense table landing in one or two small files (the harness
  * shape: sf0.1 lineitem is ONE 11 MB file → one scan partition) makes
  * Spark run the whole per-row kernel — sketch updates, pair explodes,
  * per-element products — on a single task, because partition count
  * follows BYTES (`spark.sql.files.maxPartitionBytes`), not row-level
  * cost. When the per-row work is the job, buying parallelism with one
  * round-robin shuffle of the (small) input is the right trade.
  *
  * At real scale this is a NO-OP by construction: a 100 TB table scans
  * as thousands of partitions, `parts * 2 < cores` is false, and no
  * shuffle is added — so operators can call this unconditionally.
  */
object Spread {

  def ifNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
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
      import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
      df.repartition(target, pmod(xxhash64(df.columns.map(col): _*),
        lit(target.toLong * 64)))
    } else df
  }
}
