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
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
