package graft

import org.apache.spark.sql.functions._

/** Elevated-k evidence for the disk-backed codebook (the r16 lead item,
  * r15 verdict: "a measured row showing flat driver heap at an
  * elevated-k super-model build"). For each k it writes a synthetic
  * k-cell codebook parquet DISTRIBUTED (the driver never holds it), then
  * loads + builds the two-level super-model on BOTH faces and reports
  * driver-heap deltas and walls:
  *
  *  - SEQ face: load collects k·dim·8 bytes to a driver Seq (the r15
  *    Model) — the asymptote (10 GB at k = 10⁷, dim 128);
  *  - TABLE face: the driver holds (path, k); the super build's member
  *    stream lives in executor checkpoint storage; driver state is the
  *    √k-row super list + radii.
  *
  * Heap deltas are GC-settled before/after snapshots — indicative, not
  * exact (the JVM is shared), but the structural gap (k·dim vs √k·dim)
  * dominates noise from k ≳ 2¹⁸. Run:
  * `sbt "runMain graft.IvfTableModelCheck"`. Knobs:
  * SPARK_GRAFT_TABLE_KS (default "262144,1048576"),
  * SPARK_GRAFT_TABLE_DIM (default 16), SPARK_GRAFT_TABLE_SEQ_MAX
  * (largest k the seq face is asked to load, default 1048576).
  */
object IvfTableModelCheck {

  private def heapUsed(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  def main(args: Array[String]): Unit = {
    val ks = sys.env.getOrElse("SPARK_GRAFT_TABLE_KS", "262144,1048576")
      .split(",").map(_.trim.toInt).toSeq
    val dim = sys.env.getOrElse("SPARK_GRAFT_TABLE_DIM", "16").toInt
    val seqMax = sys.env.getOrElse("SPARK_GRAFT_TABLE_SEQ_MAX", "1048576").toInt
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import analytics.IvfIndex

    val tmp = java.nio.file.Files.createTempDirectory("graft-tablecheck")
    try {
      ks.foreach { k =>
        val path = s"$tmp/codebook_$k"
        // Distributed synthesis: deterministic pseudo-random centroids,
        // never materialized on the driver.
        spark.range(k.toLong).repartition(32)
          .select(col("id").cast("int").as("cell"),
            transform(sequence(lit(0), lit(dim - 1)),
              j => sin(col("id") * dim + j)).as("centroid"))
          .write.mode("overwrite").parquet(path)

        def run(label: String, face: Option[Int]): Unit = {
          val h0 = heapUsed()
          val t0 = System.nanoTime()
          val model = IvfIndex.tableModelMinKOverride.withValue(face) {
            IvfIndex.load(spark, path)
          }
          val loadMB = (heapUsed() - h0) / 1e6
          val tLoad = (System.nanoTime() - t0) / 1e9
          def blockBytes(): Long =
            spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
          val b1 = blockBytes()
          val h1 = heapUsed()
          val t1 = System.nanoTime()
          // Fresh build each run: evict any cached super for this model.
          IvfIndex.superModelCache.remove(
            (spark.sparkContext.applicationId, model.fingerprint))
          graft.core.Fs.deleteRecursively(
            java.nio.file.Paths.get(s"$path/_super"))
          val sm = IvfIndex.superModelFor(spark, model)
          val superMB = (heapUsed() - h1) / 1e6
          val tSuper = (System.nanoTime() - t1) / 1e9
          // Attribution: in local[n] the "executors" share the driver
          // JVM, so the members localCheckpoint (k rows, EXECUTOR block
          // storage by design — distributed on a real cluster) shows up
          // in the heap delta. blockMB (the build's block-store
          // INCREMENT) separates it: driver-PROPER super state is
          // superMB − blockMB ≈ the √k super list.
          val blockMB = (blockBytes() - b1) / 1e6
          println(f"[table-model] face=$label%-5s k=$k%8d dim=$dim " +
            f"loadMB=$loadMB%9.1f superMB=$superMB%9.1f blockMB=$blockMB%9.1f " +
            f"loadWall=$tLoad%7.2f superWall=$tSuper%8.2f " +
            f"supers=${sm.supers.size}%5d tableBacked=${model.tableBacked}")
        }
        run("table", Some(0))
        if (k <= seqMax) run("seq", Some(Int.MaxValue))
      }
    } finally graft.core.Fs.deleteRecursively(tmp)
    spark.stop()
  }
}
