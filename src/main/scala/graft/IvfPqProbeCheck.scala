package graft

import org.apache.spark.sql.functions._

/** Elevated-|Q| evidence for the IVF-PQ query-side probe dispatch (the
  * r14 verdict's lead item): measure [[analytics.IvfPq.lutFrameDriver]]
  * against [[analytics.IvfPq.lutFrameEngine]] at query-batch sizes where
  * the driver arm's O(|Q|·kCells·dim) serial FLOPs and |Q|·nprobe
  * collected LUT rows become the cost. The structural column is "driver
  * MB": the driver arm materializes |Q|·nprobe LUT rows
  * ((m·ksub + dim)·8 bytes each) in driver heap before anything ships;
  * the engine arm's only driver materialization is the probed-cell
  * union — ≤ kCells ints at ANY |Q| (flat).
  *
  * Run: `sbt "runMain graft.IvfPqProbeCheck"`. Knobs: SPARK_GRAFT_SF_DIR
  * (default sf0.1), SPARK_GRAFT_IVF_EXPAND (corpus replication, default
  * 8), SPARK_GRAFT_IVFPQ_QS (query-batch sizes, default
  * 1000,10000,100000), SPARK_GRAFT_IVFPQ_KCELLS (default 1024 — past
  * the literal-assign ceiling, so the engine arm also exercises the
  * join assign), SPARK_GRAFT_IVFPQ_DRIVER_MAX (largest |Q| the driver
  * arm is asked to run, default 100000).
  */
object IvfPqProbeCheck {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val expand = sys.env.getOrElse("SPARK_GRAFT_IVF_EXPAND", "8").toInt
    val qs = sys.env.getOrElse("SPARK_GRAFT_IVFPQ_QS", "1000,10000,100000")
      .split(",").map(_.trim.toInt).toSeq
    val kCells = sys.env.getOrElse("SPARK_GRAFT_IVFPQ_KCELLS", "1024").toInt
    val driverMax = sys.env.getOrElse("SPARK_GRAFT_IVFPQ_DRIVER_MAX", "100000").toInt
    val (m, ksub, nprobe) = (8, 16, 8)
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import analytics.{IvfIndex, IvfPq, PqIndex}

    val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val corpus = (0 until expand).map { i =>
      emb0.select((col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else transform(col("embedding"), (x, j) =>
           x + lit(0.35) * sin(col("vec_id") * (j + lit(i))))).as("embedding"))
    }.reduce(_ unionByName _).localCheckpoint(eager = true)
    println(s"[ivfpq-probe] corpus rows=${corpus.count()} kCells=$kCells " +
      s"m=$m ksub=$ksub nprobe=$nprobe")

    // Probe cost is init-independent — min-id init without Lloyd passes
    // stands in for a trained model (same kCells·dim codebook, same
    // m·ksub books; the measured work is identical).
    val seed = corpus.orderBy("vec_id").limit(math.max(kCells, ksub)).collect()
      .map(_.getSeq[Double](1).toSeq)
    val dim = seed.head.size
    val dsub = dim / m
    val coarse = IvfIndex.Model(seed.take(kCells).zipWithIndex.map { case (v, i) => i -> v }.toSeq)
    val books = (0 until m).map(s =>
      seed.take(ksub).toSeq.map(_.slice(s * dsub, (s + 1) * dsub)))
    val model = IvfPq.Model(coarse, PqIndex.Model(m, dsub, books))

    def measure(label: String, q: Int, force: Option[Long]): Unit = {
      val queries = corpus.limit(q).repartition(32).localCheckpoint(eager = true)
      val t0 = System.nanoTime()
      val (df, cells) = IvfPq.driverProbeMaxWorkOverride.withValue(force) {
        IvfPq.lutFrame(spark, model, queries, nprobe, "vec_id", "embedding")
      }
      df.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // An EMPTY probed-cell union on a non-driver arm is lutFrame's
      // above-ceiling fallback (union > staticPruneMaxCells → nothing is
      // collected and the scan is unfiltered) — print it as the regime
      // it is, not as a misleading 0-cell measurement (r17 ADVICE).
      val ceilinged = label != "driver" && cells.isEmpty
      val driverMB = label match {
        // driver arm: every LUT row lives on the driver before toDF
        case "driver" => q.toLong * nprobe * (m * ksub + dim + 2) * 8 / 1e6
        // engine arm: the probed-cell union only
        case _ => cells.size * 4 / 1e6
      }
      val cellsStr = if (ceilinged) ">ceiling" else cells.size.toString
      val mbStr = if (ceilinged) "n/a" else f"$driverMB%.3f"
      println(f"[ivfpq-probe] $label%-8s |Q|=$q%7d wall=$wall%8.2f s " +
        f"driverMB=$mbStr%10s probedCells=$cellsStr%8s")
    }

    qs.foreach { q =>
      if (q <= driverMax) {
        // The r16 independent row cap (driverProbeMaxRows) would bounce
        // an elevated-|Q| forced-driver run to the engine arm — lift it
        // for exactly this measurement (the POINT is to measure the bad
        // arm), restore for the dispatch row.
        val saved = sys.props.get("graft.ivfpq.driverProbeMaxRows")
        sys.props("graft.ivfpq.driverProbeMaxRows") = Long.MaxValue.toString
        try measure("driver", q, Some(Long.MaxValue))
        finally saved match {
          case Some(v) => sys.props("graft.ivfpq.driverProbeMaxRows") = v
          case None => sys.props.remove("graft.ivfpq.driverProbeMaxRows")
        }
      }
      measure("engine", q, Some(0L))
      measure("dispatch", q, None)
    }
    spark.stop()
  }
}
