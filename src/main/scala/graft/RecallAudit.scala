package graft

/** Recall auditor for the approximate similarity paths: compares the
  * LSH-candidate near-dup pipeline against the exact O(n²) baseline and
  * prints missed pairs (there must be none for the gated q21 to stay
  * oracle-exact). With no args it audits the GATED q21 configuration
  * (planted-twin corpus, threshold 0.9, 24×12-bit tables) at every scale
  * dir the correctness harness uses; pass an explicit dir + threshold to
  * audit the raw corpus at op-level defaults. Exits non-zero on any miss
  * so it can gate CI. Usage:
  *
  * {{{
  *   sbt "runMain graft.RecallAudit"                      // gated q21, all SFs
  *   sbt "runMain graft.RecallAudit /root/testdata/sf0.1 0.35"  // raw corpus
  * }}}
  */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    val runs: Seq[(String, Boolean, Double)] = args.headOption match {
      case Some(dir) =>
        Seq((dir, false, args.drop(1).headOption.map(_.toDouble).getOrElse(0.35)))
      case None =>
        Seq("0.001", "0.01", "0.1").map(sf =>
          (s"/root/testdata/sf$sf", true, graft.analytics.Similarity.GatedThreshold))
    }
    var totalMissed = 0L
    runs.foreach { case (sfDir, gated, threshold) =>
      val raw = graft.core.Tables.embeddings(spark, sfDir)
      val emb = (if (gated) graft.analytics.Similarity.plantedTwinCorpus(raw) else raw).cache()
      val exact = graft.analytics.Similarity.cosineNearDups(emb, threshold)
        .select("a_id", "b_id").cache()
      val lsh = (if (gated)
        graft.analytics.Similarity.lshCosineNearDups(emb, threshold,
          graft.analytics.Similarity.GatedTables, graft.analytics.Similarity.GatedBits)
      else graft.analytics.Similarity.lshCosineNearDups(emb, threshold))
        .select("a_id", "b_id").cache()
      val nExact = exact.count()
      val nLsh = lsh.count()
      val missed = exact.exceptAll(lsh).collect()
      val extra = lsh.exceptAll(exact).count()
      totalMissed += missed.length
      println(s"[recall] $sfDir gated=$gated t=$threshold exact=$nExact lsh=$nLsh " +
        s"missed=${missed.length} extra=$extra recall=${
          if (nExact == 0) 1.0 else (nExact - missed.length).toDouble / nExact}")
      missed.foreach(r => println(s"[recall] MISSED pair $r"))
      emb.unpersist(blocking = false)
    }
    spark.stop()
    if (totalMissed > 0) sys.exit(1)
  }
}
