package graft

import org.apache.spark.sql.functions._

/** Recall auditor for the approximate similarity paths: compares the
  * LSH-candidate near-dup pipeline against the exact O(n²) baseline at a
  * given scale dir and prints missed pairs (there must be none for the
  * gated q21 to stay oracle-exact). Usage:
  *
  * {{{
  *   sbt "runMain graft.RecallAudit [sfDir] [threshold]"
  * }}}
  */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val threshold = args.drop(1).headOption.map(_.toDouble).getOrElse(0.35)
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.core.Tables.embeddings(spark, sfDir).cache()
    val exact = graft.analytics.Similarity.cosineNearDups(emb, threshold)
      .select("a_id", "b_id").cache()
    val lsh = graft.analytics.Similarity.lshCosineNearDups(emb, threshold)
      .select("a_id", "b_id").cache()
    val nExact = exact.count()
    val nLsh = lsh.count()
    val missed = exact.exceptAll(lsh).collect()
    val extra = lsh.exceptAll(exact).count()
    println(s"[recall] $sfDir t=$threshold exact=$nExact lsh=$nLsh " +
      s"missed=${missed.length} extra=$extra recall=${
        if (nExact == 0) 1.0 else (nExact - missed.length).toDouble / nExact}")
    missed.foreach(r => println(s"[recall] MISSED pair $r"))
    spark.stop()
  }
}
