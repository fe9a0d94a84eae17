package graft

import org.apache.spark.sql.functions._

/** Scratch measurement tool: print the optimizer size estimate and scan
  * partition count for each Spread.ifNarrow caller's input frame at a
  * given SF dir, to size the spread target from the input instead of
  * defaultParallelism (r18 verdict item 5).
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def p(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val parts = df.rdd.getNumPartitions
      println(f"[spreadprobe] $name%-28s est=$est%12s bytes parts=$parts")
    }
    val docs = graft.core.Tables.documents(spark, dir)
    p("q69.docid", docs.select(col("doc_id")))
    p("q83.source_text", docs.select(col("source"), col("text")))
    val li = graft.core.Tables.lineitem(spark, dir)
    p("q72.lineitem", li)
    val emb = graft.core.Tables.embeddings(spark, dir)
    p("pca.embedding", emb.select(col("embedding")))
    p("docs.full", docs)
    spark.stop()
  }
}
