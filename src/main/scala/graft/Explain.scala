package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the final (post-AQE) physical plan for each named
  * query so pushdown, broadcast choice, and codegen coverage can be
  * inspected per round. Usage:
  *
  * {{{
  *   sbt "runMain graft.Explain [sfDir] [queryName ...]"
  * }}}
  *
  * With no names, audits every registered query and prints a one-line
  * summary (codegen stages, broadcast joins, shuffles, pushed filters).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = graft.core.Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")

    Registry.all.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        // Drive THIS QueryExecution to completion (a write.save() would spawn
        // its own) so the AQE plan is final and codegen stages are visible.
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        val lines = plan.split("\n")
        def c(p: String) = lines.count(_.contains(p))
        println(f"[explain] ${q.name}%-30s codegen=${c("*(")}%2d broadcast=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} shuffles=${c("Exchange")} scans=${c("FileScan")}")
        if (names.nonEmpty) println(plan)
      } catch {
        case e: Exception => println(s"[explain] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
