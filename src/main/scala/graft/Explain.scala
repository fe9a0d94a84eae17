package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * [[Explain.audit]] is the same counter as a library call — the
  * PlanAuditSpec regression gate runs it per round so plan rot (a query
  * regressing into hundreds of scans, a broadcast decaying into a
  * sort-merge join, a nested-loop pair join reappearing) fails `sbt test`
  * instead of waiting for a judge.
  */
object Explain {

  final case class PlanStats(codegen: Int, broadcast: Int, smj: Int,
                             shuffles: Int, scans: Int, nestedLoops: Int,
                             singleParts: Int = 0) {
    override def toString =
      f"codegen=$codegen%2d broadcast=$broadcast smj=$smj shuffles=$shuffles " +
        f"scans=$scans nestedLoops=$nestedLoops singleParts=$singleParts"
  }

  /** Drive THIS DataFrame's QueryExecution to completion (a write.save()
    * would spawn its own) so the AQE plan is final, then count the
    * operators that define its scale shape.
    */
  def audit(df: DataFrame): PlanStats = {
    df.collect()
    val lines = df.queryExecution.executedPlan.toString.split("\n")
    def c(p: String) = lines.count(_.contains(p))
    PlanStats(
      codegen = c("*("),
      broadcast = c("BroadcastHashJoin"),
      smj = c("SortMergeJoin"),
      shuffles = c("Exchange"),
      scans = c("FileScan"),
      nestedLoops = c("BroadcastNestedLoopJoin") + c("CartesianProduct"),
      // The global-sort smell: a corpus-sized plan must never funnel
      // through one partition (a days-sized window may — ceiling per query).
      singleParts = c("Exchange SinglePartition"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = graft.core.Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")

    Registry.all.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        println(f"[explain] ${q.name}%-30s ${audit(df)}")
        if (names.nonEmpty) println(df.queryExecution.executedPlan.toString)
      } catch {
        case e: Exception => println(s"[explain] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
