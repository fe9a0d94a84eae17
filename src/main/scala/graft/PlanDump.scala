package graft

/** Dump each named query's `.explain("formatted")` output to a file —
  * the per-round optimization evidence (`plans/rN/<query>_{before,after}.txt`).
  * Usage:
  *
  * {{{
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [queryName ...]"
  * }}}
  *
  * Each query is materialized through the noop sink first so the plan is
  * the FINAL AQE plan (`isFinalPlan=true`), then the formatted explain of
  * that execution is written to `<outDir>/<query>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSet
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"${q.name}_$suffix.txt"), txt)
        println(s"[plandump] wrote ${q.name}_$suffix.txt (${txt.length} chars)")
      } catch {
        case e: Exception => println(s"[plandump] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
