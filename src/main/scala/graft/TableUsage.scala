package graft

/** Which base tables does each gated query actually SCAN? Answered from
  * the analyzed plan (every file relation's root path), not from source
  * grep — a query that reaches `events` through three module layers
  * still shows up. Built for the round-15 events-fixture evidence
  * repair: the pre-r14 ScaleCheck fixture copied events.parquet
  * UNREPLICATED (ScaleCheck.scala fix note), so every events-consuming
  * decade row recorded before the fix compared same-size inputs — the
  * re-sweep needs the exact consumer list, enumerated mechanically.
  *
  * Usage: `sbt "runMain graft.TableUsage [sfDir] [table]"` — prints one
  * line per query naming the base tables it scans; with a `table`
  * argument, prints only queries touching that table (comma-separated
  * list on one final line, ready for SPARK_GRAFT_SCALE_QUERIES).
  */
object TableUsage {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1)
    val spark = graft.core.Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")

    val hits = Registry.all.flatMap { q =>
      val tables: Set[String] =
        try {
          val df = q.run(spark, sfDir)
          df.queryExecution.analyzed.collect {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              lr.relation match {
                case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  h.location.rootPaths.map(_.getName.stripSuffix(".parquet")).toSet
                case _ => Set.empty[String]
              }
          }.flatten.toSet
        } catch {
          case e: Exception =>
            println(s"[usage] ${q.name} FAILED to build: ${e.getMessage}")
            Set.empty[String]
        }
      val base = tables.filter(t => new java.io.File(s"$sfDir/$t.parquet").exists)
      println(f"[usage] ${q.name}%-34s ${base.toSeq.sorted.mkString(",")}")
      if (only.forall(base.contains)) Some(q.name) else None
    }
    only.foreach { t =>
      println(s"[usage] queries scanning $t: ${hits.size}")
      println(hits.mkString(","))
    }
    spark.stop()
  }
}
