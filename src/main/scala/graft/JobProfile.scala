package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall-time profile of one named query — the measurement tool for
  * queries whose cost is many sequential actions (state lifecycles, Lloyd
  * training) rather than one big scan: prints every Spark job the query
  * ran with its wall time and call site, so the expensive PASS (not just
  * the expensive stage) is visible. Usage:
  *
  * {{{
  *   sbt "runMain graft.JobProfile <sfDir> <queryName> [reps]"
  * }}}
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Double, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, t0, (je.time - t0) / 1e3, site))
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b)
          .getOrElse(0L)
        stages.add((si.stageId, ms / 1e3, si.numTasks,
          si.name.take(60).replace("\n", " ")))
      }
    })

    // Warm (JIT/codegen) — rep 0 is reported separately from the warm reps.
    (0 until reps).foreach { rep =>
      done.clear(); stages.clear()
      val w0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener events are async; give the bus a moment to drain.
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._1)
      println(f"== rep $rep: $name wall=$wall%.2fs jobs=${rows.size} jobsum=${rows.map(_._3).sum}%.2fs")
      // `at` = job submit offset from rep start; `gap` = driver-side idle
      // since the previous job's end (plan/optimize, marker I/O, FS ops) —
      // the state-lifecycle cost pool the r18 scaling block exposed.
      var prevEnd = w0
      rows.foreach { case (id, st, s, site) =>
        val gap = (st - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, st + (s * 1e3).toLong)
        println(f"  job $id%3d at=${(st - w0) / 1e3}%6.2fs gap=$gap%6.3fs dur=$s%7.3fs  $site")
      }
      stages.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (id, s, n, nm) =>
        println(f"  stage $id%3d $s%7.3fs tasks=$n%3d  $nm")
      }
    }
    spark.stop()
  }
}
