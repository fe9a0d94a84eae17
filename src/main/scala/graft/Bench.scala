package graft

/** Benchmark main — driver contract: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Every query is fully materialized through the `noop` sink (a bare
  * `count()` would let Catalyst prune projections and undercount the real
  * work). Queries run in name order for stable attribution; AQE is left on
  * (Spark 4 default) so runtime re-planning is part of what we measure.
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPS` times (default 3) and reports
  * the per-query MIN: single-shot numbers on a shared host swing up to
  * ~2× under concurrent JVM load (the r2 71.6 s-vs-47.0 s adjudication),
  * and the min is the run least polluted by external noise — the number
  * that tracks plan changes rather than host weather.
  *
  * The JSON line additionally records `/proc/loadavg` before and after the
  * run plus every per-rep time (`reps`), so a load-polluted artifact is
  * self-identifying (the r3 adjudication: a recorded 52 s total that a
  * quiet re-run measured at 25.5 s) — a reader can see both the host
  * pressure and the rep spread without re-running anything.
  */
object Bench {
  /** First three /proc/loadavg fields as a JSON array ("[]" off-Linux). */
  private def loadavg(): String =
    try {
      val raw = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      raw.trim.split("\\s+").take(3).mkString("[", ",", "]")
    } catch { case _: Exception => "[]" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val loadPre = loadavg()
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // Warm the JVM/codegen paths once so the first timed query doesn't
    // absorb ~4s of session startup (we measure queries, not JIT).
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      }
      // A query that failed any rep reports -1 (failures must stay loud).
      (name, if (times.exists(_ < 0)) -1.0 else times.min, times)
    }
    // Locale-independent formatting: the f interpolator uses the default
    // locale, which renders comma decimal separators (de_DE "12,345") and
    // silently corrupts the JSON artifact. Double.toString never does.
    def r3(t: Double): String = (math.rint(t * 1000) / 1000).toString
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val repJson = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val loadPost = loadavg()
    // The driver captures only the LAST 2000 chars of sbt stdout and parses
    // the JSON line out of that tail (r4's line, with inline reps, overran
    // the buffer and the round's bench artifact came back unparsed). Keep
    // the stdout line compact; the per-rep detail goes to a side file.
    val base = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","loadavg_pre":$loadPre,"loadavg_post":$loadPost"""
    val detail = base + s""","reps":$repJson}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_DETAIL.json"), detail + "\n")
    catch { case e: Exception => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    val line = base + "}"
    if (line.length > 1800)  // [success] trailer eats ~100 of the 2000-char tail
      System.err.println(s"[bench] WARNING stdout line ${line.length} chars may overrun driver tail")
    println(line)
    spark.stop()
  }
}
