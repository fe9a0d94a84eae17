package graft

/** Dev smoke: exercises the exact driver contract — SparkEntry.entry on
  * sf0.001 must return rows > 0. Run: `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("8")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n (driver requires >0)")
    assert(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
