package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch harness for the q72 sketch-size pass (r10 verdict #8, r11 #3,
  * r12 #6): time the fused profiler under each candidate sketch sizing
  * at sf0.1 and isolate the exact-distinct audit's share, so the
  * BASELINE.md note on which sizes are accuracy-bound is measured, not
  * argued. Not part of the gated surface.
  */
object Profile72Tune {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val li = graft.core.Tables.lineitem(spark, dir)
    def time(label: String)(mk: => DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save() // warm
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q72tune] $label%-46s $t%6.2f s")
    }
    time("gate (profile + exact audit), current sizes") {
      graft.analytics.Profile.profileLineitem(spark, dir)
    }
    time("profile only, current (cap=8, eps=.01, rsd=.02)") {
      graft.analytics.Profile.profile(li)
    }
    time("profile only, eps=.02") {
      graft.analytics.Profile.profile(li, relativeError = 0.02)
    }
    time("profile only, eps=.05") {
      graft.analytics.Profile.profile(li, relativeError = 0.05)
    }
    time("profile only, cap=4") {
      graft.analytics.Profile.profile(li, topCapacity = 4)
    }
    time("profile only, cap=16") {
      graft.analytics.Profile.profile(li, topCapacity = 16)
    }
    time("profile only, rsd=.05") {
      graft.analytics.Profile.profile(li, distinctRsd = 0.05)
    }
    time("exact-distinct audit alone") {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      val aggs = cols.map(c => count_distinct(col(c)).as(c))
      graft.core.Spread.ifNarrow(li).agg(aggs.head, aggs.tail: _*)
    }
    spark.stop()
  }
}
