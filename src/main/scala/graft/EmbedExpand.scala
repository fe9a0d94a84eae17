package graft

import org.apache.spark.sql.functions._

/** Materialize a slim elevated-base fixture for embedding-only decade
  * runs (the r13 verdict item 5 ask: re-measure q47's decade with a
  * base-shuffle denominator ≥ 5 MB): `embeddings.parquet` replicated
  * ×factor with the ScaleCheck rotation-noise recipe, every other table
  * copied through at 1× (q47 reads only embeddings; dragging a ×50
  * lineitem along would cost minutes and GBs for nothing).
  *
  * Replica ids are offset by i·10⁹ — deliberately a DIFFERENT stride
  * than ScaleCheck.materialize's i·10⁷, so running ScaleCheck's ×10
  * replication ON TOP of this base cannot collide vec_ids (collisions
  * would silently corrupt dedup semantics: excludeSelf keys on id).
  *
  * Run: `sbt "runMain graft.EmbedExpand <base> <out> <factor>"`.
  */
object EmbedExpand {
  def main(args: Array[String]): Unit = {
    val (base, out, factor) = (args(0), args(1), args(2).toInt)
    val spark = graft.core.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until factor).map { i =>
      emb.select((col("vec_id") + lit(i.toLong * 1_000_000_000L)).as("vec_id"),
        (if (i == 0) col("embedding")
         else transform(col("embedding"), (x, j) =>
           (x.cast("double") + lit(0.35) * sin(col("vec_id") * (j + lit(i))))
             .cast("float"))).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents").foreach { t =>
      val src = java.nio.file.Paths.get(s"$base/$t.parquet")
      val dst = java.nio.file.Paths.get(s"$out/$t.parquet")
      if (java.nio.file.Files.exists(src) && !java.nio.file.Files.exists(dst))
        java.nio.file.Files.copy(src, dst)
    }
    println(s"[embed-expand] wrote ${factor}x embeddings base at $out")
    spark.stop()
  }
}
