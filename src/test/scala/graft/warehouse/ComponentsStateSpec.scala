package graft.warehouse

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsStateSpec extends SparkSpec {
  import spark.implicits._

  private def statePath(): String =
    Files.createTempDirectory("cc-state-spec").toString + "/state"

  test("k-batch fold equals the one-shot closure on a random graph") {
    // 60 nodes, pseudo-random edges; fold in 4 hash-split batches and
    // compare against the q30 kernel run once over the full edge set.
    val edges = (1 to 120).map { i =>
      val a = (i * 37) % 60; val b = (i * i * 13 + 7) % 60
      (a.toLong, b.toLong)
    }.filter(e => e._1 != e._2).toDF("a_id", "b_id")
    val nodes = edges.select(col("a_id").as("doc_id"))
      .unionByName(edges.select(col("b_id").as("doc_id"))).distinct()
    val oneShot = graft.analytics.Dedup.clusters(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val path = statePath()
    (0 until 4).foreach { i =>
      ComponentsState.update(spark, path,
        edges.filter(pmod(col("a_id") * 17L + col("b_id"), lit(4L)) === i))
    }
    val folded = spark.read.parquet(path)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(folded == oneShot)
  }

  test("a bridge edge in a later batch merges two whole chains") {
    val path = statePath()
    ComponentsState.update(spark, path,
      Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id"))
    ComponentsState.update(spark, path,
      Seq((10L, 11L), (11L, 12L)).toDF("a_id", "b_id"))
    val before = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before(12L) == 10L && before(3L) == 1L)
    // The bridge touches only 3 and 10, but every node of the absorbed
    // chain must relabel to the global min (1).
    ComponentsState.update(spark, path,
      Seq((3L, 10L)).toDF("a_id", "b_id"))
    val after = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.values.toSet == Set(1L))
    assert(after.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
  }

  test("replaying an already-folded batch is a no-op") {
    val path = statePath()
    val batch = Seq((1L, 2L), (3L, 4L), (2L, 3L)).toDF("a_id", "b_id")
    ComponentsState.update(spark, path, batch)
    val first = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ComponentsState.update(spark, path, batch)
    val second = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == second)
    assert(first.values.toSet == Set(1L))
  }

  test("components rollup counts nodes per label; self-loops ignored") {
    val path = statePath()
    ComponentsState.update(spark, path,
      Seq((5L, 5L), (7L, 8L)).toDF("a_id", "b_id"))
    val comps = ComponentsState.components(spark, path).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("min_node"),
          r.getAs[Long]("max_node"))).toMap
    // The (5,5) self-loop contributes nothing — node 5 never enters.
    assert(comps == Map(7L -> ((2L, 7L, 8L))))
  }
}
