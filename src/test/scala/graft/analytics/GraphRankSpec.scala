package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  // Undirected star: center c, leaves l1..l3 (edges in both directions).
  private def star = {
    val pairs = Seq(("c", "l1"), ("c", "l2"), ("c", "l3"))
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  test("pageRank: one integer round matches the hand-computed recurrence exactly") {
    // N=4, U=1e12: r0 = 250e9 each; base = ((3e12 div 20) div 4) = 37.5e9.
    // center: 37.5e9 + (17·(3·250e9)) div 20                  = 675e9
    // leaf:   37.5e9 + (17·(250e9 div 3)) div 20 = 37.5e9 + 70_833_333_333
    val out = GraphRank.pageRank(star, iters = 1).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_units")).toMap
    assert(out("c") == 675000000000L)
    assert(out("l1") == 108333333333L)
    assert(out("l2") == 108333333333L && out("l3") == 108333333333L)
  }

  test("pageRank: mass only shrinks (truncation) and the hub stays on top") {
    val out = GraphRank.pageRank(star, iters = 5).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_units")).toMap
    assert(out.values.sum <= 1000000000000L, "truncating division never adds mass")
    assert(out("c") > out("l1"), "the hub outranks its leaves")
    assert(out("l1") == out("l2") && out("l2") == out("l3"), "symmetric leaves tie")
  }

  test("pageRank: bit-identical across partitioning layouts") {
    val a = GraphRank.pageRank(star, iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = GraphRank.pageRank(star.repartition(7), iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b, "integer arithmetic must be schedule-invariant")
  }

  test("pageRank: degrees reported alongside ranks") {
    val out = GraphRank.pageRank(star, iters = 1).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("degree")).toMap
    assert(out("c") == 3L && out("l1") == 1L)
  }

  // Path a-b-c-d plus isolated pair x-y (undirected: both directions).
  private lazy val path = {
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  test("hopDistances: exact BFS levels, unreachable marked -1") {
    val seeds = Seq("a").toDF("node")
    val out = GraphRank.hopDistances(path, seeds, iters = 6).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("hops")).toMap
    assert(out == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L,
      "x" -> -1L, "y" -> -1L))
  }

  test("hopDistances: multi-source takes the minimum over seeds") {
    val out = GraphRank.hopDistances(path, Seq("a", "d").toDF("node"), 6)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("hops")).toMap
    assert(out("b") == 1L && out("c") == 1L && out("a") == 0L && out("d") == 0L)
  }

  test("hopDistances: a round budget below the diameter reports the frontier honestly") {
    val out = GraphRank.hopDistances(path, Seq("a").toDF("node"), iters = 1)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("hops")).toMap
    assert(out("b") == 1L && out("c") == -1L && out("d") == -1L)
  }

  test("triangles: K4 has four triangles, three at every corner") {
    val nodes = Seq("a", "b", "c", "d")
    val k4 = (for (u <- nodes; v <- nodes if u != v) yield (u, v)).toDF("src", "dst")
    val out = GraphRank.triangles(k4).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("tri_count")).toMap
    assert(out == nodes.map(_ -> 3L).toMap)
  }

  test("triangles: square plus one diagonal — the diagonal's endpoints sit in both") {
    // a-b-c-d-a plus a-c: triangles (a,b,c) and (a,c,d) only.
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
    val g = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val out = GraphRank.triangles(g).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("tri_count")).toMap
    assert(out == Map("a" -> 2L, "b" -> 1L, "c" -> 2L, "d" -> 1L))
  }

  test("triangles: duplicate, reversed, and self-loop edges never inflate counts") {
    val noisy = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
      ("a", "a")).toDF("src", "dst")
    val out = GraphRank.triangles(noisy).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("tri_count")).toMap
    assert(out == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    val deg = GraphRank.triangles(noisy).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("degree")).toMap
    assert(deg == Map("a" -> 2L, "b" -> 2L, "c" -> 2L), "self-loop dropped from degree")
  }

  test("triangles: identical counts across partitioning layouts") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"))
    val g = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val a = GraphRank.triangles(g).collect()
      .map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = GraphRank.triangles(g.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
