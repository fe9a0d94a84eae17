package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r13-verdict lead item: the IVF coarse quantizer's literal assign
  * path (one struct expression per centroid) is the last extreme-scale
  * ceiling — at k ~ √n ≳ 10⁴ the plan itself becomes the bottleneck.
  * [[IvfIndex.joinNearestCells]] is the O(1)-plan replacement; this spec
  * pins it EQUAL to the literal path (values, doubles, tie-breaks,
  * column carry-through) and pins its scale shape (single shuffle of one
  * row per input row; the ×k pair stream dies in the map-side bounded
  * top-n aggregation).
  */
class IvfJoinAssignSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("join-path nearest-cells ≡ literal-path, n=1 and n=4, bit-exact") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    for (n <- Seq(1, 4)) {
      val literal = IvfIndex.literalAssignMaxKOverride.withValue(Some(Int.MaxValue)) {
        rows(IvfIndex.withNearestCells(c, "embedding", model, n, "cells")
          .orderBy("vec_id"))
      }
      val joined = IvfIndex.literalAssignMaxKOverride.withValue(Some(0)) {
        rows(IvfIndex.withNearestCells(c, "embedding", model, n, "cells")
          .orderBy("vec_id"))
      }
      assert(joined == literal,
        s"n=$n: join-path assignment diverged from the literal path")
    }
  }

  test("equal-distance ties resolve to the same cell on both paths") {
    import spark.implicits._
    // Two IDENTICAL centroids (cells 0 and 1): d ties exactly; both paths
    // must pick cell 0 (the literal path via array_sort's (d, cell)
    // struct order, the join path via TopK's (-score, key) total order).
    val model = IvfIndex.Model(Seq(
      0 -> Seq(1.0, 0.0), 1 -> Seq(1.0, 0.0), 2 -> Seq(0.0, 1.0)))
    val df = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)))
      .toDF("vec_id", "embedding")
    for (forced <- Seq(Some(0), Some(Int.MaxValue))) {
      val got = IvfIndex.literalAssignMaxKOverride.withValue(forced) {
        IvfIndex.withNearestCells(df, "embedding", model, 2, "cells")
          .orderBy("vec_id")
          .select(col("cells").getField("cell")).collect().map(_.getSeq[Int](0))
      }
      assert(got(0) == Seq(0, 1), s"forced=$forced: tie must resolve 0 before 1, got ${got(0)}")
      assert(got(1) == Seq(2, 0), s"forced=$forced: got ${got(1)}")
      // n = 1 takes the codegen'd min/min_by branch of the join path —
      // its first-encountered tie-break must also resolve to cell 0.
      val one = IvfIndex.literalAssignMaxKOverride.withValue(forced) {
        IvfIndex.index(df, model).orderBy("vec_id")
          .select("cell").collect().map(_.getInt(0)).toSeq
      }
      assert(one == Seq(0, 2), s"forced=$forced n=1: got $one")
    }
  }

  test("full IVF search is path-invariant (q28 shape, forced join assign)") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    val queries = c.filter(col("vec_id") < 10)
    val default = rows(IvfIndex.search(IvfIndex.index(c, model), queries, model,
      k = 5, nprobe = 4).orderBy("query_id", "rank"))
    val forcedJoin = IvfIndex.literalAssignMaxKOverride.withValue(Some(0)) {
      rows(IvfIndex.search(IvfIndex.index(c, model), queries, model,
        k = 5, nprobe = 4).orderBy("query_id", "rank"))
    }
    assert(forcedJoin == default, "search result changed under the join assign path")
  }

  test("training is path-invariant: Lloyd under forced join assign yields the same clustering") {
    val c = corpus
    val literal = IvfIndex.literalAssignMaxKOverride.withValue(Some(Int.MaxValue)) {
      IvfIndex.train(c, k = 8, iters = 2)
    }
    val joined = IvfIndex.literalAssignMaxKOverride.withValue(Some(0)) {
      IvfIndex.train(c, k = 8, iters = 2)
    }
    // ASSIGNMENTS are pinned bit-exact (test above); the Lloyd MEAN update
    // is a float `avg` whose accumulation order differs once the join
    // path's exchange reorders rows — non-associativity puts the two
    // models within float-noise of each other, not bitwise equal. What
    // must hold: per-coordinate agreement to 1e-9 and an identical
    // resulting corpus clustering.
    assert(literal.centroids.map(_._1) == joined.centroids.map(_._1))
    literal.centroids.zip(joined.centroids).foreach { case ((id, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"cell $id centroid drifted: $x vs $y")
      }
    }
    val assignLit = rows(IvfIndex.index(c, literal).select("vec_id", "cell").orderBy("vec_id"))
    val assignJoin = rows(IvfIndex.index(c, joined).select("vec_id", "cell").orderBy("vec_id"))
    assert(assignLit == assignJoin, "corpus clustering diverged between training paths")
  }

  test("join path scale shape: one shuffle, one row per input row, bounded top-n agg") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    val df = IvfIndex.joinNearestCells(c, "embedding", model, 1, "cells")
    val n = df.count() // also executes, so AQE's final plan is available
    assert(n == c.count(), "join path must emit exactly one row per input row")

    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case r: ReusedExchangeExec => p +: flatten(r.child)
      case _ => p +: p.children.flatMap(flatten)
    }
    val all = flatten(df.queryExecution.executedPlan)
    val shuffles = all.collect { case e: ShuffleExchangeExec => e }
    // Shape: one agg exchange (one ~20-byte row per input row) plus at
    // most the join-back's two — and NO exchange may ever carry the ×k
    // pair stream: any shuffle whose subtree contains the pair-producing
    // nested-loop join must have the partial argmin aggregation between
    // them (map-side collapse). n=1 must stay fully codegen'd
    // (HashAggregate, primitive buffers) — a carry aggregate with a
    // struct buffer silently demotes this to SortAggregate over n·k rows.
    assert(shuffles.nonEmpty && shuffles.size <= 3,
      s"join assign grew extra exchanges: ${shuffles.size}")
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    shuffles.foreach { e =>
      val sub = flatten(e.child)
      if (sub.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
        assert(sub.exists(_.isInstanceOf[BaseAggregateExec]),
          "an exchange would carry the raw pair stream — the argmin " +
            "aggregation must collapse it map-side first")
    }
    assert(all.exists(_.isInstanceOf[HashAggregateExec]),
      "n=1 argmin must plan as codegen'd HashAggregate (primitive buffers)")
    val nprobe = IvfIndex.joinNearestCells(c, "embedding", model, 2, "cells")
    nprobe.count()
    assert(flatten(nprobe.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ObjectHashAggregateExec]),
      "n>1 must use the bounded-heap top-n aggregation")
  }

  test("shuffle-upstream inputs stay correct on the join path (keyed " +
    "frame pinned so both subtrees see one row-key assignment)") {
    // An input whose plan contains a shuffle (here a join + an
    // aggregate-derived frame) has network-arrival row order — the two
    // independent evaluations of the row key could disagree without the
    // localCheckpoint pin, silently mis-pairing rows and cells. Pin
    // correctness by equality with the literal path on the same input.
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    val counts = c.groupBy((col("vec_id") % 7).as("g"))
      .count().withColumnRenamed("g", "grp")
    val shuffled = c.withColumn("grp", col("vec_id") % 7)
      .join(counts, Seq("grp"))
      .repartition(7, col("grp"))
      .select("vec_id", "embedding")
    val literal = IvfIndex.literalAssignMaxKOverride.withValue(Some(Int.MaxValue)) {
      rows(IvfIndex.index(shuffled, model).select("vec_id", "cell").orderBy("vec_id"))
    }
    val joined = IvfIndex.literalAssignMaxKOverride.withValue(Some(0)) {
      rows(IvfIndex.index(shuffled, model).select("vec_id", "cell").orderBy("vec_id"))
    }
    assert(joined == literal,
      "join-path assignment must survive shuffle-upstream (order-unstable) inputs")
  }

  test("dispatch flips at the k threshold") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    // k=16 model: threshold 15 → join path (has a shuffle); threshold 16
    // → literal path (pure map, zero shuffle).
    def shuffleCount(maxK: Int): Int =
      IvfIndex.literalAssignMaxKOverride.withValue(Some(maxK)) {
        IvfIndex.withNearestCells(c, "embedding", model, 1, "cells")
          .queryExecution.executedPlan.toString
          .linesIterator.count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      }
    assert(shuffleCount(16) == 0, "k ≤ threshold must take the zero-shuffle literal path")
    assert(shuffleCount(15) >= 1, "k > threshold must take the join path")
  }
}
