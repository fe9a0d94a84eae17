package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r14-verdict item 8 (the last documented ANN asymptote): past
  * [[IvfIndex.hierarchicalAssignMinK]] the flat join assign's k-cell
  * codebook broadcast exceeds executor memory, and
  * [[IvfIndex.hierarchicalNearestCell]] replaces it with a √k-row
  * super-codebook broadcast + a shuffled member-centroid DATA join,
  * EXACT by the triangle-inequality ball bound. This spec pins the
  * hierarchical path bit-equal to the literal and flat-join paths at
  * small k (assignments, d doubles, ties, search results, Lloyd
  * clustering, shuffle-upstream inputs) and pins the dispatch flip —
  * the IvfJoinAssignSpec discipline, one level up.
  */
class HierarchicalAssignSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Force (literalMaxK, hierMinK) so exactly one path can win. */
  private def forced[A](litMax: Int, hierMin: Int)(body: => A): A =
    IvfIndex.literalAssignMaxKOverride.withValue(Some(litMax)) {
      IvfIndex.hierarchicalAssignMinKOverride.withValue(Some(hierMin))(body)
    }

  test("hierarchical assign ≡ literal and flat-join paths, bit-exact (n=1)") {
    val c = corpus
    for (k <- Seq(16, 64)) {
      val model = IvfIndex.train(c, k = k, iters = 2)
      def assign(litMax: Int, hierMin: Int): Seq[Seq[Any]] =
        forced(litMax, hierMin) {
          rows(IvfIndex.withNearestCells(c, "embedding", model, 1, "cells")
            .orderBy("vec_id"))
        }
      val literal = assign(Int.MaxValue, Int.MaxValue)
      val flatJoin = assign(0, Int.MaxValue)
      val hier = assign(0, 0)
      assert(hier == literal, s"k=$k: hierarchical diverged from literal")
      assert(hier == flatJoin, s"k=$k: hierarchical diverged from flat join")
    }
  }

  test("hierarchical n>1 (query-probe shape) ≡ literal and flat-join paths, bit-exact") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    def assign(litMax: Int, hierMin: Int): Seq[Seq[Any]] =
      forced(litMax, hierMin) {
        rows(IvfIndex.withNearestCells(c, "embedding", model, 4, "cells")
          .orderBy("vec_id"))
      }
    val literal = assign(Int.MaxValue, Int.MaxValue)
    val flatJoin = assign(0, Int.MaxValue)
    val hier = assign(0, 0)
    assert(hier == literal, "hierarchical n=4 diverged from literal")
    assert(hier == flatJoin, "hierarchical n=4 diverged from flat join")
    // The duplicate-centroid tie fixture at n = 2: the Bₙ bound and the
    // member heap must keep the literal slice's exact (d, cell) order.
    import spark.implicits._
    val tieModel = IvfIndex.Model(Seq(
      0 -> Seq(1.0, 0.0), 1 -> Seq(1.0, 0.0), 2 -> Seq(0.0, 1.0)))
    val df = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)))
      .toDF("vec_id", "embedding")
    val got = forced(0, 0) {
      IvfIndex.withNearestCells(df, "embedding", tieModel, 2, "cells")
        .orderBy("vec_id")
        .select(col("cells").getField("cell")).collect().map(_.getSeq[Int](0))
    }
    assert(got(0) == Seq(0, 1) && got(1) == Seq(2, 0),
      s"n=2 hierarchical tie order diverged: ${got.toSeq}")
  }

  test("equal-distance ties resolve to the same cell (duplicate-centroid fixture)") {
    import spark.implicits._
    val model = IvfIndex.Model(Seq(
      0 -> Seq(1.0, 0.0), 1 -> Seq(1.0, 0.0), 2 -> Seq(0.0, 1.0)))
    val df = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)))
      .toDF("vec_id", "embedding")
    val got = forced(0, 0) {
      IvfIndex.index(df, model).orderBy("vec_id")
        .select("cell").collect().map(_.getInt(0)).toSeq
    }
    assert(got == Seq(0, 2),
      s"hierarchical tie must resolve to the smallest cell, got $got")
  }

  test("shuffle-upstream (order-unstable) inputs stay correct") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    val counts = c.groupBy((col("vec_id") % 7).as("g"))
      .count().withColumnRenamed("g", "grp")
    val shuffled = c.withColumn("grp", col("vec_id") % 7)
      .join(counts, Seq("grp"))
      .repartition(7, col("grp"))
      .select("vec_id", "embedding")
    val literal = forced(Int.MaxValue, Int.MaxValue) {
      rows(IvfIndex.index(shuffled, model).select("vec_id", "cell").orderBy("vec_id"))
    }
    val hier = forced(0, 0) {
      rows(IvfIndex.index(shuffled, model).select("vec_id", "cell").orderBy("vec_id"))
    }
    assert(hier == literal,
      "hierarchical assignment must survive order-unstable inputs")
  }

  test("full IVF search and Lloyd training are path-invariant under forced hierarchical assign") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    val queries = c.filter(col("vec_id") < 10)
    val default = rows(IvfIndex.search(IvfIndex.index(c, model), queries, model,
      k = 5, nprobe = 4).orderBy("query_id", "rank"))
    val hier = forced(0, 0) {
      rows(IvfIndex.search(IvfIndex.index(c, model), queries, model,
        k = 5, nprobe = 4).orderBy("query_id", "rank"))
    }
    assert(hier == default, "search result changed under the hierarchical assign")
    // Lloyd under forced hierarchical assign: same clustering (the
    // IvfJoinAssignSpec tolerance argument — float mean wobble allowed,
    // resulting corpus partition must agree).
    val trainedHier = forced(0, 0)(IvfIndex.train(c, k = 8, iters = 2))
    val trainedLit = forced(Int.MaxValue, Int.MaxValue)(IvfIndex.train(c, k = 8, iters = 2))
    val aLit = rows(IvfIndex.index(c, trainedLit).select("vec_id", "cell").orderBy("vec_id"))
    val aHier = rows(IvfIndex.index(c, trainedHier).select("vec_id", "cell").orderBy("vec_id"))
    assert(aLit == aHier, "Lloyd clustering diverged under hierarchical assign")
  }

  test("large-magnitude unnormalized vectors stay exact (the magnitude-scaled " +
    "pruning slack)") {
    // r15 ADVICE: ds and the radii come from the cancellation-prone
    // ‖v‖²−2⟨v,s⟩+‖s‖² form under sqrt — at magnitude M the absolute
    // float error scales like √(dim·ε)·M, so the r15 fixed
    // 1e-9·(1+|B|) slack could drop a boundary super and silently
    // break exactness off the unit sphere. Scale the planted corpus by
    // 1e8 (float error ~ tens at that magnitude — far beyond the old
    // slack for near-boundary supers) and pin the hierarchical assign
    // bit-equal to the literal path, n=1 and n=4. Scaling preserves the
    // assignment STRUCTURE (argmin is scale-invariant in exact math),
    // so the literal baseline is well-defined. Honesty note: this
    // fixture's geometry leaves no super within float error of the
    // pruning boundary, so the r15 slack also happens to survive it —
    // the magnitude-scaled slack turns that survival from geometric
    // luck into an analytic bound; the test is the regression canary
    // for exactness off the unit sphere, not a differential proof.
    val big = corpus.withColumn("embedding",
      transform(col("embedding"), x => x * lit(1.0e8)))
      .localCheckpoint(eager = true)
    val model = IvfIndex.train(big, k = 16, iters = 2)
    for (n <- Seq(1, 4)) {
      def assign(litMax: Int, hierMin: Int): Seq[Seq[Any]] =
        forced(litMax, hierMin) {
          rows(IvfIndex.withNearestCells(big, "embedding", model, n, "cells")
            .orderBy("vec_id"))
        }
      val literal = assign(Int.MaxValue, Int.MaxValue)
      val hier = assign(0, 0)
      assert(hier == literal,
        s"n=$n: hierarchical assign diverged on magnitude-1e8 vectors")
    }
  }

  test("dispatch: above hierMinK, n=1 takes the codegen'd two-pass form and " +
    "n>1 the heap form; below it the flat join keeps both") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    def planOf(n: Int, hierMin: Int): String = forced(0, hierMin) {
      IvfIndex.withNearestCells(c, "embedding", model, n, "cells")
        .queryExecution.optimizedPlan.toString
    }
    assert(planOf(1, 0).contains("__hier_row"),
      "n=1 above the ceiling must take the two-pass hierarchical path")
    assert(planOf(2, 0).contains("__hiern_row"),
      "n>1 above the ceiling must take the heap hierarchical path")
    assert(!planOf(2, Int.MaxValue).contains("__hiern_row"),
      "below the ceiling n>1 must keep the flat join")
  }
}
