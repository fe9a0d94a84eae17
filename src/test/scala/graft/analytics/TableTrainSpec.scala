package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The table ROUTE of Lloyd training ([[IvfIndex.trainTable]]): the
  * codebook is written to parquet each iteration and re-enters the next
  * assignment as a distributed scan — nothing codebook-proportional on
  * the driver, completing the extreme-k lifecycle (train → index →
  * search) the table face of Model opened for load/assign/search. This
  * spec pins the route bit-equal to the seq route ([[IvfIndex.train]]):
  * same init mapping, same mean aggregation values, same empty-cell
  * carry, same downstream search — plus the recluster dispatch in the
  * IVF and IVF-PQ states.
  */
class TableTrainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def withTmp[A](body: java.nio.file.Path => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tabletrain")
    try body(tmp) finally graft.core.Fs.deleteRecursively(tmp)
  }

  test("trainTable ≡ train, bit-exact centroids (k=16 and k=64)") {
    val c = corpus
    withTmp { tmp =>
      for (k <- Seq(16, 64)) {
        val seqModel = IvfIndex.train(c, k = k, iters = 2)
        val tableModel = IvfIndex.trainTable(c, k = k, s"$tmp/m$k", iters = 2)
        assert(tableModel.centroids == seqModel.centroids,
          s"k=$k: table-route centroids diverged from the seq route")
      }
    }
  }

  test("trainTable under forced table-face + hierarchical assign: centroids within ulp wobble, search exact") {
    // Cross-SHAPE training (hierarchical assign over a parquet member
    // frame vs the literal assign over a local relation) re-orders the
    // distributed mean's partial merges — the documented last-ulp Lloyd
    // wobble (PqIndex scaladoc), so the pinned contract here is
    // approximate centroids + EXACT search (the planted margin dwarfs
    // codebook wobble; same-shape bit-equality is the previous test).
    val c = corpus
    withTmp { tmp =>
      val seqModel = IvfIndex.train(c, k = 16, iters = 2)
      val queries = c.filter(col("vec_id") < 10)
      val want = rows(IvfIndex.search(IvfIndex.index(c, seqModel), queries,
        seqModel, k = 5, nprobe = 4).orderBy("query_id", "rank"))
      IvfIndex.tableModelMinKOverride.withValue(Some(0)) {
        IvfIndex.literalAssignMaxKOverride.withValue(Some(0)) {
          IvfIndex.hierarchicalAssignMinKOverride.withValue(Some(0)) {
            val tableModel = IvfIndex.trainTable(c, k = 16, s"$tmp/m", iters = 2)
            assert(tableModel.tableBacked, "forced face must come back table-backed")
            tableModel.centroids.zip(seqModel.centroids).foreach {
              case ((idT, cT), (idS, cS)) =>
                assert(idT == idS)
                cT.zip(cS).foreach { case (a, b) =>
                  assert(math.abs(a - b) <= 1e-9 * (1.0 + math.abs(b)),
                    s"cell $idT centroid drifted beyond ulp wobble: $a vs $b")
                }
            }
            val got = rows(IvfIndex.search(IvfIndex.index(c, tableModel),
              queries, tableModel, k = 5, nprobe = 4)
              .orderBy("query_id", "rank"))
            assert(got.map(_.take(2)) == want.map(_.take(2)),
              "search neighbors diverged under the forced hierarchical table route")
          }
        }
      }
    }
  }

  test("empty cells carry the previous centroid on both routes (duplicate-vector fixture)") {
    import spark.implicits._
    // Two identical vectors: with min-id init both become centroids, the
    // tie assigns every member to the smaller cell, and the larger cell
    // goes EMPTY — its centroid must survive the iteration unchanged.
    val df = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    withTmp { tmp =>
      val seqModel = IvfIndex.train(df, k = 3, iters = 2)
      val tableModel = IvfIndex.trainTable(df, k = 3, s"$tmp/m", iters = 2)
      assert(tableModel.centroids == seqModel.centroids,
        "empty-cell carry diverged between the routes")
      assert(seqModel.centroids.map(_._2).contains(Seq(1.0, 0.0)),
        "fixture must actually have an empty (carried) cell")
    }
  }

  test("k > n clamps to n centroids like the seq route") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    withTmp { tmp =>
      val seqModel = IvfIndex.train(df, k = 5, iters = 1)
      val tableModel = IvfIndex.trainTable(df, k = 5, s"$tmp/m", iters = 1)
      assert(tableModel.k == seqModel.centroids.size)
      assert(tableModel.centroids == seqModel.centroids)
    }
  }

  test("q28 search on a table-trained model equals the default search") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 10)
    val want = rows(IvfIndex.ivfKnn(spark, dir).orderBy("query_id", "rank"))
    withTmp { tmp =>
      val m = IvfIndex.trainTable(c, k = 16, s"$tmp/m", iters = 2)
      val got = rows(IvfIndex.search(IvfIndex.index(c, m), queries, m,
        k = 5, nprobe = 4).orderBy("query_id", "rank"))
      assert(got == want, "search on a table-trained model diverged")
    }
  }

  test("state reclusters dispatch to the table route past the face threshold; searches unchanged") {
    import graft.warehouse.{IvfState, IvfPqState}
    val c = corpus
    def runIvf(): Seq[Seq[Any]] = {
      val root = java.nio.file.Files.createTempDirectory("graft-ttr-ivf")
      try {
        val statePath = root.toString + "/state"
        (0 until 3).foreach { i =>
          IvfState.update(spark, statePath, c.filter(col("vec_id") % 3 === i))
          if (i == 1) IvfState.recluster(spark, statePath, k = Some(16))
        }
        rows(IvfState.search(spark, statePath, c.filter(col("vec_id") < 10),
          k = 5, nprobe = 4).orderBy("query_id", "rank")
          .localCheckpoint(eager = true))
      } finally graft.core.Fs.deleteRecursively(root)
    }
    def runIvfPq(): Seq[Seq[Any]] = {
      val root = java.nio.file.Files.createTempDirectory("graft-ttr-ivfpq")
      try {
        val statePath = root.toString + "/state"
        (0 until 3).foreach { i =>
          IvfPqState.update(spark, statePath, c.filter(col("vec_id") % 3 === i))
          if (i == 1) IvfPqState.recluster(spark, statePath, kCells = Some(16))
        }
        rows(IvfPqState.search(spark, statePath, c.filter(col("vec_id") < 10),
          k = 5, nprobe = 4, shortlist = 50).orderBy("query_id", "rank")
          .localCheckpoint(eager = true))
      } finally graft.core.Fs.deleteRecursively(root)
    }
    val (ivfDefault, ivfPqDefault) = (runIvf(), runIvfPq())
    // Force EVERY recluster and load onto the table route/face: the
    // state lifecycle (ingest → table-trained bundle → search) must be
    // result-invariant.
    val (ivfTable, ivfPqTable) =
      IvfIndex.tableModelMinKOverride.withValue(Some(0)) {
        (runIvf(), runIvfPq())
      }
    assert(ivfTable == ivfDefault, "IvfState table-route search diverged")
    assert(ivfPqTable == ivfPqDefault, "IvfPqState table-route search diverged")
  }
}
