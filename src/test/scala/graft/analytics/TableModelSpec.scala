package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r16 lead item (the last documented ANN asymptote): a codebook at
  * k = 10⁷ is ~10 GB of driver heap when `IvfIndex.Model` holds it as a
  * Seq, and `buildSuperModel` collected a per-cell map on top. The TABLE
  * face keeps the codebook in its parquet table — the driver holds
  * (path, k) — and the super-model's member stream lives in executor
  * checkpoint storage. This spec pins the face EQUAL to the seq face at
  * small k across all three assign paths, the save/load dispatch, the
  * persisted-super round trip, and the materialize guard.
  */
class TableModelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def withTmp[A](body: java.nio.file.Path => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tablemodel")
    try body(tmp) finally graft.core.Fs.deleteRecursively(tmp)
  }

  /** Save `model`, then load it back on BOTH faces. */
  private def bothFaces(model: IvfIndex.Model,
      path: String): (IvfIndex.Model, IvfIndex.Model) = {
    IvfIndex.save(spark, model, path)
    val seqFace = IvfIndex.load(spark, path)
    val tableFace = IvfIndex.tableModelMinKOverride.withValue(Some(0)) {
      IvfIndex.load(spark, path)
    }
    assert(!seqFace.tableBacked && tableFace.tableBacked,
      s"load dispatch wrong: seq=${seqFace.tableBacked} table=${tableFace.tableBacked}")
    assert(tableFace.k == model.k, "table face lost k")
    (seqFace, tableFace)
  }

  test("table face ≡ seq face across all three assign paths, bit-exact (n=1 and n=4)") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    withTmp { tmp =>
      val (seqFace, tableFace) = bothFaces(model, s"$tmp/model")
      assert(seqFace.centroids == model.centroids, "seq face must round-trip")
      for (n <- Seq(1, 4)) {
        def assign(m: IvfIndex.Model, litMax: Int, hierMin: Int): Seq[Seq[Any]] =
          IvfIndex.literalAssignMaxKOverride.withValue(Some(litMax)) {
            IvfIndex.hierarchicalAssignMinKOverride.withValue(Some(hierMin)) {
              rows(IvfIndex.withNearestCells(c, "embedding", m, n, "cells")
                .orderBy("vec_id"))
            }
          }
        val baseline = assign(model, Int.MaxValue, Int.MaxValue)
        // literal + flat-join paths materialize the table face on demand;
        // the hierarchical path consumes it as a distributed scan.
        assert(assign(tableFace, Int.MaxValue, Int.MaxValue) == baseline,
          s"n=$n: table-face literal path diverged")
        assert(assign(tableFace, 0, Int.MaxValue) == baseline,
          s"n=$n: table-face flat-join path diverged")
        assert(assign(tableFace, 0, 0) == baseline,
          s"n=$n: table-face hierarchical path diverged")
      }
    }
  }

  test("full IVF search is face-invariant (q28 shape, hierarchical forced)") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    val queries = c.filter(col("vec_id") < 10)
    def run(m: IvfIndex.Model): Seq[Seq[Any]] =
      rows(IvfIndex.search(IvfIndex.index(c, m), queries, m, k = 5, nprobe = 4)
        .orderBy("query_id", "rank"))
    val baseline = run(model)
    withTmp { tmp =>
      val (_, tableFace) = bothFaces(model, s"$tmp/model")
      val hier = IvfIndex.literalAssignMaxKOverride.withValue(Some(0)) {
        IvfIndex.hierarchicalAssignMinKOverride.withValue(Some(0)) {
          run(tableFace)
        }
      }
      assert(hier == baseline, "table-face hierarchical search diverged")
    }
  }

  test("persisted super-model: loaded ≡ rebuilt (supers, radii, members), and save carries it") {
    val c = corpus
    val model = IvfIndex.train(c, k = 16, iters = 2)
    withTmp { tmp =>
      val path = s"$tmp/model"
      val (_, tableFace) = bothFaces(model, path)
      def key(m: IvfIndex.Model) =
        (spark.sparkContext.applicationId, m.fingerprint)
      IvfIndex.superModelCache.remove(key(tableFace))
      val built = IvfIndex.superModelFor(spark, tableFace) // builds + write-through
      val superDir = new java.io.File(s"$path/_super/members")
      assert(superDir.exists, "write-through must persist _super beside the codebook")
      // A fresh process: drop the cache, reload — must come from disk and
      // match the built one exactly.
      IvfIndex.superModelCache.remove(key(tableFace))
      val reloaded = IvfIndex.load(spark, path) // seq face; same fingerprint? no —
      // faces have different fingerprints, so resolve via the table face:
      val tableAgain = IvfIndex.tableModelMinKOverride.withValue(Some(0)) {
        IvfIndex.load(spark, path)
      }
      val loaded = IvfIndex.superModelFor(spark, tableAgain)
      assert(loaded.supers.sortBy(_._1) == built.supers.sortBy(_._1),
        "persisted supers/radii diverged from the built ones")
      def memberRows(sm: IvfIndex.SuperModel): Seq[Seq[Any]] =
        rows(sm.members.orderBy("__cell"))
      assert(memberRows(loaded) == memberRows(built),
        "persisted members diverged from the built ones")
      // The parquet reader must IGNORE the _super dir: the reloaded seq
      // face still sees exactly the codebook.
      assert(reloaded.centroids == model.centroids,
        "_super dir leaked into the codebook scan")
    }
  }

  test("materialize guard: driver centroids refuse past the ceiling; centroidsDf always works") {
    withTmp { tmp =>
      import spark.implicits._
      val path = s"$tmp/model"
      Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
        .toDF("cell", "centroid").write.parquet(path)
      val m = IvfIndex.Model.table(spark, path)
      assert(m.k == 2 && m.tableBacked)
      assert(m.centroids.map(_._1) == Seq(0, 1), "small-k materialize must work")
      assert(m.centroidsDf(spark).count() == 2)
      // Simulate extreme k: the guard is on k, not on actual bytes.
      val big = IvfIndex.Model.tableAt(path, IvfIndex.materializeMaxK + 1)
      intercept[IllegalArgumentException](big.centroids)
    }
  }

  test("fingerprint: stable per content, distinct across faces and contents, O(1) for tables") {
    withTmp { tmp =>
      import spark.implicits._
      val path = s"$tmp/model"
      Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
        .toDF("cell", "centroid").write.parquet(path)
      val a = IvfIndex.Model(Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0)))
      val b = IvfIndex.Model(Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0)))
      val c = IvfIndex.Model(Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0 + 1e-15)))
      assert(a.fingerprint == b.fingerprint, "equal content must share a fingerprint")
      assert(a.fingerprint != c.fingerprint, "an ulp flip must change the fingerprint")
      val t1 = IvfIndex.Model.table(spark, path)
      val t2 = IvfIndex.Model.table(spark, path)
      assert(t1.fingerprint == t2.fingerprint, "same table must share a fingerprint")
      assert(t1.fingerprint != a.fingerprint, "faces must not collide")
    }
  }

  test("table fingerprint is a CONTENT identity: a recluster-style rewrite " +
    "at the SAME path changes it, and the super cache follows (r16 advice)") {
    withTmp { tmp =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val path = s"$tmp/model"
      // Generation 1 at the fixed path (the IvfState bundle/model shape).
      Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
        .toDF("cell", "centroid").coalesce(1).write.parquet(path)
      val g1 = IvfIndex.Model.table(spark, path)
      val f1 = g1.fingerprint
      // Build the super model for generation 1 so the cache holds an
      // entry keyed by f1.
      val sm1 = IvfIndex.superModelFor(spark, g1)
      // Generation 2: same path, same k, DIFFERENT centroids — the
      // second-recluster collision the path-only fingerprint had.
      Seq((0, Seq(0.0, 2.0)), (1, Seq(2.0, 0.0)))
        .toDF("cell", "centroid").coalesce(1).write.mode("overwrite").parquet(path)
      val g2 = IvfIndex.Model.table(spark, path)
      assert(g2.fingerprint != f1,
        "a same-path same-k rewrite must change the table fingerprint")
      // And the super model resolved for generation 2 reflects the NEW
      // codebook (its member centroids are g2's), not the cached g1's.
      val sm2 = IvfIndex.superModelFor(spark, g2)
      val cents2 = sm2.members.select(col("__centroid"))
        .collect().map(_.getSeq[Double](0)).toSet
      assert(cents2 == Set(Seq(0.0, 2.0), Seq(2.0, 0.0)),
        s"generation 2 must not consume generation 1's cached members: $cents2")
      assert(sm1.members.select(col("__centroid"))
        .collect().map(_.getSeq[Double](0)).toSet != cents2,
        "fixture defect: the two generations' member centroids coincide")
    }
  }

  test("q264 gated row: table-face hierarchical search matches the default search") {
    val got = rows(IvfIndex.ivfKnnTable(spark, dir).orderBy("query_id", "rank"))
    val want = rows(IvfIndex.ivfKnn(spark, dir).orderBy("query_id", "rank"))
    assert(got == want, "q264 diverged from the q28 baseline")
  }
}
