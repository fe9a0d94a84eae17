package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

import graft.SparkSpec

/** SQ8 scalar-quantized ANN ([[SqIndex]]): per-vector int8 codes + one
  * scale double, approximate-cosine shortlist on the codes (scale
  * cancels), exact re-rank. Pins brute-force parity on the planted
  * corpus, the 1-byte layout claim, the zero-vector edge, and
  * broadcast-gate invariance.
  */
class SqIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("SQ8 search equals brute-force exact kNN on the planted corpus") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 10)
    val got = rows(SqIndex.searchSq(SqIndex.encode(c), queries, k = 5,
      shortlist = 50).orderBy("query_id", "rank"))
    val want = rows(Similarity.bruteForceKnn(c, queries, 5)
      .orderBy("query_id", "rank"))
    assert(got == want, "SQ8 diverged from brute force on the planted margin")
  }

  test("codes are genuinely 1-byte elements; scale reconstructs within 1/254 relative") {
    val enc = SqIndex.encode(corpus)
    val codesType = enc.schema("codes").dataType
    assert(codesType == ArrayType(ByteType, containsNull = true) ||
      codesType == ArrayType(ByteType, containsNull = false),
      s"codes must be array<tinyint>, got $codesType")
    // Reconstruction error bound: |x − code·scale| ≤ scale/2 per element.
    val bad = enc
      .withColumn("maxerr", array_max(zip_with(
        col("embedding").cast("array<double>"),
        col("codes").cast("array<double>"),
        (x, c) => abs(x - c * col("scale")))))
      .filter(col("maxerr") > col("scale") / 2 + lit(1e-12))
      .count()
    assert(bad == 0, s"$bad vectors exceeded the scale/2 reconstruction bound")
  }

  test("zero vectors encode to scale 0 and never outrank real candidates") {
    import spark.implicits._
    val c = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val enc = SqIndex.encode(c)
    assert(enc.filter(col("vec_id") === 2).select("scale").head().getDouble(0) == 0.0)
    val got = SqIndex.searchSq(enc, c.filter(col("vec_id") === 0), k = 1,
      shortlist = 2).select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), s"zero vector must rank last, got $got")
  }

  test("IVF-SQ8 composite equals brute force; probe prunes the candidate stream") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 10)
    val coarse = IvfIndex.train(c, k = 16, iters = 2)
    val indexed = SqIndex.indexIvf(c, coarse)
    val got = rows(SqIndex.searchIvf(indexed, queries, coarse, k = 5,
      nprobe = 4, shortlist = 50).orderBy("query_id", "rank"))
    val want = rows(Similarity.bruteForceKnn(c, queries, 5)
      .orderBy("query_id", "rank"))
    assert(got == want, "IVF-SQ8 diverged from brute force")
    // Pruning is real: candidates scanned per query ≤ rows in the 4
    // probed cells, strictly under the corpus (16-cell spread).
    val n = c.count()
    val maxCell = indexed.groupBy("cell").count()
      .agg(max("count")).head().getLong(0)
    assert(maxCell * 4 < n,
      s"fixture must actually spread cells (maxCell=$maxCell n=$n)")
  }

  test("IVF-SQ8 is path-invariant under forced hierarchical coarse assign") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 10)
    val coarse = IvfIndex.train(c, k = 16, iters = 2)
    def run(): Seq[Seq[Any]] =
      rows(SqIndex.searchIvf(SqIndex.indexIvf(c, coarse), queries, coarse,
        k = 5, nprobe = 4, shortlist = 50).orderBy("query_id", "rank"))
    val default = run()
    val hier = IvfIndex.literalAssignMaxKOverride.withValue(Some(0)) {
      IvfIndex.hierarchicalAssignMinKOverride.withValue(Some(0))(run())
    }
    assert(hier == default, "IVF-SQ8 changed under the hierarchical assign")
  }

  test("filtered IVF-SQ8 equals exact per-stratum kNN; no cross-stratum leakage") {
    val c = corpus.withColumn("label",
      when(col("vec_id") < 100000L, col("vec_id") % 3)
        .otherwise(((col("vec_id") - 100000L) / 10).cast("long") % 3))
    val queries = c.filter(col("vec_id") < 10)
    val coarse = IvfIndex.train(c, k = 16, iters = 2)
    val indexed = SqIndex.encode(
      IvfIndex.index(c.select(col("vec_id"), col("embedding"), col("label")),
        coarse, "embedding"))
    val got = SqIndex.searchIvfFiltered(indexed, queries, coarse, k = 5,
      filterCol = "label", nprobe = 4, shortlist = 50)
    val want = Similarity.filteredKnn(c, queries, k = 5, filterCol = "label")
    assert(rows(got.orderBy("query_id", "rank")) ==
      rows(want.orderBy("query_id", "rank")),
      "filtered ANN diverged from exact per-stratum kNN")
    // Leakage audit: every returned neighbor shares its query's stratum.
    val leaks = got
      .join(c.select(col("vec_id").as("query_id"), col("label").as("ql")), Seq("query_id"))
      .join(c.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), Seq("neighbor_id"))
      .filter(col("ql") =!= col("nl")).count()
    assert(leaks == 0, s"$leaks cross-stratum neighbors leaked")
  }

  test("results invariant across the query-side broadcast gate") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 10)
    def run(): Seq[Seq[Any]] =
      rows(SqIndex.searchSq(SqIndex.encode(c), queries, k = 5, shortlist = 50)
        .orderBy("query_id", "rank"))
    val hinted = IvfIndex.queryBroadcastMaxRowsOverride
      .withValue(Some(Long.MaxValue))(run())
    val gated = IvfIndex.queryBroadcastMaxRowsOverride
      .withValue(Some(0L))(run())
    assert(gated == hinted, "SQ8 results changed across the broadcast gate")
  }
}
