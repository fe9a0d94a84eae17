package graft

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions evaluate the native kernels") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vec_cosine(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS cos,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  size(shingle_hashes('a b c d', 3)) AS n_shingles,
        |  size(minhash_sig('a b c d', 3)) AS lanes,
        |  simhash_sig('a b c d', 3) AS sim,
        |  duration_mmss(892) AS dur""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("cos") - 1.0 / math.sqrt(2)) < 1e-12)
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Int]("n_shingles") == 2) // (a b c), (b c d)
    assert(r.getAs[Int]("lanes") == 64)
    assert(r.getAs[String]("dur") == "14m 52s")
  }

  test("SQL sketch functions agree with the DataFrame API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val d = Seq((1L, "spark merge join filter scan window")).toDF("id", "text")
    d.createOrReplaceTempView("t_gfs")
    val viaSql = spark.sql("SELECT simhash_sig(text, 3) AS s FROM t_gfs").head().getLong(0)
    val viaDf = graft.analytics.Dedup.simHashSignatures(d, idCol = "id")
      .head().getAs[Long]("simhash")
    assert(viaSql == viaDf)
  }

  test("non-literal shingle size is rejected with a clear error") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1, "x")).toDF("n", "text").createOrReplaceTempView("t_gfs2")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(text, n) FROM t_gfs2").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("non-positive shingle size fails at analysis, not on the executor") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1, "a b c")).toDF("id", "text").createOrReplaceTempView("t_gfs3")
    // Pre-gate this was a per-row ArrayIndexOutOfBounds in the string
    // kernels (shingle_strings window stride with n=0 reads past the
    // token array) — SQL-reachable, so it must die in analysis instead.
    Seq("shingle_strings(text, 0)", "simhash_sig(text, 0)", "shingle_hashes(text, -1)")
      .foreach { call =>
        val e = intercept[Exception] {
          spark.sql(s"SELECT $call FROM t_gfs3").collect()
        }
        assert(e.getMessage.contains("shingle size >= 1"), s"$call: ${e.getMessage}")
      }
  }

  test("jaccard_sets is SQL-callable through the registered function") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaccard_sets(array(1L, 2L), array(2L, 3L, 4L)) AS j").head()
    assert(r.getDouble(0) == 0.25)
  }

  test("fused jaccard kernel equals the array_intersect/array_union form") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
      .select(col("doc_id"), graft.analytics.Dedup.shingleHashSet(col("text")).as("ws"))
    val a = docs.select(col("doc_id").as("a_id"), col("ws").as("a_ws"))
    val b = docs.select(col("doc_id").as("b_id"), col("ws").as("b_ws"))
    val pairs = a.join(b, col("b_id") === col("a_id") + 1)
    val diffs = pairs.select(
      graft.functions.jaccardSets(col("a_ws"), col("b_ws")).as("fused"),
      (size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
        size(array_union(col("a_ws"), col("b_ws"))).cast("double")).as("composed"))
      .filter(col("fused") =!= col("composed"))
    assert(diffs.count() == 0, "fused kernel must be value-identical")
    // Edge cases: disjoint, identical, and empty sets.
    import spark.implicits._
    val edge = Seq(
      (Seq(1L, 2L), Seq(3L, 4L), 0.0),
      (Seq(1L, 2L, 3L), Seq(3L, 2L, 1L), 1.0),
      (Seq.empty[Long], Seq.empty[Long], 0.0),
      (Seq(1L, 2L), Seq(2L, 3L), 1.0 / 3.0)
    ).toDF("a", "b", "want")
    assert(edge.filter(graft.functions.jaccardSets(col("a"), col("b")) =!= col("want")).count() == 0)
  }

  test("jaccard_sets keeps set semantics on duplicate and null elements") {
    GraftFunctions.register(spark)
    // Duplicates count once: {1} vs {1} = 1.0, not |{1,1}∩{1}|-style 0.5.
    assert(spark.sql("SELECT jaccard_sets(array(1L,1L), array(1L)) AS j")
      .head().getDouble(0) == 1.0)
    // A null element is ONE set member, equal only to another null —
    // exactly array_intersect/array_union behavior.
    val r = spark.sql(
      """SELECT
        |  jaccard_sets(array(1L, CAST(NULL AS BIGINT)), array(1L)) AS a,
        |  jaccard_sets(array(1L, CAST(NULL AS BIGINT)),
        |               array(1L, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))) AS b,
        |  size(array_intersect(array(1L, CAST(NULL AS BIGINT)), array(1L))) /
        |    size(array_union(array(1L, CAST(NULL AS BIGINT)), array(1L))) AS a_ref
        |""".stripMargin).head()
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(0) == r.getDouble(2), "must match the array-function form")
  }

  test("extensions entry point registers the same builders") {
    // The extensions class wires GraftFunctions.builders verbatim; assert
    // the registry wiring is exercised (builder list is shared).
    assert(GraftFunctions.builders.map(_._1).toSet ==
      Set("vec_cosine", "vec_dot", "shingle_hashes", "shingle_strings", "minhash_sig",
        "simhash_sig", "jaccard_sets", "set_overlap_sorted", "duration_mmss"))
    new GraftExtensions() // constructible for spark.sql.extensions
  }

  test("setOverlapSorted equals size(array_intersect) on sorted distinct sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)), // overlap 2
      (Seq(1L, 2L), Seq(3L, 4L)),                  // disjoint
      (Seq.empty[Long], Seq(1L)),                  // empty side
      (Seq(7L, 8L, 9L), Seq(7L, 8L, 9L))           // identical
    ).toDF("a", "b")
    val rows = df.select(
      graft.functions.setOverlapSorted(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // And against the corpus-shaped input: sorted token-hash sets.
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select(sort_array(graft.functions.shingleHashes(col("text"), 1)).as("hs"),
        col("doc_id"))
    val pairs = docs.alias("x").crossJoin(
      docs.select(col("hs").as("hs2"), col("doc_id").as("d2")).alias("y"))
      .select(
        graft.functions.setOverlapSorted(col("hs"), col("hs2")).as("k"),
        size(array_intersect(col("hs"), col("hs2"))).as("ref"))
      .collect()
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
