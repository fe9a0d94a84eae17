package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.SparkSpec

/** Binary sign-code ANN ([[BitIndex]]): 252 packed hyperplane sign bits
  * per vector, fused XOR+popcount Hamming shortlist, exact re-rank.
  * Pins brute-force parity on the planted corpus, the packed layout +
  * Hamming kernel laws, the zero-vector edge, broadcast-gate
  * invariance, and the IVF composite.
  */
class BitIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    Similarity.plantedKnnCorpus(graft.core.Tables.embeddings(spark, dir))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("binary search equals brute-force exact kNN on the planted corpus") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 10)
    val got = rows(BitIndex.searchBit(BitIndex.encode(c), queries, k = 5,
      shortlist = 50).orderBy("query_id", "rank"))
    val want = rows(Similarity.bruteForceKnn(c, queries, 5)
      .orderBy("query_id", "rank"))
    assert(got == want, "binary ANN diverged from brute force on the planted margin")
  }

  test("codes pack into 4 longs; Hamming kernel obeys identity/symmetry " +
    "and the sign-agreement law separates twins from naturals") {
    val enc = BitIndex.encode(corpus)
    val codesType = enc.schema("codes").dataType
    assert(codesType == ArrayType(LongType, containsNull = false) ||
      codesType == ArrayType(LongType, containsNull = true),
      s"codes must be array<bigint>, got $codesType")
    assert(enc.filter(size(col("codes")) =!= 4).count() == 0,
      "every vector must pack into exactly 4 long words")
    // Kernel laws on real pairs: d(x,x) = 0; d symmetric.
    val a = enc.select(col("vec_id").as("ida"), col("codes").as("ca"))
    val b = enc.select(col("vec_id").as("idb"), col("codes").as("cb"))
    val pairs = a.join(b, col("ida") % 7 === col("idb") % 7)
      .withColumn("dab", graft.functions.hammingDistance(col("ca"), col("cb")))
      .withColumn("dba", graft.functions.hammingDistance(col("cb"), col("ca")))
    assert(pairs.filter(col("dab") =!= col("dba")).count() == 0, "Hamming must be symmetric")
    assert(pairs.filter(col("ida") === col("idb") && col("dab") =!= 0).count() == 0,
      "d(x,x) must be 0")
    // Planted twins sit far under the natural floor (the exactness
    // argument): max twin Hamming << min natural Hamming for queries.
    val twin = enc.filter(col("vec_id") < 10).select(col("vec_id").as("q"), col("codes").as("qc"))
      .join(enc.filter(col("vec_id") >= 100000)
        .withColumn("src", (col("vec_id") - 100000) / 10)
        .filter(col("src") < 10)
        .select(col("src").cast("long").as("q"), col("codes").as("tc")), Seq("q"))
      .agg(max(graft.functions.hammingDistance(col("qc"), col("tc")))).head().getLong(0)
    val natural = enc.filter(col("vec_id") < 10).select(col("vec_id").as("q"), col("codes").as("qc"))
      .crossJoin(enc.filter(col("vec_id") >= 10 && col("vec_id") < 100000)
        .select(col("codes").as("nc")))
      .agg(min(graft.functions.hammingDistance(col("qc"), col("nc")))).head().getLong(0)
    assert(twin < natural,
      s"planted separation must hold in Hamming space: maxTwin=$twin minNatural=$natural")
  }

  test("zero vectors code to all-zero bits and never outrank real candidates") {
    import spark.implicits._
    val c = Seq(
      (0L, Seq.fill(64)(0.0).updated(0, 1.0)),
      (1L, Seq.fill(64)(0.0).updated(0, 0.9).updated(1, 0.1)),
      (2L, Seq.fill(64)(0.0)))
      .toDF("vec_id", "embedding")
    val enc = BitIndex.encode(c)
    val zc = enc.filter(col("vec_id") === 2).select("codes").head().getSeq[Long](0)
    assert(zc.forall(_ == 0L), s"zero vector must code to all-zero words: $zc")
    val got = BitIndex.searchBit(enc, c.filter(col("vec_id") === 0), k = 1,
      shortlist = 3).select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), s"zero vector must rank last, got $got")
  }

  test("IVF-binary composite equals brute force; probe prunes the candidate stream") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 10)
    val coarse = IvfIndex.train(c, k = 16, iters = 2)
    val indexed = BitIndex.indexIvf(c, coarse)
    val got = rows(BitIndex.searchIvf(indexed, queries, coarse, k = 5,
      nprobe = 4, shortlist = 50).orderBy("query_id", "rank"))
    val want = rows(Similarity.bruteForceKnn(c, queries, 5)
      .orderBy("query_id", "rank"))
    assert(got == want, "IVF-binary diverged from brute force")
    val n = c.count()
    val maxCell = indexed.groupBy("cell").count()
      .agg(max("count")).head().getLong(0)
    assert(maxCell * 4 < n,
      s"fixture must actually spread cells (maxCell=$maxCell n=$n)")
  }

  test("results invariant across the query-side broadcast gate") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 10)
    def run(): Seq[Seq[Any]] =
      rows(BitIndex.searchBit(BitIndex.encode(c), queries, k = 5, shortlist = 50)
        .orderBy("query_id", "rank"))
    val hinted = IvfIndex.queryBroadcastMaxRowsOverride
      .withValue(Some(Long.MaxValue))(run())
    val gated = IvfIndex.queryBroadcastMaxRowsOverride
      .withValue(Some(0L))(run())
    assert(gated == hinted, "binary ANN results changed across the broadcast gate")
  }
}
