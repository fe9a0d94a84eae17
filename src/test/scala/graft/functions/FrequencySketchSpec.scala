package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min and KMV sketch guarantees: one-sided CMS error, exact
  * k-min set semantics, partition invariance (the mergeability proof in
  * practice), and agreement between the JVM-side and relational probe
  * paths.
  */
class FrequencySketchSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic skewed corpus: item i appears i times, i = 1..40.
  private def corpus = (1 to 40).flatMap(i => Seq.fill(i)(s"item$i" -> 1L))

  private def cmsOf(width: Int, parts: Int): Array[Long] = {
    val df = corpus.toDF("item", "w").repartition(parts)
    df.agg(CountMin.sketch(df, col("item"), col("w"), width).as("c"))
      .head().getAs[scala.collection.Seq[Long]]("c").toArray
  }

  test("CMS: estimate >= exact always; exact at collision-free width") {
    val cells = cmsOf(width = 512, parts = 5)
    (1 to 40).foreach { i =>
      val est = CountMin.estimate(cells, s"item$i", 512)
      assert(est >= i, s"one-sided bound violated for item$i: $est < $i")
    }
    // 40 items into 512 columns across 4 independent rows: at least one
    // row is collision-free for every item with overwhelming margin at
    // this density — but the GUARANTEED check is the bound above. Also
    // pin conservation: every row of the matrix holds the full mass.
    val mass = corpus.map(_._2).sum * 1 // weight-1 rows, total = Σi
    (0 until CountMin.Depth).foreach { r =>
      val rowSum = (0 until 512).map(cOff => cells(r * 512 + cOff)).sum
      assert(rowSum == (1 to 40).sum, s"row $r mass $rowSum != ${(1 to 40).sum}")
    }
    assert(mass == (1 to 40).sum)
  }

  test("CMS: partition-invariant (merge correctness) and weighted reduce") {
    assert(cmsOf(512, 1).toSeq == cmsOf(512, 7).toSeq,
      "sketch must not depend on partitioning")
    // Pre-aggregated weighted rows == raw unit rows.
    val pre = (1 to 40).map(i => s"item$i" -> i.toLong).toDF("item", "w")
    val preCells = pre.agg(CountMin.sketch(pre, col("item"), col("w"), 512).as("c"))
      .head().getAs[scala.collection.Seq[Long]]("c").toArray
    assert(preCells.toSeq == cmsOf(512, 3).toSeq,
      "weighted reduce must equal unit-weight expansion")
  }

  test("CMS: relational probe equals JVM estimate") {
    val df = corpus.toDF("item", "w")
    val cells = df.agg(CountMin.sketch(df, col("item"), col("w"), 64).as("cells"))
    val probes = (1 to 40).map(i => s"item$i").toDF("item")
    val rel = probes.crossJoin(broadcast(cells))
      .select(col("item"), CountMin.estimateCol(col("cells"), col("item"), 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val arr = cells.head().getAs[scala.collection.Seq[Long]]("cells").toArray
    (1 to 40).foreach { i =>
      assert(rel(s"item$i") == CountMin.estimate(arr, s"item$i", 64),
        s"relational and JVM probes disagree on item$i")
    }
  }

  private def kmvOf(vals: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    val df = vals.toDF("v").repartition(parts)
    df.agg(KmvSketch.sketch(df, col("v"), k).as("k"))
      .head().getAs[scala.collection.Seq[Long]]("k").toSeq
  }

  test("KMV: exactly the k smallest DISTINCT values, sorted") {
    val vals = Seq(50L, 10L, 30L, 10L, 90L, 20L, 30L, 70L, 60L, 40L, 80L)
    assert(kmvOf(vals, k = 4, parts = 3) == Seq(10L, 20L, 30L, 40L))
    // Fewer distincts than k: the sketch IS the distinct set.
    assert(kmvOf(Seq(5L, 5L, 3L, 9L), k = 8, parts = 2) == Seq(3L, 5L, 9L))
    // Partition invariance at scale: 1..1000 shuffled, any layout.
    val big = scala.util.Random.shuffle((1L to 1000L).toList)
    assert(kmvOf(big, 32, 1) == (1L to 32L).toSeq)
    assert(kmvOf(big, 32, 13) == (1L to 32L).toSeq)
  }

  test("KMV: unionK and bothCount implement the set-operation estimator") {
    val a = (1L to 200L).filter(_ % 2 == 0) // evens ≤ 400 ∩ ...
    val b = (1L to 200L).filter(_ % 3 == 0)
    val k = 16
    val df = Seq(("a", a), ("b", b)).toDF("s", "vs")
      .select(col("s"), explode(col("vs")).as("v"))
    val km = df.groupBy("s").agg(KmvSketch.sketch(df, col("v"), k).as("karr"))
    val row = km.groupBy().pivot("s").agg(first("karr"))
      .select(KmvSketch.unionK(col("a"), col("b"), k).as("uk"),
        KmvSketch.bothCount(KmvSketch.unionK(col("a"), col("b"), k),
          col("a"), col("b")).as("both"))
      .head()
    val uk = row.getAs[scala.collection.Seq[Long]]("uk").toSeq
    // Brute-force reference: k smallest of the DISTINCT union; then count
    // members of both k-min sets.
    val aSet = a.sorted.take(k).toSet
    val bSet = b.sorted.take(k).toSet
    val expectUk = (a ++ b).distinct.sorted.take(k)
    assert(uk == expectUk, "unionK must be the k smallest of the union")
    assert(row.getAs[Long]("both") ==
      expectUk.count(v => aSet.contains(v) && bSet.contains(v)).toLong)
  }
}
