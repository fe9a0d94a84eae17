package graft.analytics

import graft.SparkSpec

/** Hand-case gate for q119's boilerplate position coverage: cross-source
  * flagging, the minSources floor, and — the reason the operator exists —
  * that OVERLAPPING flagged windows cover the union of their positions,
  * not the sum.
  */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  private val tpl = "a b c d e f g h"      // 8-token template, 3 sources
  private val tpl2 = "b c d e f g h i"     // shifted template, 3 sources

  private val docs = Seq(
    (1L, s"$tpl x1 y1", "src1"),           // cov 0..7  of 10 → 800
    (2L, s"p2 $tpl", "src2"),              // cov 1..8  of 9  → 888
    (3L, tpl, "src3"),                     // cov 0..7  of 8  → 1000
    (4L, "q q q q q q q q", "src1"),       // pair-only window: not flagged
    (5L, "q q q q q q q q", "src2"),       //   (2 sources < minSources=3)
    (6L, s"$tpl i", "src1"),               // BOTH templates overlap: union 0..8
    (7L, s"$tpl2 z7", "src2"),             // cov 0..7  of 9  → 888
    (8L, s"z8 $tpl2", "src3"),             // cov 1..8  of 9  → 888
    (9L, "short doc", "src1")              // < 8 tokens: no windows, cov 0
  ).toDF("doc_id", "text", "source")

  test("cross-source windows are flagged; coverage is the position union") {
    val got = TextAnalysis.boilerplateCoverage(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((10L, 8L, 800L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((9L, 8L, 888L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((8L, 8L, 1000L)), s"doc3: ${got(3L)}")
    // Two-source repetition stays below the minSources floor.
    assert(got(4L) == ((8L, 0L, 0L)), s"doc4: ${got(4L)}")
    assert(got(5L) == ((8L, 0L, 0L)), s"doc5: ${got(5L)}")
    // doc6 holds BOTH flagged templates at p=0 and p=1: 9 distinct
    // positions out of 9 tokens — 1000, not a double-counted 16/9.
    assert(got(6L) == ((9L, 9L, 1000L)), s"doc6: ${got(6L)}")
    assert(got(7L) == ((9L, 8L, 888L)), s"doc7: ${got(7L)}")
    assert(got(8L) == ((9L, 8L, 888L)), s"doc8: ${got(8L)}")
    assert(got(9L) == ((2L, 0L, 0L)), s"doc9: ${got(9L)}")
  }

  test("raising minSources to 4 unflags the three-source templates") {
    val got = TextAnalysis.boilerplateCoverage(docs, minSources = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.forall(_ == 0L), s"nothing reaches 4 sources: $got")
  }
}
