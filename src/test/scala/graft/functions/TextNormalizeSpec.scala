package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String = TextKernels.nfcCleanString(s)

  test("NFC composes decomposed sequences") {
    assert(clean("cafe\u0301") == "caf\u00E9")
    assert(clean("A\u030Angstro\u0308m") == "\u00C5ngstr\u00F6m")
    // Hangul jamo L+V+T composes to one precomposed syllable.
    assert(clean("\u1100" + "\u1161" + "\u11A8") == "\uAC01")
    // Already-composed text is untouched.
    assert(clean("caf\u00E9") == "caf\u00E9")
  }

  test("controls strip; tab/newline survive per contract") {
    assert(clean("ab\u0001cd\u0007e") == "abcde")
    // \n is content and kept; \t folds into the blank collapse.
    assert(clean("a\nb") == "a\nb")
    assert(clean("a\tb") == "a b")
    // Spaces joined only by stripped controls still collapse to one.
    assert(clean("a \u0002 b") == "a b")
  }

  test("blank runs collapse and ends trim, newlines unaffected") {
    assert(clean("  a   b\t\tc  ") == "a b c")
    assert(clean(" \nx") == "\nx") // trim is space-only, \n is content
    assert(clean("x  \n") == "x \n")
    assert(clean("") == "")
    assert(clean(" \t ") == "")
  }

  test("ASCII fast path returns the identical instance") {
    val s = "already clean text"
    assert(clean(s) eq s)
    // ...but only when genuinely clean.
    assert(clean("double  space") ne "double  space")
  }

  test("expression evaluates under codegen over a DataFrame and keeps nulls") {
    val df = Seq(Some("  cafe\u0301  x "), Some("ok"), None)
      .toDF("t")
      .select(graft.functions.nfcClean(col("t")).as("c"))
    assert(df.collect().map(_.getAs[String]("c")).toSeq ==
      Seq("caf\u00E9 x", "ok", null))
  }

  test("idempotent: clean(clean(s)) == clean(s)") {
    val samples = Seq("  cafe\u0301\t du  monde ", "a\n\n b",
      "\u1100\u1161\u11A8  x", "plain")
    samples.foreach { s =>
      val once = clean(s)
      assert(clean(once) == once, s"not idempotent on ${s.codePoints().toArray.toSeq}")
    }
  }
}
