package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Divide, Expression, ExpressionInfo, Floor, IntegerLiteral, Literal, Remainder}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.functions.{CosineSim, DotProduct, JaccardSets, MinHashSig, SetOverlapSorted, ShingleHashArray, ShingleStrings, SimHashSig}

/** SQL surface for the engine's native expressions.
  *
  * Registered either at session build time
  * (`spark.sql.extensions=graft.GraftExtensions`, or
  * `.withExtensions(new GraftExtensions)`) or onto an existing session via
  * [[GraftFunctions.register]]. Makes every custom kernel callable from
  * `spark.sql(...)`:
  *
  * {{{
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT minhash_sig(text, 3), simhash_sig(text, 3) FROM documents
  *   SELECT duration_mmss(span_secs) FROM ...
  * }}}
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case IntegerLiteral(n) => n
    case _ => throw new IllegalArgumentException(s"$fn: shingle size must be an integer literal")
  }

  val builders: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("vec_cosine", es => CosineSim(es(0), es(1)),
      "vec_cosine(a, b) - fused-loop cosine similarity of two float/double arrays"),
    ("vec_dot", es => DotProduct(es(0), es(1)),
      "vec_dot(a, b) - fused-loop dot product of two float/double arrays"),
    ("shingle_hashes", es => ShingleHashArray(es(0), intLit(es(1), "shingle_hashes")),
      "shingle_hashes(text, n) - distinct xxhash64 hashes of word n-gram shingles"),
    ("shingle_strings", es => ShingleStrings(es(0), intLit(es(1), "shingle_strings")),
      "shingle_strings(text, n) - word n-gram shingle strings, duplicates kept (n=1 = token stream)"),
    ("minhash_sig", es => MinHashSig(es(0), intLit(es(1), "minhash_sig")),
      "minhash_sig(text, n) - 64-lane MinHash signature over word n-gram shingles"),
    ("simhash_sig", es => SimHashSig(es(0), intLit(es(1), "simhash_sig")),
      "simhash_sig(text, n) - portable 60-bit SimHash (md5 basis) over word n-gram shingles"),
    ("jaccard_sets", es => JaccardSets(es(0), es(1)),
      "jaccard_sets(a, b) - exact set-semantics Jaccard of two bigint arrays (duplicates count once, null is one member; fused sort-merge pass)"),
    ("set_overlap_sorted", es => SetOverlapSorted(es(0), es(1)),
      "set_overlap_sorted(a, b) - intersection size of two SORTED distinct bigint arrays (single merge pass; callers pre-sort)"),
    ("duration_mmss", es => durationExpr(es(0)),
      "duration_mmss(secs) - seconds to '<M>m <S>s' with uncapped minutes"))

  /** Pure-catalyst form of [[graft.functions.durationMmSs]] — a builder
    * must return resolved-constructible Expressions, not Column-DSL trees
    * (whose unresolved ColumnNodes can't be spliced into an analyzed plan).
    * The modulo keeps the input's own type (the analyzer coerces the
    * literal) so fractional seconds render identically to the Column API
    * (`90.5` → `"1m 30.5s"` on both surfaces).
    */
  private def durationExpr(secs: Expression): Expression =
    Concat(Seq(
      Cast(Floor(Divide(Cast(secs, DoubleType), Literal(60.0d))), StringType),
      Literal("m "),
      Cast(Remainder(secs, Literal(60)), StringType),
      Literal("s")))

  /** Register onto an already-built session (temp-function registry). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point: the SQL function surface plus the
  * range-join optimizer rule (inert until
  * `spark.graft.rangeJoin.binWidth` is set — see
  * [[graft.plans.RangeJoinRewrite]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder, usage) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
    e.injectOptimizerRule(_ => new graft.plans.RangeJoinRewrite)
  }
}
