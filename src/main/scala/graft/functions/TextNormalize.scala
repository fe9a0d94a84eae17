package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization kernel — the canonicalization step a text
  * corpus runs BEFORE any dedup/shingle/fingerprint pass, so that
  * byte-different but canonically-equal strings ("cafe" + U+0301 vs
  * "café") collapse to one form and stop defeating exact-hash dedup.
  *
  * Contract (each step mirrors a DuckDB-expressible transform, so the
  * whole kernel is oracle-gateable — q90):
  *   1. Unicode NFC canonical composition (UAX #15; `nfc_normalize`).
  *   2. Strip control characters `[\x01-\x08\x0B-\x1F\x7F]` — keeps
  *      `\t` and `\n` (tabs fold into step 3; newlines are content).
  *   3. Collapse `[ \t]+` runs to a single space.
  *   4. Trim leading/trailing spaces.
  *
  * Reference analogue: clean.py's whitespace/HTML scrub
  * (/root/reference, transform stage) — generalized to real Unicode
  * canonicalization rather than ASCII-only replaces.
  */
object TextKernels {

  /** Fast-path detector: pure-ASCII input with no strippable control,
    * no tab, no double/leading/trailing space is already in normal form
    * — return it unchanged (zero-alloc for the overwhelmingly common
    * clean row at corpus scale; NFC can't alter pure ASCII).
    */
  private def alreadyClean(s: String): Boolean = {
    val n = s.length
    var i = 0
    var prevSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 0x80 || c == '\t' || c == 0x7F ||
        (c < 0x20 && c != '\n')) return false
      val isSpace = c == ' '
      if (isSpace && (prevSpace || i == 0 || i == n - 1)) return false
      prevSpace = isSpace
      i += 1
    }
    true
  }

  private def strippable(c: Char): Boolean =
    (c >= 0x01 && c <= 0x08) || (c >= 0x0B && c <= 0x1F) || c == 0x7F

  def nfcCleanString(raw: String): String = {
    if (alreadyClean(raw)) return raw
    val nfc = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    // One pass that is exactly strip-then-collapse-then-trim: stripped
    // chars don't break a blank run (spaces joined only by controls
    // still collapse to one), and a pending space is emitted only
    // between two kept chars (== trim at both ends).
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = nfc.charAt(i)
      if (c == ' ' || c == '\t') pendingSpace = true
      else if (!strippable(c)) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def nfcClean(s: UTF8String): UTF8String =
    UTF8String.fromString(nfcCleanString(s.toString))
}

/** `nfc_clean(text)` — see [[TextKernels]]. Stays inside whole-stage
  * codegen (the generated body is one static call).
  */
case class NfcClean(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_clean"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  override def nullSafeEval(t: Any): Any =
    TextKernels.nfcClean(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.nfcClean($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
