package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(s)` — Unicode NFC normalization as a native codegen'd
  * expression (there is no Spark built-in; a Scala UDF would break
  * whole-stage codegen in the middle of curation projections).
  *
  * Composed-form normalization is the standard first cleaning step of a
  * text pipeline: visually identical strings with different codepoint
  * sequences (e + U+0301 vs é) otherwise defeat exact dedup, span
  * fingerprints, and tokenizer merges. The fast path checks
  * `Normalizer.isNormalized` — true for virtually all real text — and
  * returns the INPUT UTF8String unchanged (zero copy, no allocation);
  * only denormalized rows pay the String round-trip.
  *
  * DuckDB's `nfc_normalize` implements the same Unicode normalization,
  * so the q119 oracle checks this expression bit-for-bit.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc needs a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NfcNormalizeExpr.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalizeExpr {
  /** Static helper shared by interpreted eval and generated code.
    * Pure-ASCII bytes are NFC by construction — that check is a byte
    * scan on the UTF8String with no String materialization, making the
    * dominant corpus path genuinely allocation-free; only non-ASCII
    * rows pay the toString + isNormalized (and, rarely, normalize). */
  def normalize(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
