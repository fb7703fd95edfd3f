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

/** `graft_damerau(a, b)` — unrestricted Damerau–Levenshtein edit
  * distance (insert / delete / substitute / transpose-adjacent, the
  * Lowrance–Wagner dictionary algorithm — NOT the weaker
  * optimal-string-alignment variant, which forbids editing a
  * transposed substring again: OSA gives "CA"→"ABC" = 3, full DL = 2)
  * as a native codegen'd expression. Spark ships only plain
  * `levenshtein`; transposition-aware distance is the one typo model
  * record-linkage actually wants ("recieve"/"receive" is 1 edit, not
  * 2), and a Scala UDF here would sit exactly in the hottest pair-loop
  * of a canopy query.
  *
  * Semantics are BYTE-oriented over the UTF-8 encoding — deliberately
  * matching DuckDB's `damerau_levenshtein` ('über'→'uber' = 2 there:
  * one multi-byte char is one substitution plus one deletion), so the
  * q278 oracle checks this expression value-for-value, engine vs
  * engine. On ASCII text bytes and characters coincide. Working on raw
  * bytes also means no String materialization and a flat 256-entry
  * last-seen table instead of a per-row hash map.
  *
  * The O(|a|·|b|) matrix is the algorithm's intrinsic cost: inputs are
  * capped at [[DamerauLevenshteinExpr.MaxBytes]] bytes per side (a
  * ~4 MB int matrix per row at the cap — already generous for the
  * bounded keys this operator is for) and the expression fails LOUDLY
  * beyond it: a silent tens-of-MB per-row allocation on full documents
  * is precisely the degradation this engine refuses. Callers window
  * with `substring` first. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_damerau needs string inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshteinExpr.distance(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.DamerauLevenshteinExpr.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_damerau"
}

object DamerauLevenshteinExpr {
  /** Loud per-side input bound (bytes): beyond this the O(n·m) matrix
    * is a per-row memory bomb, not an edit distance (1026² ints ≈ 4 MB
    * per row at the cap; 32 concurrent tasks ≈ 135 MB transient). */
  val MaxBytes = 1024

  /** Lowrance–Wagner full Damerau–Levenshtein over UTF-8 bytes.
    * Static so generated Java calls it directly (same pattern as
    * [[NfcNormalizeExpr.normalize]]). */
  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val n = ua.numBytes
    val m = ub.numBytes
    if (n > MaxBytes || m > MaxBytes)
      throw new IllegalArgumentException(
        s"graft_damerau input exceeds $MaxBytes bytes ($n / $m): the " +
          "O(n*m) matrix does not belong on unbounded text — window the " +
          "inputs with substring() first")
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // (n+2) x (m+2) matrix, flattened; row/col 0 is the inf sentinel
    // rank the transposition term falls back to when a byte was never
    // seen (da/db = 0 maps there).
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= m) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new Array[Int](256) // last row where each byte occurred in a
    i = 1
    while (i <= n) {
      var db = 0 // last column in THIS row where the bytes matched
      val ai = ua.getByte(i - 1) & 0xff
      j = 1
      while (j <= m) {
        val bj = ub.getByte(j - 1) & 0xff
        val k = da(bj)
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        var mn = d(i * w + j) + cost // substitution / match
        val ins = d((i + 1) * w + j) + 1
        if (ins < mn) mn = ins
        val del = d(i * w + j + 1) + 1
        if (del < mn) mn = del
        // transpose the (k, l) match pair with this one, deleting the
        // i-k-1 / j-l-1 bytes between them
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        if (tra < mn) mn = tra
        d((i + 1) * w + j + 1) = mn
        j += 1
      }
      da(ai) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }
}
