package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native Catalyst expression
  * with whole-stage codegen — the canonical-form step of text dedup: a
  * precomposed "é" (U+00E9) and its decomposed twin "e"+U+0301 are
  * different byte strings (different hashes, different group keys) but the
  * same text; normalizing before fingerprinting is what makes hash-based
  * dedup see through encoding provenance.
  *
  * Spark ships no NFC function, so this is tier (b) of the build guide's
  * preference order: a tiny codegen'd `Expression` (one static JDK call,
  * `java.text.Normalizer`) rather than a UDF with its serialization
  * boundary. The DuckDB oracle twin is the built-in `nfc_normalize`; both
  * implement Unicode Standard Annex #15 NFC, so outputs are byte-identical.
  *
  * The JDK call allocates a String round-trip per row; for the ASCII-heavy
  * common case `Normalizer.isNormalized` (quick-check property) makes the
  * skip path allocation-free — the same fast path ICU uses.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by eval and codegen (identical semantics). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object TextFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  def nfc_normalize(s: Column): Column = column(NfcNormalize(expression(s)))
}
