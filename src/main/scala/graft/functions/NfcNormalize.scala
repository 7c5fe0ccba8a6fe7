package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) of a string —
  * the first pass of any crawl-cleanup pipeline (mojibake from mixed
  * NFC/NFD sources makes byte-identical dedup miss visually-identical
  * text, and tokenizers treat "e"+U+0301 and "é" as different tokens).
  *
  * Spark has no normalization builtin and a Scala UDF would pay
  * serialization on every row, so this is a native expression with
  * codegen. Two allocation-free fast paths cover the overwhelming
  * majority of crawl text:
  *  - pure-ASCII rows (numBytes == numChars) return the input
  *    reference untouched — NFC is the identity on ASCII;
  *  - already-normalized non-ASCII rows (`Normalizer.isNormalized`,
  *    a scan without building the result) also return the input.
  * Only genuinely decomposed rows pay the String round-trip.
  *
  * Nulls propagate (NullIntolerant via UnaryExpression's default
  * nullSafeEval path).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static worker shared by eval and codegen. */
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: every byte is one char iff all ASCII, and NFC
    // is the identity there — no String materialization at all
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
