package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a static helper the generated code
  * calls directly (the JaroWinklerImpl shape: one static call keeps the
  * expression inside whole-stage codegen, no boxing/virtual dispatch).
  *
  * Fast path: `Normalizer.isNormalized` is a scan without allocation,
  * and real-world corpus text is overwhelmingly already NFC — those
  * rows return the INPUT UTF8String untouched (zero copies). Only
  * denormalized rows pay the String decode → normalize → re-encode.
  *
  * Semantics are the Unicode standard's canonical composition; DuckDB's
  * `nfc_normalize` (utf8proc) is the independent oracle spelling —
  * both implement UAX #15 NFC, bit-identical on the canonically-stable
  * sequences the gate exercises (stability is guaranteed by Unicode's
  * normalization stability policy for all assigned code points).
  */
object UnicodeNfcImpl {

  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

/** Codegen'd NFC normalization over a string column — the first scrub
  * of any multilingual corpus build (canonically-equivalent byte
  * sequences must hash/dedup/join identically; un-normalized text makes
  * exact dedup silently miss duplicates). Null-in null-out.
  */
case class UnicodeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.sql}"
      )
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UnicodeNfcImpl.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNfcImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc_normalize"
}
