package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[NfcNormalize]]: Unicode NFC (canonical composition).
  * The quick-check fast path skips the allocation entirely for
  * already-composed text — the overwhelmingly common case — so the
  * per-row cost on clean corpora is one scan, no copy.
  */
object Nfc {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step a dedup/fingerprint pipeline needs BEFORE
  * hashing (a decomposed `é` (e + U+0301) and the composed `é` are
  * different bytes, so every fingerprint in the repo would treat two
  * renderings of the same text as distinct documents). Spark ships no
  * Unicode normalizer; DuckDB's `nfc_normalize` mirrors this exactly,
  * so the oracle replays it bit for bit.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Nfc.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Nfc.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column wrapper: `nfcNormalize(stringCol)`. */
  def nfcNormalize(c: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(NfcNormalize(shims.expression(c)))
  }
}
