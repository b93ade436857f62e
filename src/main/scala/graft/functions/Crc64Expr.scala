package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** CRC-64/XZ of a binary column as a native Catalyst expression.
  *
  * `doGenCode` emits a direct call to the static table-driven kernel
  * ([[graft.verify.Crc64]]), so the hash runs inside whole-stage
  * codegen — no ScalaUDF boxing, no ScalaAggregator serialization on
  * the per-row hot path. Combined with the builtin `bit_xor`/`count`/
  * `sum` aggregates this makes the whole checksum triple (reference
  * `lightning/verification/checksum.go:27-93`) a fully codegen'd,
  * map-side-combining aggregation.
  */
case class Crc64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "crc64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"crc64 requires BINARY input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    graft.verify.Crc64.checksum(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.verify.Crc64.checksum($c)")

  override protected def withNewChildInternal(newChild: Expression): Crc64Expr =
    copy(child = newChild)
}

object Crc64Expr {
  /** Column wrapper: `crc64(binaryCol)`. */
  def crc64(c: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(Crc64Expr(shims.expression(c)))
  }
}
