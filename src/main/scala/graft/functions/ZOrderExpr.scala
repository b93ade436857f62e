package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) bit interleave kernel. `spread32` spaces the low
  * 32 bits of x into the even bit positions of a long (the classic
  * mask-shift cascade); `interleave` merges two spread values so the
  * result orders points along the Z space-filling curve.
  */
object ZOrder {

  /** Low 32 bits of x spread to even bit positions. */
  def spread32(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleaved bits: a in even positions, b in odd. */
  def interleave(a: Long, b: Long): Long = spread32(a) | (spread32(b) << 1)
}

/** Z-order clustering key as a native codegen'd expression.
  *
  * Sorting/range-partitioning data by `zorder2(a, b)` co-locates rows
  * that are close in BOTH dimensions, so parquet min/max (or range-file
  * bounds, [[graft.sink.SortedParquetSink]]) prune selective predicates
  * on EITHER column — the multi-dimensional generalization of the
  * reference's single-key sorted SST layout
  * (`lightning/backend/local.go` sorted-ingest contract). A
  * lexicographic sort on (a, b) clusters only the leading column;
  * the Z curve gives both columns ~half the key's bits.
  *
  * Both inputs take the low 32 bits (int columns fit untruncated;
  * negative values order by their two's-complement low word —
  * acceptable for the synthetic-key/size/bucket columns this targets).
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == IntegerType || e.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires INT/BIGINT inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def asLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l.longValue
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrder.interleave((long)$a, (long)$b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Column wrapper: `zorder2(a, b)`. */
  def zorder2(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(ZOrder2(shims.expression(a), shims.expression(b)))
  }
}
