package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact-integer dot product of two numeric arrays under floor(x·10⁶)
  * quantization, as a native codegen'd expression:
  *
  *   Σᵢ floor(aᵢ·10⁶) · floor(bᵢ·10⁶)   (int64 math)
  *
  * Semantically identical to the `zip_with` + `aggregate` composition
  * it replaces (null element or length mismatch → NULL, empty → 0),
  * but those are `CodegenFallback` higher-order functions — per-element
  * interpreted lambdas with boxed accumulators. This is the inner loop
  * of every ANN / embedding operator (64 multiply-adds per row per
  * plane), so it runs as a primitive `long` loop inside whole-stage
  * codegen instead. At corpus scale the dot product dominates the scan,
  * which makes this the single hottest expression in the library.
  */
case class QuantDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quant_dot"

  /** Nullable even when both children are non-nullable: a length
    * mismatch or a null ELEMENT yields NULL. Without this override the
    * default (children-derived) nullability declares the expression
    * non-null, and nullSafeCodeGen then renders `ev.isNull` as the
    * literal `false` — the generated `false = true;` fails Janino
    * compilation and silently falls back to interpreted execution.
    */
  override def nullable: Boolean = true

  private def elemOf(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private val okElems: Set[DataType] =
    Set(FloatType, DoubleType, LongType, IntegerType, ShortType, ByteType)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if okElems(lt) && okElems(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"quant_dot requires two numeric arrays, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def quantAt(a: ArrayData, i: Int, t: DataType): Long = {
    val d = t match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case LongType => a.getLong(i).toDouble
      case IntegerType => a.getInt(i).toDouble
      case ShortType => a.getShort(i).toDouble
      case ByteType => a.getByte(i).toDouble
    }
    math.floor(d * 1000000d).toLong
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (lt, rt) = (elemOf(left), elemOf(right))
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += quantAt(a, i, lt) * quantAt(b, i, rt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val lv = CodeGenerator.getValue(a, elemOf(left), i)
      val rv = CodeGenerator.getValue(b, elemOf(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((long) java.lang.Math.floor(((double) $lv) * 1000000.0))
         |          * ((long) java.lang.Math.floor(((double) $rv) * 1000000.0));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantDot =
    copy(left = newLeft, right = newRight)
}

object QuantDot {
  /** Column wrapper: `quantDot(arrA, arrB)`. */
  def quantDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(QuantDot(shims.expression(a), shims.expression(b)))
  }
}
