package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[ScriptCounts]]: the drift door's per-character script
  * classification as ONE codepoint loop per row — struct(n_cp, latin,
  * cjk, cyr, digit) over the printable (cp > 32) codepoints.
  *
  * Replaces the split("")/transform(ascii)/filter HOF composition:
  * identical integers (same printable cutoff, same range tests, full
  * codepoints — an emoji counts once, matching the DuckDB oracle's
  * `unicode(text[i:i])`), but Spark's higher-order functions are
  * CodegenFallback, so the old pass paid interpreted lambda dispatch
  * plus a per-character string allocation per element per range test —
  * this is a handful of integer compares per codepoint. `other`
  * derives as n_cp − the four named counts, exactly as before.
  */
object ScriptCountsKernel {
  def counts(s: UTF8String): InternalRow = {
    val str = s.toString
    var nCp = 0L
    var latin = 0L
    var cjk = 0L
    var cyr = 0L
    var digit = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp > 32) {
        nCp += 1
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) latin += 1
        else if (cp >= 0x4E00 && cp <= 0x9FFF) cjk += 1
        else if (cp >= 0x400 && cp <= 0x4FF) cyr += 1
        else if (cp >= '0' && cp <= '9') digit += 1
      }
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](nCp, latin, cjk, cyr, digit))
  }
}

/** `script_counts(text)`: codegen'd struct(n_cp, latin, cjk, cyr,
  * digit) of a string's printable codepoints — see
  * [[ScriptCountsKernel]].
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", LongType, nullable = false),
    StructField("latin", LongType, nullable = false),
    StructField("cjk", LongType, nullable = false),
    StructField("cyr", LongType, nullable = false),
    StructField("digit", LongType, nullable = false)))
  override def prettyName: String = "script_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"script_counts requires STRING input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ScriptCountsKernel.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScriptCountsKernel.counts($c);")

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {
  /** Column wrapper. */
  def scriptCounts(text: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(ScriptCounts(shims.expression(text)))
  }
}
