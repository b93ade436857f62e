package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Kernel for [[Md5Long56]]: first 7 bytes of the MD5 digest as a
  * big-endian long — numerically identical to parsing the first 14 hex
  * chars of the digest string (each hex pair IS a digest byte), which
  * is what the DuckDB oracles compute with
  * `CAST('0x' || substr(md5(x), 1, 14) AS BIGINT)`.
  */
object Md5 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def long56(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xFFL) << 48) | ((h(1) & 0xFFL) << 40) | ((h(2) & 0xFFL) << 32) |
      ((h(3) & 0xFFL) << 24) | ((h(4) & 0xFFL) << 16) | ((h(5) & 0xFFL) << 8) |
      (h(6) & 0xFFL)
  }
}

/** 56-bit MD5-derived hash as a native codegen'd expression. Replaces
  * the `conv(substring(md5(x), 1, 14), 16, 10)` composition — which
  * hex-encodes the digest to a 32-char string, substrings it, and
  * string-parses base-16 per row — with a direct digest-bytes → long
  * kernel. This is the per-shingle/per-token inner loop of the whole
  * dedup family (MinHash, SimHash, n-gram, fingerprints), so the
  * string churn it removes is multiplied by ~hundreds per document.
  */
case class Md5Long56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long56"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long56 requires BINARY input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5.long56(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5.long56($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long56 =
    copy(child = newChild)
}

object Md5Long56 {
  /** Column wrapper: `md5Long56(binaryCol)`. */
  def md5Long56(c: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(Md5Long56(shims.expression(c)))
  }
}
