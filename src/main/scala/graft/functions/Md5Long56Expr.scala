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

  /** First `hexChars` hex digits of the digest as a long — the
    * generalized [[long56]] (`hexChars = 14` reproduces it bit for
    * bit, spec-pinned); numerically identical to DuckDB's
    * `CAST('0x' || substr(md5(x), 1, hexChars) AS BIGINT)`.
    * `hexChars ≤ 15` keeps the value positive in a signed 64-bit on
    * both engines — the corpus-derived simhash band widths live in
    * that range ([[graft.operators.DedupQueries]]).
    */
  def longHex(bytes: Array[Byte], hexChars: Int): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = h(i >> 1) & 0xFF
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xF)
      i += 1
    }
    v
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

/** Width-parameterized sibling of [[Md5Long56]] for the
  * corpus-derived simhash band widths: same digest-bytes → long
  * kernel, the hex-digit count baked into the generated code as a
  * literal (no per-row width dispatch).
  */
case class Md5LongHex(child: Expression, hexChars: Int)
    extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be 1..15 (signed-64 positivity), got $hexChars")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long_hex"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long_hex requires BINARY input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5.longHex(input.asInstanceOf[Array[Byte]], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5.longHex($c, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): Md5LongHex =
    copy(child = newChild)
}

object Md5LongHex {
  /** Column wrapper: `md5LongHex(binaryCol, hexChars)`. */
  def md5LongHex(c: Column, hexChars: Int): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(Md5LongHex(shims.expression(c), hexChars))
  }
}
