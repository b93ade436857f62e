package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Crc64Expr, MysqlAes, QuantDot, ScriptCounts, ZOrder2}

/** SparkSessionExtensions hook: makes graft's custom Catalyst
  * expressions available to plain SQL. Activate with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `.withExtensions(new GraftExtensions)` on the session builder;
  * after that `SELECT crc64(CAST(x AS BINARY))` works anywhere SQL
  * does — the registered function is the same codegen'd expression the
  * DataFrame API uses, not a UDF shim.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** The (identifier, info, builder) triples this extension injects —
    * also usable directly against a session's FunctionRegistry.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("crc64"),
        new ExpressionInfo(classOf[Crc64Expr].getName, "crc64"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "crc64 takes exactly one argument")
          Crc64Expr(children.head)
        }),
      (
        FunctionIdentifier("quant_dot"),
        new ExpressionInfo(classOf[QuantDot].getName, "quant_dot"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "quant_dot takes exactly two arguments")
          QuantDot(children.head, children(1))
        }),
      (
        FunctionIdentifier("zorder2"),
        new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "zorder2 takes exactly two arguments")
          ZOrder2(children.head, children(1))
        }),
      (
        FunctionIdentifier("script_counts"),
        new ExpressionInfo(classOf[ScriptCounts].getName, "script_counts"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "script_counts takes exactly one argument")
          ScriptCounts(children.head)
        }),
      (
        FunctionIdentifier("mysql_aes_encrypt"),
        new ExpressionInfo(classOf[MysqlAes].getName, "mysql_aes_encrypt"),
        (children: Seq[Expression]) => {
          require(children.size == 4,
            "mysql_aes_encrypt takes (input, key, mode, iv)")
          MysqlAes(children(0), children(1), children(2), children(3),
            encrypt = true)
        }),
      (
        FunctionIdentifier("mysql_aes_decrypt"),
        new ExpressionInfo(classOf[MysqlAes].getName, "mysql_aes_decrypt"),
        (children: Seq[Expression]) => {
          require(children.size == 4,
            "mysql_aes_decrypt takes (input, key, mode, iv)")
          MysqlAes(children(0), children(1), children(2), children(3),
            encrypt = false)
        }))
}
