package graft.transform

import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.{Column, DataFrame}

import graft.schema.TableSchema

/** Generated-column evaluation (SURVEY T7). The reference rewrites the
  * DDL's generation expression into an evaluable tree and runs it per
  * row in column-offset order (`lightning/backend/sql2kv.go:106-166,
  * 357-372`). Here the MySQL expression text is translated to Spark SQL
  * and evaluated as a Catalyst expression — fully codegen'd, no UDFs —
  * with chained generated columns handled by ordered `withColumn`s
  * (each sees the columns generated before it, like the reference's
  * offset-ordered evaluation).
  */
object GeneratedColumns {

  /** MySQL → Spark SQL function/operator rewrites. Most of the
    * reference's gencol surface (sha1, pow, repeat, unhex, hex,
    * from_unixtime, aes_encrypt — SURVEY §2.8) parses unchanged; the
    * exceptions are rewritten here.
    */
  def translate(mysqlExpr: String): String = {
    var e = mysqlExpr
      .replace("`", "")        // identifier quoting
      .replaceAll("(?i)\\bdiv\\b", "div") // integer division keyword exists in Spark
      // MySQL week(d [, mode]) → Spark weekofyear(d) (ISO week; the
      // reference pins the mode via the default_week_format sysvar,
      // `lightning/restore/tidb.go:54`)
      .replaceAll("(?i)\\bweek\\s*\\(", "weekofyear(")
    e = rewriteCall(e, "json_object", inner => s"to_json(map($inner))")
    e = rewriteCall(e, "json_quote", inner => s"to_json($inner)")
    e
  }

  /** Rewrite every `fn(args)` call via `body(args)`, keeping balanced
    * parens (a plain regex can't close the extra paren).
    */
  private def rewriteCall(s: String, fn: String, body: String => String): String = {
    val lower = s.toLowerCase
    var from = 0
    while (from < s.length) {
      val idx = lower.indexOf(fn + "(", from)
      if (idx < 0) return s
      if (idx > 0 && Character.isLetterOrDigit(s.charAt(idx - 1))) {
        from = idx + 1 // substring of a longer identifier — skip
      } else {
        val open = idx + fn.length
        var depth = 0
        var i = open
        while (i < s.length) {
          s.charAt(i) match {
            case '(' => depth += 1
            case ')' =>
              depth -= 1
              if (depth == 0) {
                val inner = s.substring(open + 1, i)
                return s.substring(0, idx) +
                  body(rewriteCall(inner, fn, body)) +
                  rewriteCall(s.substring(i + 1), fn, body)
              }
            case _ =>
          }
          i += 1
        }
        return s // unbalanced — leave as-is
      }
    }
    s
  }

  def column(mysqlExpr: String): Column = expr(translate(mysqlExpr))

  /** Evaluate all generated columns of `schema` over `df`, in declared
    * column order, casting each to its target type.
    */
  def apply(df: DataFrame, schema: TableSchema): DataFrame =
    schema.columns.foldLeft(df) { (acc, c) =>
      c.generated match {
        case Some(g) => acc.withColumn(c.name, column(g.expr).cast(c.sparkType))
        case None => acc
      }
    }
}
