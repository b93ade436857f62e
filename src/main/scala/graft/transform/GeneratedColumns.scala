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

  /** The target-session variables that change generated-column bytes —
    * the reference retrieves these from the cluster precisely because
    * the KV encode depends on them (`defaultImportantVariables`,
    * `lightning/restore/tidb.go:49-57`; `tests/generated_columns/
    * run.sh` SETs time_zone and block_encryption_mode before
    * importing). Defaults are the reference's fallbacks. `timeZone`
    * "SYSTEM" keeps Spark's session rendering; any explicit offset/
    * zone makes `from_unixtime` render in it (sessions here pin UTC,
    * so the shift is exactly MySQL's).
    */
  case class SessionVars(
      timeZone: String = "SYSTEM",
      blockEncryptionMode: String = "aes-128-ecb")

  /** MySQL → Spark SQL function/operator rewrites. Most of the
    * reference's gencol surface (sha1, pow, repeat, unhex, hex,
    * from_unixtime, aes_encrypt — SURVEY §2.8) parses unchanged; the
    * exceptions are rewritten here.
    */
  def translate(mysqlExpr: String): String = translate(mysqlExpr, SessionVars())

  def translate(mysqlExpr: String, vars: SessionVars): String = {
    var e = mysqlExpr
      .replace("`", "")        // identifier quoting
      .replaceAll("(?i)\\bdiv\\b", "div") // integer division keyword exists in Spark
      // MySQL week(d [, mode]) → Spark weekofyear(d) (ISO week; the
      // reference pins the mode via the default_week_format sysvar,
      // `lightning/restore/tidb.go:54`)
      .replaceAll("(?i)\\bweek\\s*\\(", "weekofyear(")
      // alias spellings with direct Spark twins
      .replaceAll("(?i)\\bucase\\s*\\(", "upper(")
      .replaceAll("(?i)\\blcase\\s*\\(", "lower(")
      .replaceAll("(?i)\\bmid\\s*\\(", "substring(")
    e = rewriteCall(e, "json_object", inner => s"to_json(map($inner))")
    e = rewriteCall(e, "json_quote", inner => s"to_json($inner)")
    // MySQL date_format/str_to_date use %-tokens — convert the (literal)
    // format argument to a Catalyst datetime pattern
    e = rewriteCall(e, "date_format", inner => {
      val args = splitArgs(inner).map(_.trim)
      literalOf(args.last) match {
        case Some(f) if args.length == 2 =>
          s"date_format(${args.head}, '${sqlQuote(convertFormat(f))}')"
        case _ => s"date_format($inner)"
      }
    })
    e = rewriteCall(e, "str_to_date", inner => {
      val args = splitArgs(inner).map(_.trim)
      literalOf(args.last) match {
        case Some(f) if args.length == 2 =>
          s"to_timestamp(${args.head}, '${sqlQuote(convertFormat(f))}')"
        case _ => s"str_to_date($inner)" // unsupported shape — let it fail loudly
      }
    })
    // to_days counts from year 0 (to_days('0001-01-01') = 366); Spark's
    // proleptic calendar starts at 0001-01-01
    e = rewriteCall(e, "to_days",
      inner => s"(datediff(($inner), date'0001-01-01') + 366)")
    e = rewriteCall(e, "oct", inner => s"conv(($inner), 10, 8)")
    // MySQL AES: XOR-folded key, raw-ciphertext CBC with the caller's
    // IV, mode from the block_encryption_mode sysvar — none of which
    // Spark's builtin aes_encrypt reproduces (it demands exact-length
    // keys and prepends its own IV). [[graft.functions.MysqlAes]] is
    // the byte-faithful expression; ECB modes ignore the IV argument.
    // Encrypt input passes through its string form (MySQL's
    // string-context coercion: DECIMAL 1234.5678 encrypts the bytes of
    // '1234.5678'); decrypt input is already binary and stays raw.
    // ECB ignores the init_vector argument entirely (MySQL warns and
    // proceeds — even a NULL iv must not null the result), so the IV
    // is dropped AT TRANSLATE TIME for ECB modes; the expression's
    // null-intolerant eval then can't see a NULL it shouldn't act on.
    def aesIv(a: Seq[String]): String =
      if (vars.blockEncryptionMode.toLowerCase.endsWith("-ecb")) "X''"
      else if (a.size >= 3) a(2) else "X''"
    e = rewriteCall(e, "aes_encrypt", inner => {
      val a = splitArgs(inner).map(_.trim)
      s"mysql_aes_encrypt(cast((${a(0)}) as string), ${a(1)}, " +
        s"'${vars.blockEncryptionMode}', ${aesIv(a)})"
    })
    e = rewriteCall(e, "aes_decrypt", inner => {
      val a = splitArgs(inner).map(_.trim)
      s"mysql_aes_decrypt(${a(0)}, ${a(1)}, '${vars.blockEncryptionMode}', ${aesIv(a)})"
    })
    // MySQL from_unixtime renders in the SESSION time zone and its
    // 2-arg form takes a %-token format; when the target's time_zone
    // is pinned (run.sh SETs -08:00), shift the instant explicitly —
    // sessions here render in UTC, so the from_utc_timestamp shift
    // shows exactly the target zone's wall clock, MySQL's
    // '1969-12-31 16:00:01' for from_unixtime(1). The 2-arg form gets
    // the same shift plus the %-token conversion (a non-literal format
    // fails loudly, the str_to_date convention — silently rendering in
    // the wrong zone with an unconverted format would be worse).
    if (vars.timeZone != "SYSTEM")
      e = rewriteCall(e, "from_unixtime", inner => {
        val a = splitArgs(inner).map(_.trim)
        val ts = s"from_utc_timestamp(timestamp_seconds(${a.head}), " +
          s"'${vars.timeZone}')"
        a match {
          case Seq(_) => s"date_format($ts, 'yyyy-MM-dd HH:mm:ss')"
          case Seq(_, f) => literalOf(f) match {
            case Some(fmt) =>
              s"date_format($ts, '${sqlQuote(convertFormat(fmt))}')"
            case None => throw new IllegalArgumentException(
              s"from_unixtime with a non-literal format under a pinned " +
                s"time_zone is not translatable: from_unixtime($inner)")
          }
          case _ => s"from_unixtime($inner)" // unknown arity: loud at analysis
        }
      })
    // truncate-toward-zero at d decimals. floor-of-abs, NOT a bigint
    // cast: engines disagree on double→int cast rounding (DuckDB
    // rounds, Spark truncates), while floor() is exact everywhere
    e = rewriteCall(e, "truncate", inner => {
      splitArgs(inner).map(_.trim) match {
        case Seq(x, d) =>
          s"(sign($x) * floor(abs($x) * pow(10, $d)) / pow(10, $d))"
        case _ => s"truncate($inner)"
      }
    })
    e
  }

  /** Split `args` of a call at top-level commas (quote- and
    * paren-aware).
    */
  private[transform] def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var q: Char = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else c match {
        case '\'' | '"' => q = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** The payload of a simple quoted literal, if `s` is one. */
  private def literalOf(s: String): Option[String] =
    if (s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head)
      Some(s.substring(1, s.length - 1))
    else None

  /** MySQL %-token → Catalyst datetime pattern letters. */
  private val mysqlFmtTokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'c' -> "M", 'd' -> "dd",
    'e' -> "d", 'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'l' -> "h",
    'i' -> "mm", 's' -> "ss", 'S' -> "ss", 'f' -> "SSSSSS", 'j' -> "DDD",
    'W' -> "EEEE", 'a' -> "EEE", 'M' -> "MMMM", 'b' -> "MMM", 'p' -> "a",
    'T' -> "HH:mm:ss", 'r' -> "hh:mm:ss a")

  private[transform] def convertFormat(f: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < f.length) {
      val c = f.charAt(i)
      if (c == '%' && i + 1 < f.length) {
        val t = f.charAt(i + 1)
        if (t == '%') sb.append('%')
        else sb.append(mysqlFmtTokens.getOrElse(t, throw new IllegalArgumentException(
          s"unsupported MySQL date format token %$t in '$f'")))
        i += 2
      } else {
        // pattern letters are reserved — literal alphabetics must be
        // quoted; a literal quote char is '' at the PATTERN layer
        // (DateTimeFormatter's own escape — SQL-literal escaping is
        // [[sqlQuote]]'s job at the embed site, never mixed in here)
        if (c.isLetter) sb.append('\'').append(c).append('\'')
        else if (c == '\'') sb.append("''")
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Escape a converted pattern for embedding inside a single-quoted
    * Spark SQL string literal (the pattern's own quote chars would
    * otherwise terminate the literal).
    */
  private def sqlQuote(pattern: String): String =
    pattern.replace("\\", "\\\\").replace("'", "\\'")

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

  def column(mysqlExpr: String, vars: SessionVars): Column =
    expr(translate(mysqlExpr, vars))

  /** Evaluate all generated columns of `schema` over `df`, in declared
    * column order, casting each to its target type.
    */
  def apply(df: DataFrame, schema: TableSchema): DataFrame =
    apply(df, schema, SessionVars())

  def apply(df: DataFrame, schema: TableSchema, vars: SessionVars): DataFrame =
    schema.columns.foldLeft(df) { (acc, c) =>
      c.generated match {
        case Some(g) =>
          val v = column(g.expr, vars).cast(c.sparkType)
          // a generated TIME column stores MySQL-normalized, exactly
          // like a data column through the cast path ('1:2:3' →
          // '01:02:03', tests/generated_columns' duration pin)
          val stored =
            if (c.mysqlType.takeWhile(_ != '(') == "time")
              RowTransform.normalizeTime(v)
            else v
          acc.withColumn(c.name, stored)
        case None => acc
      }
    }
}
