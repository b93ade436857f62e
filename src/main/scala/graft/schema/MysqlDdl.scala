package graft.schema

import org.apache.spark.sql.types._

/** One table column parsed from MySQL DDL.
  *
  * Mirrors the reference's per-column metadata surface (defaults,
  * generated expressions, auto-increment/auto-random flags — reference
  * `lightning/backend/sql2kv.go:282-386` consumes exactly these), but
  * the representation is a Spark `StructField` plus engine flags, not a
  * TiDB `model.ColumnInfo`.
  */
case class ColumnSpec(
    name: String,
    mysqlType: String,
    sparkType: DataType,
    nullable: Boolean,
    default: Option[String],
    generated: Option[GeneratedCol],
    autoIncrement: Boolean,
    unsigned: Boolean,
    enumValues: Seq[String],
    autoRandomBits: Option[Int] = None,
    charset: Option[String] = None) {
  def field: StructField = StructField(name, sparkType, nullable)

  /** Declared length for char/varchar/binary/varbinary (`varchar(25)` →
    * 25) — the truncation bound MySQL's non-strict mode applies
    * (reference `tests/sqlmode` pins `VARCHAR(1)` truncating 'too long'
    * to 't'). None for length-less types (text/blob/int display widths
    * are NOT lengths and are excluded).
    */
  def typeLength: Option[Int] = {
    val base = mysqlType.takeWhile(_ != '(')
    if (Set("char", "varchar", "binary", "varbinary")(base)) {
      val i = mysqlType.indexOf('(')
      if (i < 0) None
      else mysqlType.substring(i + 1, mysqlType.length - 1).trim match {
        case s if s.forall(_.isDigit) && s.nonEmpty => Some(s.toInt)
        case _ => None
      }
    } else None
  }
}

/** `AS (expr) STORED|VIRTUAL` generation clause. */
case class GeneratedCol(expr: String, stored: Boolean)

case class TableSchema(
    database: Option[String],
    table: String,
    columns: Seq[ColumnSpec],
    primaryKey: Seq[String],
    partitionBy: Seq[String] = Nil) {
  def struct: StructType = StructType(columns.map(_.field))
  def colNames: Seq[String] = columns.map(_.name)
}

/** Pragmatic MySQL `CREATE TABLE` parser covering the reference's
  * fixture corpus (`/root/reference/tests/[asterisk]/data/[asterisk]-schema.sql`;
  * grammar surface per SURVEY §1.2). The reference delegates to the
  * TiDB SQL parser (`lightning/restore/tidb.go:194-227`); we parse the
  * same subset directly — column defs, PRIMARY/UNIQUE/KEY entries,
  * DEFAULT, AUTO_INCREMENT, generated columns, enum/set domains —
  * and map types onto Spark's type system (SURVEY §1.2 type map).
  */
object MysqlDdl {

  def parse(ddl: String): TableSchema = {
    val noComments = stripComments(ddl)
    val m = CreateRe.findFirstMatchIn(noComments).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE TABLE statement: ${ddl.take(80)}"))
    val (db, tbl) = parseQualifiedName(m.group(1))
    val body = extractParenBody(noComments, m.end - 1)
    val entries = splitTopLevel(body, ',')
    val cols = scala.collection.mutable.ArrayBuffer[ColumnSpec]()
    var pk = Seq.empty[String]
    entries.map(_.trim).filter(_.nonEmpty).foreach { e =>
      val upper = e.toUpperCase
      if (upper.startsWith("PRIMARY KEY")) {
        pk = keyColumns(e)
      } else if (upper.matches("(?s)^(UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN|FULLTEXT)\\b.*")) {
        // secondary indexes carry no data semantics for us. \b keeps
        // column names like `key_mod` from matching the KEY keyword.
      } else {
        cols += parseColumn(e)
      }
    }
    // inline `PRIMARY KEY` on a column def: capture the (possibly
    // backquoted, possibly space-containing) name with the identifier
    // grammar — a whitespace split would truncate `my col` to "`my"
    val InlinePk = "(?isU)^((?:`(?:[^`]|``)+`)|[\\w$]+)\\s+.*PRIMARY\\s+KEY.*".r
    if (pk.isEmpty) {
      entries.map(_.trim).foreach { e =>
        if (!e.toUpperCase.startsWith("PRIMARY")) e match {
          case InlinePk(rawName) => pk = Seq(unquoteIdent(rawName))
          case _ =>
        }
      }
    }
    // table options follow the body's closing paren (body starts right
    // after the '(' at m.end - 1); PARTITION BY lives there
    val tail = noComments.substring(m.end + body.length)
    TableSchema(db, tbl, cols.toSeq, pk, partitionColumns(tail))
  }

  /** `PARTITION BY <method>(cols)` → the partition column list, the
    * key of the Spark-idiomatic analog (`tests/partitioned-table`):
    * the reference leaves row placement to the target cluster; a file
    * target's analog is a `partitionBy(key)` directory layout, which
    * gives the same effect — partition-pruned reads. Only simple
    * column lists are actionable (`HASH(a)`, `KEY(a,b)`,
    * `RANGE COLUMNS(a)`); an expression like `RANGE (YEAR(d))` has no
    * direct column analog and is ignored (harmless, as before).
    */
  private val PartitionByRe =
    """(?is)\bPARTITION\s+BY\s+(?:LINEAR\s+)?(?:RANGE|LIST|HASH|KEY)\s*(?:COLUMNS)?\s*\(([^)]*)\)""".r

  private[schema] def partitionColumns(tableOptions: String): Seq[String] =
    // LOCATE on blanked text (a `COMMENT='partition by hash(x)'` table
    // option must not fabricate a clause), EXTRACT from the raw text at
    // the same offsets — blanking is length-preserving
    PartitionByRe.findFirstMatchIn(blankStringLiterals(tableOptions)).map { pm =>
      val raw = tableOptions.substring(pm.start(1), pm.end(1))
      val idents = splitTopLevel(raw, ',')
        .map(x => unquoteIdent(x.trim)).filter(_.nonEmpty)
      if (idents.nonEmpty && idents.forall(_.matches("(?U)[\\w$]+"))) idents else Nil
    }.getOrElse(Nil)

  // (?U): \w must cover unicode identifiers — MySQL allows unquoted
  // non-ASCII table names (reference tests/exotic_filenames, 中文表)
  private val CreateRe =
    """(?isU)CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([`"\w.]+)\s*\(""".r

  /** Versioned/executable comments (`/*!50100 ... */`, TiDB
    * `/*T![flag] ... */`) are UNWRAPPED — their content is real DDL the
    * emitting server executes (TiDB ships AUTO_RANDOM this way) —
    * before plain block comments are stripped. Shared with
    * `CharsetReader.clean` so schema-file cleaning and DDL parsing
    * can't diverge.
    */
  def unwrapAndStripBlockComments(s: String): String =
    s.replaceAll("(?s)/\\*(?:!\\d*|T!\\[[\\w]*\\])(.*?)\\*/", "$1")
      .replaceAll("(?s)/\\*.*?\\*/", " ")

  private def stripComments(s: String): String =
    unwrapAndStripBlockComments(s).replaceAll("(?m)--.*$", " ")

  private def parseQualifiedName(raw: String): (Option[String], String) = {
    val parts = splitTopLevel(raw, '.').map(unquoteIdent)
    if (parts.length == 2) (Some(parts(0)), parts(1)) else (None, parts.last)
  }

  /** Strip identifier quoting, collapsing the doubled-quote escapes:
    * `` `exotic``table````name` `` names the literal
    * ``exotic`table``name`` (reference `tests/exotic_filenames`).
    */
  def unquoteIdent(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("`") && t.endsWith("`"))
      t.substring(1, t.length - 1).replace("``", "`")
    else if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t
  }

  /** Body between the CREATE TABLE '(' (at `openIdx`) and its matching ')'. */
  private def extractParenBody(s: String, openIdx: Int): String = {
    var depth = 0
    var i = openIdx
    var inStr: Char = 0
    val start = openIdx + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr != 0) {
        if (c == '\\') i += 1
        else if (c == inStr) inStr = 0
      } else c match {
        case '\'' | '"' | '`' => inStr = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return s.substring(start, i)
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parens in DDL")
  }

  /** Split on `sep` at paren/quote depth 0. */
  def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var inStr: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr != 0) {
        cur += c
        if (c == '\\' && inStr != '`') { if (i + 1 < s.length) { cur += s.charAt(i + 1); i += 1 } }
        else if (c == inStr) inStr = 0
      } else c match {
        case '\'' | '"' | '`' => inStr = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  private def keyColumns(entry: String): Seq[String] = {
    val i = entry.indexOf('(')
    if (i < 0) Seq.empty
    else splitTopLevel(entry.substring(i + 1, entry.lastIndexOf(')')), ',')
      .map(c => unquoteIdent(c.trim.replaceAll("\\(\\d+\\)$", "")))
  }

  // (?U) + the quoted alternatives: column names may be non-ASCII
  // (reference tests/character_sets `主键`), backquoted names may
  // contain spaces/punctuation, and a doubled backtick is an escaped
  // backtick inside the name — same grammar as table identifiers
  private val ColRe =
    """(?sU)^(`(?:[^`]|``)+`|"[^"]+"|[\w$]+)\s+(\w+)(\s*\([^)]*\))?(.*)$""".r

  private def parseColumn(entry: String): ColumnSpec = {
    val ColRe(rawName, rawType, rawArgs, rawRest) = entry.trim
    val name = unquoteIdent(rawName)
    val baseType = rawType.toLowerCase
    val args = Option(rawArgs).map(_.trim.stripPrefix("(").stripSuffix(")")).getOrElse("")
    val rest = Option(rawRest).getOrElse("")
    // keyword flags scan over the rest with string literals BLANKED:
    // `COMMENT 'migrated from auto_random'` or a DEFAULT containing
    // "unsigned" must not flip column semantics. DefaultRe/GenRe keep
    // the raw text (they extract literal/expression content).
    val restFlags = blankStringLiterals(rest)
    val restU = restFlags.toUpperCase
    val unsigned = restU.contains("UNSIGNED")
    val notNull = restU.contains("NOT NULL")
    val autoInc = restU.contains("AUTO_INCREMENT")
    // TiDB extension: `bigint AUTO_RANDOM[(shard_bits[, range_bits])]`,
    // default 5 shard bits (reference `tests/alter_random`,
    // `tests/auto_random_default`; two-arg form since TiDB v6.3 — the
    // range width is not needed for synthesis)
    val autoRandom = AutoRandomRe.findFirstMatchIn(restFlags)
      .map(m => Option(m.group(1)).map(_.toInt).getOrElse(5))
    // GenRe/DefaultRe LOCATE on the blanked text (so `COMMENT 'has a
    // default value'` can't fabricate clauses) but EXTRACT from the raw
    // text at the same offsets — blanking is length-preserving, so the
    // group bounds line up
    val generated = locateGenerated(restFlags).map { case (open, close) =>
      GeneratedCol(rest.substring(open + 1, close).trim, !restU.contains("VIRTUAL"))
    }
    val default = DefaultRe.findFirstMatchIn(restFlags)
      .map(d => normalizeDefault(rest.substring(d.start(1), d.end(1)).trim, baseType))
      .filter(_.toUpperCase != "NULL")
    val enumValues =
      if (baseType == "enum" || baseType == "set")
        splitTopLevel(args, ',').map(_.trim.stripPrefix("'").stripSuffix("'"))
      else Seq.empty
    // column-level `CHARSET x` / `CHARACTER SET x` (reference
    // `tests/sqlmode` `c VARCHAR(1) CHARSET latin1`). A single-byte
    // charset column is a BYTE string — TiDB stores it un-recoded, and
    // values like x'99' or a truncated UTF-8 prefix are not valid
    // UTF-8, which Spark's StringType cannot hold — so it maps to
    // BinaryType. Table-level DEFAULT CHARSET is untouched.
    val colCharset = CharsetRe.findFirstMatchIn(restFlags).map(_.group(1).toLowerCase)
    val baseSparkType = sparkType(baseType, args, unsigned)
    val effType =
      if (baseSparkType == StringType && colCharset.exists(ByteCharsets)) BinaryType
      else baseSparkType
    ColumnSpec(name, baseType + (if (args.nonEmpty) s"($args)" else ""),
      effType, nullable = !notNull,
      default, generated, autoInc, unsigned, enumValues, autoRandom, colCharset)
  }

  private val AutoRandomRe =
    """(?i)AUTO_RANDOM\s*(?:\(\s*(\d+)\s*(?:,\s*\d+\s*)?\))?""".r

  private val CharsetRe = """(?i)(?:CHARACTER\s+SET|CHARSET)\s+(\w+)""".r

  /** Charsets whose column values are raw byte strings to us (not
    * recodable to UTF-8 losslessly value-by-value).
    */
  private val ByteCharsets = Set("latin1", "binary")

  /** Replace quoted contents with spaces so keyword scans can't match
    * inside them (length-preserving). Covers string literals ('…', "…")
    * AND backtick identifiers — a column named `unsigned_raw` inside a
    * generation expression must not flip the UNSIGNED flag.
    */
  private[schema] def blankStringLiterals(s: String): String = {
    val sb = new StringBuilder(s)
    var i = 0
    var q: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) {
        if (c == '\\' && q != '`' && i + 1 < s.length) {
          sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' '); i += 1
        }
        else if (c == q) q = 0
        else sb.setCharAt(i, ' ')
      } else if (c == '\'' || c == '"' || c == '`') q = c
      i += 1
    }
    sb.toString
  }

  // `[GENERATED ALWAYS] AS (` head of a generated-column clause. The
  // expression itself is extracted by a BALANCED-PAREN scan from the
  // opening paren ([[locateGenerated]]), not a regex group: MySQL
  // accepts ANY column attributes after the closing paren, in any
  // order (STORED/VIRTUAL, UNIQUE [KEY], NOT NULL, INVISIBLE,
  // CHECK (...), COMMENT …) — a regex tail enumerating them silently
  // drops the generated clause for whichever attribute it missed, and
  // a greedy expr group mis-captures when the tail carries its own
  // parens (CHECK). The head must sit at paren depth 0 of the blanked
  // text, so an `AS (` inside a DEFAULT expression cannot match.
  private val GenHeadRe =
    """(?is)(?:\bGENERATED\s+ALWAYS\s+)?\bAS\s*\(""".r

  /** (openParenIdx, closeParenIdx) of the generated-column expression
    * in `blanked`, if the entry has one.
    */
  private def locateGenerated(blanked: String): Option[(Int, Int)] =
    GenHeadRe.findAllMatchIn(blanked).flatMap { m =>
      var depth = 0
      var i = 0
      while (i < m.start) {
        blanked.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      if (depth != 0) None
      else {
        val open = m.end - 1
        var d = 0
        var j = open
        var close = -1
        while (j < blanked.length && close < 0) {
          blanked.charAt(j) match {
            case '(' => d += 1
            case ')' => d -= 1; if (d == 0) close = j
            case _ =>
          }
          j += 1
        }
        if (close < 0) None else Some((open, close))
      }
    }.toSeq.headOption
  // the optional identifier prefix (with optional space) covers
  // introducer/typed literals (b'101', x'6869', _utf8mb4'abc',
  // _utf8mb4 'abc') — the clause LOCATES on blanked text, where the
  // bare [^\s,]+ alternative would stop at the first blanked character
  // inside the quotes and truncate the default
  private val DefaultRe =
    """(?is)DEFAULT\s+((?:[A-Za-z_]\w*\s*)?'(?:[^'\\]|\\.)*'|[^\s,]+)""".r

  private val HexLitRe = """(?is)^x'([0-9a-f]*)'$""".r

  /** Byte payload of an `x'..'` hex literal, if `v` is one. */
  def hexLiteralBytes(v: String): Option[Array[Byte]] = v match {
    case HexLitRe(hex) =>
      val h = if (hex.length % 2 == 1) "0" + hex else hex
      Some(h.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray)
    case _ => None
  }

  /** True for MySQL types whose values are raw bytes, not characters. */
  def binaryTyped(baseType: String): Boolean =
    Set("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob")
      .contains(baseType)

  /** Decode a DEFAULT literal to the plain value the default-fill
    * expression should inject: strip quotes, collapse bit/hex literals
    * to their numeric/decoded form (same token semantics as the dump
    * parser's bare-token decoding), drop charset introducers.
    *
    * Hex defaults on BINARY-typed columns keep their `x'..'` form: a
    * UTF-8 string decode is lossy for arbitrary byte sequences (0x80+
    * bytes mangle), so the byte payload is re-extracted type-aware at
    * fill time ([[hexLiteralBytes]] in RowTransform.defaultValue).
    */
  private[schema] def normalizeDefault(v: String, baseType: String = ""): String = {
    val BitRe = """(?is)^b'([01]+)'$""".r
    val IntroRe = """(?is)^_\w+\s*'((?:[^'\\]|\\.)*)'$""".r
    v match {
      case BitRe(bits) => java.lang.Long.parseLong(bits, 2).toString
      case HexLitRe(_) if binaryTyped(baseType) => v // keep bytes exact
      case HexLitRe(hex) =>
        val h = if (hex.length % 2 == 1) "0" + hex else hex
        new String(
          h.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray,
          java.nio.charset.StandardCharsets.UTF_8)
      case IntroRe(body) => graft.sources.SqlLiterals.unescape(body, '\'')
      case s if s.startsWith("'") =>
        // the quoted literal's CONTENTS: MySQL backslash escapes and
        // doubled quotes decode here, so the stored default is the
        // actual value (DEFAULT 'o\'brien' → o'brien) — and
        // [[render]]'s SqlLiterals.escape is its exact inverse
        graft.sources.SqlLiterals.unescape(
          s.stripPrefix("'").stripSuffix("'"), '\'')
      case s => s
    }
  }

  /** Inverse §1.2 map, for the export direction. Values always
    * round-trip; TYPES round-trip except that integers narrower than
    * INT widen (tinyint/smallint parse back as IntegerType, mirroring
    * the forward map) — DdlRenderSpec pins both the exact cases and
    * the documented widening.
    */
  def mysqlTypeOf(dt: DataType): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case BinaryType => "longblob"
    case DateType => "date"
    case TimestampType => "datetime(6)"
    case BooleanType => "boolean"
    case _ => "longtext"
  }

  /** TableSchema from a Spark StructType (export / no-schema targets).
    * MySQL-only attributes (defaults, generation, auto-increment) have
    * no parquet representation, so none are synthesized.
    */
  def fromStruct(db: String, table: String, st: StructType,
      primaryKey: Seq[String] = Nil): TableSchema =
    TableSchema(Some(db), table,
      st.fields.toSeq.map(f => ColumnSpec(
        f.name, mysqlTypeOf(f.dataType), f.dataType, f.nullable,
        default = None, generated = None, autoIncrement = false,
        unsigned = false, enumValues = Nil)),
      primaryKey)

  /** Inverse of [[parse]]: render a TableSchema back to MySQL
    * `CREATE TABLE` text the parser (and MyDumper consumers) read. The
    * partition method is not retained by [[parse]], so a partitioned
    * schema renders as `PARTITION BY HASH`.
    */
  def render(ts: TableSchema): String = {
    val cols = ts.columns.map { c =>
      val sb = new StringBuilder(s"  `${c.name}` ${c.mysqlType}")
      if (c.unsigned && !c.mysqlType.toUpperCase.contains("UNSIGNED"))
        sb ++= " UNSIGNED"
      if (!c.nullable) sb ++= " NOT NULL"
      c.generated.foreach(g =>
        sb ++= s" AS (${g.expr}) ${if (g.stored) "STORED" else "VIRTUAL"}")
      c.default.foreach { d =>
        if (d.equalsIgnoreCase("CURRENT_TIMESTAMP")) sb ++= " DEFAULT CURRENT_TIMESTAMP"
        // backslash convention: parse's DefaultRe/blankStringLiterals
        // read backslash escapes, not doubled quotes — render must
        // emit what parse reads or the inverse contract breaks
        else sb ++= s" DEFAULT '${graft.sources.SqlLiterals.escape(d)}'"
      }
      if (c.autoIncrement && c.autoRandomBits.isEmpty) sb ++= " AUTO_INCREMENT"
      c.autoRandomBits.foreach(b => sb ++= s" /*T![auto_rand] AUTO_RANDOM($b) */")
      sb.toString
    }
    val pk =
      if (ts.primaryKey.nonEmpty)
        Seq(s"  PRIMARY KEY (${ts.primaryKey.map(k => s"`$k`").mkString(", ")})")
      else Nil
    val name = ts.database.map(d => s"`$d`.`${ts.table}`").getOrElse(s"`${ts.table}`")
    val part =
      if (ts.partitionBy.nonEmpty)
        s"\nPARTITION BY HASH(${ts.partitionBy.map(k => s"`$k`").mkString(", ")})"
      else ""
    s"CREATE TABLE $name (\n${(cols ++ pk).mkString(",\n")}\n)$part;"
  }

  /** SURVEY §1.2 type map. */
  def sparkType(base: String, args: String, unsigned: Boolean): DataType = base match {
    case "tinyint" | "smallint" | "mediumint" | "int" | "integer" =>
      if (unsigned && (base == "int" || base == "integer")) LongType else IntegerType
    case "bigint" => if (unsigned) DecimalType(20, 0) else LongType
    case "float" => FloatType
    case "double" | "real" => DoubleType
    case "decimal" | "numeric" =>
      val ps = args.split(",").map(_.trim).filter(_.nonEmpty)
      if (ps.length == 2) DecimalType(ps(0).toInt, ps(1).toInt)
      else if (ps.length == 1) DecimalType(ps(0).toInt, 0)
      else DecimalType(10, 0)
    case "bit" => LongType // reference encodes bit as uint (sql2kv kindStr)
    case "char" | "varchar" | "tinytext" | "text" | "mediumtext" | "longtext" => StringType
    case "enum" | "set" => StringType
    case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" | "longblob" => BinaryType
    case "date" => DateType
    case "datetime" | "timestamp" => TimestampType
    case "time" => StringType // MySQL TIME = duration; kept lexical (SURVEY §1.2)
    case "year" => IntegerType
    case "json" => StringType
    case "boolean" | "bool" => BooleanType
    case other => StringType // permissive fallback, late-typed like the reference
  }
}
