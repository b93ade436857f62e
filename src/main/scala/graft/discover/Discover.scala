package graft.discover

import java.util.Locale

/** Source-file discovery and routing (SURVEY §2.1 S1–S4).
  *
  * The reference walks a dump directory and classifies every file by
  * MyDumper naming rules, then filters and re-routes (schema, table)
  * pairs (reference `lightning/mydump/router.go:110-181`,
  * `loader.go:286-416`). Here the same logic is pure driver-side Scala:
  * it runs once over the file listing (thousands of entries, never the
  * data itself), so it costs nothing at 100 TB — the output simply
  * decides which files each per-table DataFrame reads.
  */
object FileKind extends Enumeration {
  val SchemaSchema, TableSchema, ViewSchema, Sql, Csv, Parquet, Ignore = Value
}

case class RouteResult(
    database: String,
    table: String,
    kind: FileKind.Value,
    compression: Option[String],
    sortKey: String)

/** MyDumper default naming rules, mirroring the reference's built-in
  * router templates (`lightning/mydump/router.go:110-122`):
  *   {db}-schema-create.sql            → database schema
  *   {db}.{table}-schema.sql           → table schema
  *   {db}.{table}-schema-view.sql      → view schema
  *   {db}.{table}(.{key})?.{sql|csv|parquet}[.{gz|lz4|zstd|xz}] → data
  * Custom regex rules (the `[[mydumper.files]]` config surface,
  * `tests/file_routing/`) can be prepended.
  */
class FileRouter(customRules: Seq[FileRouter.Rule] = Nil,
    useDefaults: Boolean = true) {
  import FileRouter._

  private val rules: Seq[Rule] =
    customRules ++ (if (useDefaults) defaultRules else Nil)

  def route(relPath: String): Option[RouteResult] = {
    val name = relPath // routing is over the path relative to the source root
    rules.view.flatMap(r => r.lift(name)).headOption
  }
}

object FileRouter {
  type Rule = PartialFunction[String, RouteResult]

  private val DbSchema = """(?i)^(?:.*/)?([^/.]+)-schema-create\.sql$""".r
  private val ViewSchema = """(?i)^(?:.*/)?([^/]+)\.(.+?)-schema-view\.sql$""".r
  private val TblSchema = """(?i)^(?:.*/)?([^/]+)\.(.+?)-schema\.sql$""".r
  private val Data =
    """(?i)^(?:.*/)?([^/.]+)\.(.+?)(?:\.([0-9]+))?\.(sql|csv|parquet)(?:\.(gz|gzip|bz2|lz4|zstd|zst|xz))?$""".r

  /** Compression codecs the Spark/Hadoop runtime actually decodes end
    * to end (the reference REJECTS every compressed source,
    * `lightning/mydump/router.go:256-273` — gz/bz2 support exceeds it).
    * lz4 is excluded deliberately: Hadoop's Lz4Codec reads its own
    * block framing, not the lz4 CLI frame format, so a CLI-written
    * `.lz4` would fail mid-read with a baffling error; zstd needs a
    * native libhadoop this image lacks; xz has no Hadoop codec at all.
    * Such files still ROUTE (the name classifies), but discovery fails
    * loudly naming the file — see [[requireReadable]].
    */
  val SupportedCompression: Set[String] = Set("gz", "gzip", "bz2")

  /** Fail discovery with an explicit message if `r` names a codec the
    * runtime cannot decode — at listing time, not hours into the read.
    */
  def requireReadable(path: String, r: RouteResult): Unit =
    r.compression.filterNot(SupportedCompression).foreach { c =>
      throw new IllegalArgumentException(
        s"unsupported compression '.$c' on source file $path — " +
          s"supported: ${SupportedCompression.toSeq.sorted.mkString(", ")}, " +
          "or decompress the file before import")
    }

  /** One `[[mydumper.files]]` rule (reference `router.go:183-260` +
    * `config.go` FileRouteRule): a regex `pattern` (or literal `path`)
    * over the source-relative file path, plus `$`-templates for every
    * routed field. Exactly one of pattern/path must be set.
    */
  case class FileRule(
      pattern: Option[String],
      path: Option[String],
      schema: String,
      table: String = "",
      typ: String = "",
      key: String = "",
      compression: String = "")

  /** Compile a [[FileRule]] to a router [[Rule]]. Pattern syntax is
    * Go-regexp-shaped: `(?P<name>…)` named groups translate to Java's
    * `(?<name>…)`, matching is unanchored find (Go
    * FindStringSubmatchIndex). Templates expand `$$` (literal `$`),
    * `$1`/`${2}` (numbered groups), `$name`/`${name}` (named groups);
    * unmatched optional groups expand empty, like Go's Expand. A
    * template naming a group the pattern lacks, or an expanded type/
    * compression outside the reference's vocabulary, fails loudly at
    * route time — the reference's "match but invalid field" error.
    */
  def compile(rule: FileRule): Rule = {
    require(rule.pattern.isDefined != rule.path.isDefined,
      "[[mydumper.files]]: exactly one of `pattern` and `path` must be set")
    // Go group names allow chars Java rejects (underscores, digits
    // anywhere); sanitize the name in the PATTERN and remember the
    // mapping so `$schema_name` template references still resolve
    val GoGroup = """\(\?P<([^>]+)>""".r
    val nameMap = scala.collection.mutable.Map[String, String]()
    def sanitize(n: String): String = {
      val s = n.replaceAll("[^A-Za-z0-9]", "")
      val ok = if (s.isEmpty || !s.head.isLetter) "g" + s else s
      nameMap(n) = ok; ok
    }
    val (regexStr, escapeTmpl) = rule.pattern match {
      case Some(p) =>
        (GoGroup.replaceAllIn(p, m =>
          java.util.regex.Matcher.quoteReplacement(
            s"(?<${sanitize(m.group(1))}>")), (t: String) => t)
      case None =>
        (java.util.regex.Pattern.quote(rule.path.get),
          (t: String) => t.replace("$", "$$"))
    }
    val rx = java.util.regex.Pattern.compile(regexStr)
    val TmplVar = """\$(?:(\$)|([0-9]+)|([A-Za-z_][A-Za-z0-9_]*)|\{([0-9]+)\}|\{([A-Za-z_][A-Za-z0-9_]*)\})""".r
    def expand(tmplRaw: String, m: java.util.regex.Matcher): String = {
      val tmpl = escapeTmpl(tmplRaw)
      TmplVar.replaceAllIn(tmpl, mm =>
        java.util.regex.Matcher.quoteReplacement {
          if (mm.group(1) != null) "$"
          else {
            val byIdx = Option(mm.group(2)).orElse(Option(mm.group(4)))
            val byName = Option(mm.group(3)).orElse(Option(mm.group(5)))
            val g = byIdx match {
              case Some(i) => m.group(i.toInt)
              case None => // throws on unknown name — loud
                m.group(nameMap.getOrElse(byName.get, byName.get))
            }
            Option(g).getOrElse("") // unmatched optional group → empty
          }
        })
    }
    { case p if rx.matcher(p).find() =>
        val m = rx.matcher(p); m.find()
        val kind = expand(rule.typ, m).trim.toLowerCase(Locale.ROOT) match {
          case "schema-schema" => FileKind.SchemaSchema
          case "table-schema" => FileKind.TableSchema
          case "view-schema" => FileKind.ViewSchema
          case "sql" => FileKind.Sql
          case "csv" => FileKind.Csv
          case "parquet" => FileKind.Parquet
          case "ignore" => FileKind.Ignore
          case other => throw new IllegalArgumentException(
            s"[[mydumper.files]]: unknown source type '$other' for $p")
        }
        val comp = expand(rule.compression, m).trim.toLowerCase(Locale.ROOT) match {
          case "" => None
          case c @ ("gz" | "gzip" | "bz2" | "lz4" | "zstd" | "zst" | "xz") => Some(c)
          case other => throw new IllegalArgumentException(
            s"[[mydumper.files]]: invalid compression type '$other' for $p")
        }
        RouteResult(expand(rule.schema, m), expand(rule.table, m), kind,
          comp, expand(rule.key, m))
    }
  }

  val defaultRules: Seq[Rule] = Seq(
    { case DbSchema(db) => RouteResult(db, "", FileKind.SchemaSchema, None, "") },
    { case ViewSchema(db, tbl) => RouteResult(db, tbl, FileKind.ViewSchema, None, "") },
    { case TblSchema(db, tbl) => RouteResult(db, tbl, FileKind.TableSchema, None, "") },
    { case Data(db, tbl, key, ext, comp) =>
      val kind = ext.toLowerCase(Locale.ROOT) match {
        case "sql" => FileKind.Sql
        case "csv" => FileKind.Csv
        case "parquet" => FileKind.Parquet
      }
      RouteResult(db, tbl, kind, Option(comp).map(_.toLowerCase(Locale.ROOT)),
        Option(key).getOrElse(""))
    })
}

/** Allow/deny table filter (SURVEY S3): case-configurable wildcard
  * patterns `db.table` with `*`/`?` globs, last-match-wins with `!`
  * negation — the public `table-filter` semantics the reference wraps
  * (`lightning/mydump/loader.go:119-131`).
  */
class TableFilter(patterns: Seq[String], caseSensitive: Boolean = false) {

  private case class Pat(negate: Boolean, db: java.util.regex.Pattern, tbl: java.util.regex.Pattern)

  private val compiled: Seq[Pat] = patterns.map { raw0 =>
    val negate = raw0.startsWith("!")
    val raw = if (negate) raw0.substring(1) else raw0
    val parts = raw.split("\\.", 2)
    val (d, t) = if (parts.length == 2) (parts(0), parts(1)) else (parts(0), "*")
    Pat(negate, glob(d), glob(t))
  }

  private def glob(p: String): java.util.regex.Pattern = {
    val rx = "^" + p.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"
    java.util.regex.Pattern.compile(rx,
      if (caseSensitive) 0 else java.util.regex.Pattern.CASE_INSENSITIVE)
  }

  /** Last matching pattern decides (like the upstream table-filter);
    * default deny when any pattern is given, allow-all when none.
    */
  def matches(db: String, table: String): Boolean = {
    if (compiled.isEmpty) return true
    var verdict = false
    compiled.foreach { p =>
      if (p.db.matcher(db).matches() && p.tbl.matcher(table).matches())
        verdict = !p.negate
    }
    verdict
  }
}

/** One `(db-name, tbl-name)` pair in the legacy `[black-white-list]`
  * config; names starting with `~` are regexes (unanchored find, like
  * the tidb-tools filter the reference vendors).
  */
case class BWItem(db: String, tbl: String)

/** The legacy filter rules as configured (`[black-white-list]`
  * do-dbs/ignore-dbs/[[do-tables]]/[[ignore-tables]], reference
  * `tests/black-white-list` configs).
  */
case class BWRules(
    doDBs: Seq[String] = Nil,
    ignoreDBs: Seq[String] = Nil,
    doTables: Seq[BWItem] = Nil,
    ignoreTables: Seq[BWItem] = Nil)

/** The reference's legacy black-white-list filter, level by level:
  * schema level first (`do-dbs` whitelist when present, else
  * `ignore-dbs` blacklist), then table level (`do-tables` whitelist
  * when present, else `ignore-tables` blacklist). The whitelist-
  * shadows-blacklist shape at each level is pinned by the reference's
  * own expectations: `even-table-only.toml` ignores ALL of firstdb
  * yet still imports firstdb.second, because its `do-tables` match
  * wins (`tests/black-white-list/run.sh` check_even_table_only).
  */
class BWFilter(rules: BWRules, caseSensitive: Boolean = false) {

  private def matchOne(pat0: String, s0: String): Boolean = {
    val (pat, s) =
      if (caseSensitive) (pat0, s0)
      else (pat0.toLowerCase(Locale.ROOT), s0.toLowerCase(Locale.ROOT))
    if (pat.startsWith("~"))
      java.util.regex.Pattern.compile(pat.substring(1)).matcher(s).find()
    else pat == s
  }

  def matches(db: String, table: String): Boolean = {
    val dbPass =
      if (rules.doDBs.nonEmpty) rules.doDBs.exists(matchOne(_, db))
      else !rules.ignoreDBs.exists(matchOne(_, db))
    dbPass && {
      if (rules.doTables.nonEmpty)
        rules.doTables.exists(it => matchOne(it.db, db) && matchOne(it.tbl, table))
      else
        !rules.ignoreTables.exists(it => matchOne(it.db, db) && matchOne(it.tbl, table))
    }
  }
}

/** Table router (SURVEY S4): maps source (schema, table) to target
  * (schema, table) via glob patterns — N source shards mapping to one
  * target is the shard-merge case (`tests/routes/config.toml`), which
  * downstream becomes a `unionByName` of the routed DataFrames.
  */
case class TableRoute(
    schemaPattern: String,
    tablePattern: String,
    targetSchema: String,
    targetTable: String)

class TableRouter(routes: Seq[TableRoute], caseSensitive: Boolean = false) {

  private def glob(p: String) = {
    val rx = "^" + p.flatMap {
      case '*' => "(.*)"
      case '?' => "(.)"
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"
    java.util.regex.Pattern.compile(rx,
      if (caseSensitive) 0 else java.util.regex.Pattern.CASE_INSENSITIVE)
  }

  private val compiled = routes.map(r => (glob(r.schemaPattern), glob(r.tablePattern), r))

  /** First matching route wins; identity when none match. */
  def route(db: String, table: String): (String, String) =
    compiled.collectFirst {
      case (dp, tp, r) if dp.matcher(db).matches() && tp.matcher(table).matches() =>
        (r.targetSchema, r.targetTable)
    }.getOrElse((db, table))
}
