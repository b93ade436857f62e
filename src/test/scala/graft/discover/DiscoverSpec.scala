package graft.discover

import org.scalatest.funsuite.AnyFunSuite

class DiscoverSpec extends AnyFunSuite {

  private val router = new FileRouter()

  test("MyDumper default naming rules") {
    assert(router.route("d-schema-create.sql").map(_.kind) === Some(FileKind.SchemaSchema))
    assert(router.route("d.t-schema.sql") ===
      Some(RouteResult("d", "t", FileKind.TableSchema, None, "")))
    assert(router.route("d.t.0007.sql") ===
      Some(RouteResult("d", "t", FileKind.Sql, None, "0007")))
    assert(router.route("nested/dir/d.t.csv.gz") ===
      Some(RouteResult("d", "t", FileKind.Csv, Some("gz"), "")))
    assert(router.route("README.md") === None)
  }

  test("dotted table names keep the last extension split") {
    // table name itself containing dots routes greedily on db prefix
    assert(router.route("db.my.table.001.parquet") ===
      Some(RouteResult("db", "my.table", FileKind.Parquet, None, "001")))
  }

  test("custom routing rules take precedence (the [[mydumper.files]] surface)") {
    val custom: FileRouter.Rule = {
      case p if p.endsWith(".dump") =>
        RouteResult("fixed", p.stripSuffix(".dump"), FileKind.Sql, None, "")
    }
    val r = new FileRouter(Seq(custom))
    assert(r.route("weird.dump") ===
      Some(RouteResult("fixed", "weird", FileKind.Sql, None, "")))
    assert(r.route("d.t.csv").map(_.kind) === Some(FileKind.Csv)) // defaults still apply
  }

  test("FileRule compile: the reference's file_routing rules route") {
    // rules verbatim from /root/reference/tests/file_routing/config.toml
    import FileRouter.FileRule
    val rules = Seq(
      FileRule(Some("""(?i)^(?:[^/]*/)*([a-z0-9]+)/schema\.sql$"""), None,
        "$1", typ = "schema-schema"),
      FileRule(Some("""(?i)^(?:[^/]*/)*([a-z0-9]+)/([a-z0-9]+)-table\.sql$"""),
        None, "$1", "$2", "table-schema"),
      FileRule(Some("""(?i)^(?:[^/]*/)*([a-z0-9]+)/([a-z0-9]+)-view\.sql$"""),
        None, "$1", "$2", "view-schema"),
      FileRule(None, Some("ff/test.SQL"), "fr", "tbl", "sql"),
      FileRule(Some("""(?i)^(?:[^/]*/)*([^./]+)/([a-z]+)[0-9]*\.(sql|csv)(?:\.([0-9]+))?$"""),
        None, "$1", "$2", "$3"),
      FileRule(Some("""(?i)^(?:[^/]*/)*([a-z]+)[0-9]*\.(sql|csv)(?:\.([0-9]+))?$"""),
        None, "fr", "$1", "$2"))
    val r = new FileRouter(rules.map(FileRouter.compile), useDefaults = false)
    assert(r.route("fr/schema.sql") ===
      Some(RouteResult("fr", "", FileKind.SchemaSchema, None, "")))
    assert(r.route("fr/tbl-table.sql") ===
      Some(RouteResult("fr", "tbl", FileKind.TableSchema, None, "")))
    assert(r.route("fr/v1-view.sql") ===
      Some(RouteResult("fr", "v1", FileKind.ViewSchema, None, "")))
    // literal-path rule, case-sensitive match, fixed fields
    assert(r.route("ff/test.SQL") ===
      Some(RouteResult("fr", "tbl", FileKind.Sql, None, "")))
    // templated type: "$3" expands to the sql/csv extension
    assert(r.route("fr/tbl01.sql") ===
      Some(RouteResult("fr", "tbl", FileKind.Sql, None, "")))
    assert(r.route("base/fr/ncd7.csv.04") ===
      Some(RouteResult("fr", "ncd", FileKind.Csv, None, "")))
    // default-file-rules = false: mydumper naming must NOT route
    assert(r.route("db.tbl.0001.csv") === None)
  }

  test("FileRule: named groups, ${} refs, unmatched optional groups") {
    val rule = FileRouter.FileRule(
      Some("""^(?P<schema>[a-z]+)/(?P<table>[a-z]+)(?:\.([0-9]+))?\.csv$"""),
      None, "${schema}", "$table", "csv", key = "$3")
    val r = new FileRouter(Seq(FileRouter.compile(rule)), useDefaults = false)
    assert(r.route("db/t.042.csv") ===
      Some(RouteResult("db", "t", FileKind.Csv, None, "042")))
    // optional group unmatched → empty key, like Go's Expand
    assert(r.route("db/t.csv") ===
      Some(RouteResult("db", "t", FileKind.Csv, None, "")))
  }

  test("FileRule: Go group names Java rejects are sanitized consistently") {
    // underscores are legal in Go group names, illegal in Java's —
    // both the pattern and the template references must keep working
    val rule = FileRouter.FileRule(
      Some("""^(?P<schema_name>[a-z]+)/(?P<table_1>[a-z]+)\.sql$"""),
      None, "${schema_name}", "$table_1", "sql")
    val r = new FileRouter(Seq(FileRouter.compile(rule)), useDefaults = false)
    assert(r.route("db/t.sql") ===
      Some(RouteResult("db", "t", FileKind.Sql, None, "")))
  }

  test("FileRule: invalid expanded type fails loudly; path rules keep $ literal") {
    val bad = FileRouter.compile(FileRouter.FileRule(
      Some("""^x\.(\w+)$"""), None, "s", "t", "$1"))
    val r = new FileRouter(Seq(bad), useDefaults = false)
    val e = intercept[IllegalArgumentException](r.route("x.weird"))
    assert(e.getMessage.contains("weird"))
    intercept[IllegalArgumentException] {
      FileRouter.compile(FileRouter.FileRule(None, None, "s"))
    }
    val lit = FileRouter.compile(FileRouter.FileRule(
      None, Some("a$b.csv"), "s$x", "t", "csv"))
    val r2 = new FileRouter(Seq(lit), useDefaults = false)
    assert(r2.route("a$b.csv") ===
      Some(RouteResult("s$x", "t", FileKind.Csv, None, "")))
  }

  test("black-white-list: the reference's own test expectations hold") {
    // tests/black-white-list/run.sh ground truth. firstdb-only.toml:
    val firstdbOnly = new BWFilter(BWRules(doDBs = Seq("~^f")))
    assert(firstdbOnly.matches("firstdb", "first"))
    assert(firstdbOnly.matches("firstdb", "second"))
    assert(!firstdbOnly.matches("seconddb", "third"))
    assert(!firstdbOnly.matches("mysql", "testtable"))
    // even-table-only.toml: ignore-tables covers ALL of firstdb, yet
    // firstdb.second imports because the do-tables whitelist shadows
    // the blacklist at the table level
    val evenOnly = new BWFilter(BWRules(
      ignoreTables = Seq(BWItem("firstdb", "~.")),
      doTables = Seq(BWItem("~.", "second"), BWItem("seconddb", "fourth"))))
    assert(!evenOnly.matches("firstdb", "first"))
    assert(evenOnly.matches("firstdb", "second"))
    assert(!evenOnly.matches("seconddb", "third"))
    assert(evenOnly.matches("seconddb", "fourth"))
    assert(!evenOnly.matches("mysql", "testtable"))
    // blacklist-only mode engages when no whitelist is present
    val ignoreOnly = new BWFilter(BWRules(
      ignoreDBs = Seq("mysql"), ignoreTables = Seq(BWItem("app", "tmp"))))
    assert(!ignoreOnly.matches("mysql", "anything"))
    assert(!ignoreOnly.matches("app", "tmp"))
    assert(ignoreOnly.matches("app", "real"))
    // case-insensitive by default, like the reference
    assert(firstdbOnly.matches("FirstDB", "FIRST"))
  }

  test("exotic filenames route (spaces, dashes, unicode)") {
    assert(router.route("middle earth.orcs.sql") ===
      Some(RouteResult("middle earth", "orcs", FileKind.Sql, None, "")))
    assert(router.route("db-1.table-2.0001.csv") ===
      Some(RouteResult("db-1", "table-2", FileKind.Csv, None, "0001")))
    assert(router.route("数据.表.parquet").map(t => (t.database, t.table)) ===
      Some(("数据", "表")))
  }

  test("unsupported codecs route but fail validation naming the file (S8)") {
    // names still classify…
    val zst = router.route("d.t.0001.csv.zst")
    assert(zst === Some(RouteResult("d", "t", FileKind.Csv, Some("zst"), "0001")))
    // …but discovery must reject them loudly, not hand Hadoop a frame
    // format it can't decode
    val e = intercept[IllegalArgumentException] {
      FileRouter.requireReadable("/src/d.t.0001.csv.zst", zst.get)
    }
    assert(e.getMessage.contains("d.t.0001.csv.zst"), e.getMessage)
    assert(e.getMessage.contains("zst"), e.getMessage)
    for (ext <- Seq("lz4", "xz", "zstd")) {
      val r = router.route(s"d.t.csv.$ext").get
      intercept[IllegalArgumentException](FileRouter.requireReadable(s"d.t.csv.$ext", r))
    }
    // supported codecs pass validation untouched
    for (ext <- Seq("gz", "gzip", "bz2")) {
      val r = router.route(s"d.t.csv.$ext").get
      FileRouter.requireReadable(s"d.t.csv.$ext", r)
    }
  }

  test("table filter: last match wins, negation, default deny") {
    val f = new TableFilter(Seq("tpch.*", "!tpch.secret*"))
    assert(f.matches("tpch", "lineitem"))
    assert(!f.matches("tpch", "secret_codes"))
    assert(!f.matches("other", "lineitem"))
    assert(new TableFilter(Nil).matches("any", "thing")) // no patterns → allow
  }

  test("table router: shard merge and identity fallback") {
    val r = new TableRouter(Seq(
      TableRoute("shard_*", "t_*", "merged", "t"),
      TableRoute("a", "b", "x", "y")))
    assert(r.route("shard_01", "t_42") === ("merged", "t"))
    assert(r.route("a", "b") === ("x", "y"))
    assert(r.route("plain", "t") === ("plain", "t"))
  }
}
