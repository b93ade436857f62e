package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.discover.TableRoute

/** TOML-subset config loader: key mapping, value grammar, sizes,
  * PostOpLevel tri-state, ignored-key accounting — and a parse of the
  * reference's own annotated sample file when present.
  */
class TomlConfigSpec extends AnyFunSuite {

  private val minimal =
    """[mydumper]
      |data-source-dir = "/src"
      |[tikv-importer]
      |sorted-kv-dir = "/out"
      |""".stripMargin

  test("minimal config maps source and target; defaults hold") {
    val l = TomlConfig.load(minimal)
    assert(l.config.sourceDir === "/src")
    assert(l.config.targetDir === "/out")
    assert(l.config.filters === Nil)
    assert(l.config.chunkBytes === (256L << 20))
    // absent max-error → 0: the reference aborts on bad rows (the
    // programmatic Config default stays permissive for library users)
    assert(l.config.maxError === 0L)
    assert(l.config.analyze, "post-restore.analyze defaults to required")
    assert(!l.serverMode)
    assert(l.checksum === "required")
    assert(l.ignored.isEmpty)
  }

  test("missing required keys fail loudly, naming the key") {
    val e1 = intercept[IllegalArgumentException](TomlConfig.load("x = 1"))
    assert(e1.getMessage.contains("data-source-dir"))
    val e2 = intercept[IllegalArgumentException](
      TomlConfig.load("[mydumper]\ndata-source-dir = '/s'"))
    assert(e2.getMessage.contains("sorted-kv-dir"))
  }

  test("full surface: filters, routes, csv dialect, sizes, levels") {
    val l = TomlConfig.load(
      """[lightning]
        |table-concurrency = 6
        |max-error = 100
        |server-mode = true
        |status-addr = ":8289"
        |[checkpoint]
        |enable = true
        |driver = "file"
        |dsn = "/tmp/ckpt"
        |[tikv-importer]
        |backend = "local"
        |sorted-kv-dir = '/out'
        |[mydumper]
        |data-source-dir = '/src'
        |no-schema = false
        |character-set = "gb18030"
        |strict-format = true
        |max-region-size = '64KiB'
        |filter = ['*.*', '!mysql.*',
        |          '!sys.*']
        |[mydumper.csv]
        |separator = '|+|'
        |delimiter = ''
        |header = true
        |not-null = false
        |null = 'NULL'
        |backslash-escape = false
        |trim-last-separator = true
        |[tidb]
        |host = "127.0.0.1"
        |sql-mode = "STRICT_TRANS_TABLES,NO_ENGINE_SUBSTITUTION"
        |[post-restore]
        |checksum = "optional"
        |analyze = false
        |[[routes]]
        |schema-pattern = "routes_a*"
        |table-pattern = "t*"
        |target-schema = "routes_b"
        |target-table = "u"
        |""".stripMargin)
    val c = l.config
    assert(c.tableConcurrency === 6)
    assert(c.maxError === 100L)
    assert(c.stateDir === Some("/tmp/ckpt"))
    assert(c.charset === "gb18030")
    assert(c.strictFormat)
    assert(c.chunkBytes === (64L << 10))
    assert(c.filters === Seq("*.*", "!mysql.*", "!sys.*"))
    assert(c.csvDialect.separator === "|+|")
    assert(c.csvDialect.delimiter === "")
    assert(c.csvDialect.header)
    assert(c.csvDialect.nullValue === "NULL")
    assert(!c.csvDialect.backslashEscape)
    assert(c.csvDialect.trimLastSep)
    assert(c.strictMode, "STRICT sql-mode maps to strictMode")
    assert(!c.analyze, "legacy boolean false = off")
    assert(l.checksum === "optional")
    assert(l.serverMode)
    assert(l.statusAddr === Some(":8289"))
    assert(c.routes === Seq(TableRoute("routes_a*", "t*", "routes_b", "u")))
    // tidb.host has no Spark analog — must be reported, not dropped
    assert(l.ignored.contains("tidb.host"))
    // backend IS consumed now (tidb → on-duplicate default, local → none)
    assert(!l.ignored.contains("tikv-importer.backend"))
    assert(c.onDuplicate === None, "backend=local keeps the policy off")
  }

  test("value grammar: escapes, underscores, comments inside strings") {
    val p = TomlConfig.parse(
      """a = "tab\there # not a comment"
        |b = 67_108_864  # real comment
        |c = 0.75
        |d = 'literal\n'
        |""".stripMargin)
    assert(p.scalars("a") === TomlConfig.VStr("tab\there # not a comment"))
    assert(p.scalars("b") === TomlConfig.VInt(67108864L))
    assert(p.scalars("c") === TomlConfig.VDouble(0.75))
    // single quotes are literal: no escape processing
    assert(p.scalars("d") === TomlConfig.VStr("literal\\n"))
  }

  test("sizes parse with binary multipliers; junk rejects loudly") {
    import TomlConfig.{parseSize, VInt, VStr}
    assert(parseSize(VStr("256MiB")) === (256L << 20))
    assert(parseSize(VStr("64KiB")) === (64L << 10))
    assert(parseSize(VStr("100GiB")) === (100L << 30))
    assert(parseSize(VStr("128")) === 128L)
    assert(parseSize(VInt(96)) === 96L)
    assert(parseSize(VStr("128 MB")) === (128L << 20))
    intercept[IllegalArgumentException](parseSize(VStr("fast")))
  }

  test("mysql checkpoint driver rejects loudly (no MySQL here)") {
    val e = intercept[IllegalArgumentException](TomlConfig.load(
      minimal + "\n[checkpoint]\nenable = true\ndriver = \"mysql\""))
    assert(e.getMessage.contains("mysql"))
  }

  test("the reference's own annotated sample file parses and maps") {
    val p = java.nio.file.Paths.get("/root/reference/tidb-lightning.toml")
    assume(java.nio.file.Files.exists(p), "reference sample not present")
    // the sample uses the importer backend (sorted-kv-dir commented
    // out), so the target comes from the CLI override — the same
    // shape `graft.Main --config sample.toml --target-dir /out` runs
    val l = TomlConfig.loadFile(p.toString, Some("/out"))
    assert(l.config.targetDir === "/out")
    assert(l.config.sourceDir === "/tmp/export-20180328-200751")
    assert(l.config.filters.head === "*.*")
    assert(l.config.csvDialect.header)
    assert(l.config.tableConcurrency === 6)
    assert(!l.serverMode)
    assert(l.statusAddr === Some(":8289"))
    assert(l.checksum === "required")
    assert(l.config.analyze, "analyze = \"optional\" is still on")
  }

  test("[[mydumper.files]] maps to fileRules; defaults toggle honored") {
    val refConfig = java.nio.file.Paths.get(
      "/root/reference/tests/file_routing/config.toml")
    assume(java.nio.file.Files.exists(refConfig), "reference tests not present")
    val text = java.nio.file.Files.readString(refConfig) +
      "\n[mydumper]\ndata-source-dir='/s'\n[tikv-importer]\nsorted-kv-dir='/o'\n"
    val l = TomlConfig.load(text)
    assert(l.config.fileRules.size === 6)
    assert(l.config.defaultFileRules === Some(false))
    assert(l.config.fileRules(3) === graft.discover.FileRouter.FileRule(
      None, Some("ff/test.SQL"), "fr", "tbl", "sql"))
    assert(!l.ignored.exists(_.contains("mydumper.files")))
  }

  test("[black-white-list] sections parse from the reference's configs") {
    import graft.discover.{BWItem, BWRules}
    val dir = java.nio.file.Paths.get("/root/reference/tests/black-white-list")
    assume(java.nio.file.Files.exists(dir), "reference tests not present")
    def loadWith(name: String) = TomlConfig.load(
      java.nio.file.Files.readString(dir.resolve(name)) + minimal)
    assert(loadWith("firstdb-only.toml").config.bwList ===
      Some(BWRules(doDBs = Seq("~^f"))))
    assert(loadWith("even-table-only.toml").config.bwList ===
      Some(BWRules(
        doTables = Seq(BWItem("~.", "second"), BWItem("seconddb", "fourth")),
        ignoreTables = Seq(BWItem("firstdb", "~.")))))
    assert(TomlConfig.load(minimal).config.bwList === None)
  }

  test("unused config keys surface like the reference's warning") {
    // tests/unused_config_keys: typo-1 (empty section), typo-2
    // (unknown key in a known section), [[typo-3]] must all be
    // reported; a known-but-empty section must not
    val l = TomlConfig.load(
      """[typo-1]
        |[lightning]
        |typo-2 = "unused test"
        |[[typo-3]]
        |[post-restore]
        |""".stripMargin + minimal)
    assert(l.ignored.contains("[typo-1]"))
    assert(l.ignored.contains("lightning.typo-2"))
    assert(l.ignored.contains("[[typo-3]]"))
    assert(!l.ignored.exists(_.contains("post-restore")))
    assert(!l.ignored.exists(_.contains("typo-4")))
  }

  test("server task bodies: TOML accepted alongside flat JSON") {
    val cfg = Server.parseTask(minimal)
    assert(cfg.sourceDir === "/src" && cfg.targetDir === "/out")
    val json = Server.parseTask("""{"sourceDir":"/a","targetDir":"/b"}""")
    assert(json.sourceDir === "/a" && json.targetDir === "/b")
  }
}
