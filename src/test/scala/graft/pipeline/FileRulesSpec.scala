package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** End-to-end import over a NON-MyDumper source layout routed entirely
  * by [[mydumper.files]] custom rules (reference
  * `tests/file_routing/run.sh` drives the same shape) — the whole
  * config arriving as TOML text, defaults off.
  */
class FileRulesSpec extends SparkSpec {

  test("symlinked data files import (reference tests/source_linkfile)") {
    val root = java.nio.file.Files.createTempDirectory("graft_link")
    val raw = root.resolve("raw"); java.nio.file.Files.createDirectories(raw)
    val src = root.resolve("src"); java.nio.file.Files.createDirectories(src)
    java.nio.file.Files.writeString(raw.resolve("l.t-schema.sql"),
      "CREATE TABLE t (id int NOT NULL, PRIMARY KEY (id));")
    java.nio.file.Files.writeString(raw.resolve("l.t.0001.csv"), "1\n2\n3\n")
    // the source dir holds only symlinks, like the reference's
    // `ln -s` loop
    java.nio.file.Files.list(raw).forEach(p =>
      java.nio.file.Files.createSymbolicLink(src.resolve(p.getFileName), p))
    val out = root.resolve("out").toString
    val reports = Ingest.run(spark, Ingest.Config(src.toString, out))
    assert(reports.map(r => (r.table, r.nRows, r.checksumOk)) ===
      Seq(("t", 3L, true)))
  }

  test("custom file rules drive a full import from TOML config") {
    val root = Files.createTempDirectory("graft_frules")
    val src = root.resolve("src"); Files.createDirectories(src.resolve("zoo"))
    Files.writeString(src.resolve("zoo/schema.sql"), "CREATE DATABASE zoo;")
    Files.writeString(src.resolve("zoo/pets-table.sql"),
      "CREATE TABLE pets (id int NOT NULL, name varchar(20), PRIMARY KEY (id));")
    // data files named nothing like MyDumper: pets1.csv, pets2.csv
    Files.writeString(src.resolve("zoo/pets1.csv"), "1,\"rex\"\n2,\"misu\"\n")
    Files.writeString(src.resolve("zoo/pets2.csv"), "3,\\N\n")
    // a file no rule matches must be ignored silently (defaults off)
    Files.writeString(src.resolve("zoo/pets-backup.dump"), "junk")
    val out = root.resolve("out").toString
    val toml =
      s"""[mydumper]
         |data-source-dir = '$src'
         |default-file-rules = false
         |[mydumper.csv]
         |header = false
         |[tikv-importer]
         |sorted-kv-dir = '$out'
         |[post-restore]
         |analyze = "off"
         |[[mydumper.files]]
         |pattern = "(?i)^(?:[^/]*/)*([a-z0-9]+)/schema\\\\.sql$$"
         |schema = "$$1"
         |type = "schema-schema"
         |[[mydumper.files]]
         |pattern = "(?i)^(?:[^/]*/)*([a-z0-9]+)/([a-z0-9]+)-table\\\\.sql$$"
         |schema = "$$1"
         |table = "$$2"
         |type = "table-schema"
         |[[mydumper.files]]
         |pattern = "(?i)^(?:[^/]*/)*([^./]+)/([a-z]+)([0-9]*)\\\\.csv$$"
         |schema = "$$1"
         |table = "$$2"
         |type = "csv"
         |key = "$$3"
         |""".stripMargin
    val loaded = TomlConfig.load(toml)
    assert(loaded.config.fileRules.size === 3)
    val reports = Ingest.run(spark, loaded.config)
    assert(reports.map(_.table) === Seq("pets"))
    assert(reports.head.nRows === 3L)
    assert(reports.head.checksumOk)
    val rows = spark.read.parquet(s"$out/zoo.pets")
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq === Seq((1, "rex"), (2, "misu"), (3, null)))
  }
}
