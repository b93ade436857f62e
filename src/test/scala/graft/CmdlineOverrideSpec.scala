package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.Ingest

/** The reference's `tests/cmdline_override` replayed: its config file
  * carries deliberately-junk values for every overridable field, the
  * command line (the reference's exact flag vector, connection flags
  * included) overrides them, and the import must land run.sh's pin
  * (`a: 15`). Connection flags have no Spark analog — they must be
  * ACCEPTED (a reference invocation runs unchanged) and reported as
  * ignored, never dropped silently.
  */
class CmdlineOverrideSpec extends SparkSpec {

  private val src = Paths.get("/root/reference/tests/cmdline_override")

  test("CLI overrides junk config values; reference flags accepted; a=15") {
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory("graft_cmdline_out").toString
    // run.sh's invocation verbatim, plus the output target our engine
    // requires in place of the reference's implicit cluster target
    val r = Main.resolve(Array(
      "--config", src.resolve("config.toml").toString,
      "-L", "info",
      "--log-file", "/tmp/graft_cmdline.log",
      "--tidb-host", "127.0.0.1",
      "--tidb-port", "4000",
      "--tidb-user", "root",
      "--tidb-status", "10080",
      "--pd-urls", "127.0.0.1:2379",
      "-d", src.resolve("data").toString,
      "--importer", "127.0.0.1:8808",
      "--sorted-kv-dir", out))
    // -d wins over the file's junk data-source-dir
    assert(r.cfg.sourceDir === src.resolve("data").toString)
    assert(r.cfg.targetDir === out)
    // junk config keys with no analog AND the connection flags surface
    // in the ignored report
    assert(r.ignored.exists(_.contains("tidb.host")), r.ignored)
    assert(r.ignored.exists(_.contains("flag --tidb-host")), r.ignored)
    assert(r.ignored.exists(_.contains("flag --importer")), r.ignored)
    val reports = Ingest.run(spark, r.cfg)
    assert(reports.forall(_.checksumOk))
    // run.sh pin: SELECT * FROM cmdline_override.t → a: 15
    val rows = spark.read.parquet(s"$out/cmdline_override.t").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(15))
  }
}
