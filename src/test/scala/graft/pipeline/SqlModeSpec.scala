package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/sqlmode` replayed over its own data dir under
  * BOTH sql modes (run.sh:17-60): `off.toml` (non-strict →
  * MySQL-lenient coercions) must land the exact clamped/truncated/
  * normalized values its check_contains lines pin, and `on.toml`
  * (STRICT_TRANS_TABLES) must fail the import on row 1's column `a`
  * (integer 9 into TIMESTAMP — the reference greps for
  * `colName=a … val=9` in the error log).
  *
  * One documented deviation: MySQL's zero date `0000-00-00 00:00:00`
  * has no representation in Spark's proleptic calendar, so every value
  * the reference pins as a zero date is asserted NULL here (the
  * engine's zero-date contract, README).
  */
class SqlModeSpec extends SparkSpec {

  private val src = "/root/reference/tests/sqlmode"

  /** The reference toml (sql-mode only) completed with the source /
    * target sections the reference passes via CLI/env.
    */
  private def loadCfg(toml: String, out: String): Ingest.Config = {
    val text = Files.readString(Paths.get(s"$src/$toml")) +
      s"""
         |[tikv-importer]
         |sorted-kv-dir = '$out'
         |[mydumper]
         |data-source-dir = '$src/data'
         |""".stripMargin
    TomlConfig.load(text).config
  }

  private lazy val off: String = {
    assume(Files.exists(Paths.get(src)), "reference tests not present")
    val out = Files.createTempDirectory("graft_sqlmode_off").toString
    val cfg = loadCfg("off.toml", out)
    assert(cfg.lenientCasts, "non-strict sql-mode maps to lenient casts")
    assert(!cfg.strictMode)
    val reports = Ingest.run(spark, cfg)
    assert(reports.forall(_.checksumOk))
    out
  }

  test("off.toml: lenient coercions land every run.sh pin") {
    val rows = spark.read.parquet(s"$off/sqlmodedb.t")
      .select(col("id"),
        date_format(col("a"), "yyyy-MM-dd HH:mm:ss").as("a"),
        col("b"), lower(hex(col("c"))).as("c"), col("d"))
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getInt(2), r.getString(3), r.getString(4))))
      .toMap
    assert(rows.size === 5)
    // run.sh id=1: a zero date (→ NULL), b 128→127, c 'too long'→'t'
    // (hex 74), d 'x,y,z' has an invalid member → ''
    assert(rows(1) === ((null, 127, "74", "")))
    // id=2: a '2000-00-00…' zero date, b −99999→−128, c '🤩' truncates
    // to its first byte in a latin1 column (hex F0), d numeric 3 →
    // bitmask 'x,y'
    assert(rows(2) === ((null, -128, "f0", "x,y")))
    // id=3: a '9999-12-31…' beyond TIMESTAMP range → zero date,
    // b 'NaN'→0, c x'99' raw byte, d 'x+y' invalid → ''
    assert(rows(3) === ((null, 0, "99", "")))
    // id=4: all valid; b 99.999 rounds to 100, c '' stays empty,
    // d dedupes+canonicalizes to 'x,y'
    assert(rows(4) === (("2000-01-01 00:00:00", 100, "", "x,y")))
    // id=5: NULLs into NOT NULL columns → implicit defaults
    // (zero date → NULL, 0, '', '')
    assert(rows(5) === ((null, 0, "", "")))
  }

  test("on.toml: strict mode fails the import naming column a, value 9") {
    assume(Files.exists(Paths.get(src)), "reference tests not present")
    val out = Files.createTempDirectory("graft_sqlmode_on").toString
    val cfg = loadCfg("on.toml", out)
    assert(cfg.strictMode, "STRICT_TRANS_TABLES maps to strict mode")
    val e = intercept[Exception] { Ingest.run(spark, cfg) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val all = msgs(e).mkString("\n")
    assert(all.contains("column a"), s"error names the column: $all")
    assert(all.contains("'9'"), s"error carries the value: $all")
  }
}
