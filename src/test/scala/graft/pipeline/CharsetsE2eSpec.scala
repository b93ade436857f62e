package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/character_sets` replayed over its own data
  * dirs: GB18030 and UTF-8 schema files with Chinese identifiers,
  * charset auto-detection, explicit-charset mismatch failing loudly,
  * and the binary (don't-decode) mode's mojibake'd-but-consistent
  * column names — each sum is the run.sh-pinned value.
  */
class CharsetsE2eSpec extends SparkSpec {

  private val base = Paths.get("/root/reference/tests/character_sets")

  private def imp(dir: String, charset: String): String = {
    val out = Files.createTempDirectory(s"graft_cs_${dir}_$charset").toString
    val reports = Ingest.run(spark, Ingest.Config(
      base.resolve(dir).toString, out, charset = charset))
    assert(reports.forall(_.checksumOk))
    out
  }

  test("gb18030 schema decodes under auto and explicit gb18030") {
    assume(Files.exists(base), "reference tests not present")
    Seq("auto", "gb18030").foreach { cs =>
      val out = imp("gb18030", cs)
      val df = spark.read.parquet(s"$out/charsets.gb18030")
      assert(df.columns.toSeq === Seq("主键"), s"charset=$cs")
      assert(df.agg(sum(col("主键"))).collect()(0).getAs[Number](0)
        .longValue === 267L, s"charset=$cs")
    }
  }

  test("utf8mb4 schema decodes under auto and explicit utf8mb4") {
    assume(Files.exists(base), "reference tests not present")
    Seq("auto", "utf8mb4").foreach { cs =>
      val out = imp("utf8mb4", cs)
      val df = spark.read.parquet(s"$out/charsets.utf8mb4")
      assert(df.columns.toSeq === Seq("主键"), s"charset=$cs")
      assert(df.agg(sum(col("主键"))).collect()(0).getAs[Number](0)
        .longValue === 1119L, s"charset=$cs")
    }
  }

  test("mixed-charset source fails under every decoding charset") {
    // the fixture mixes a UTF-8 identifier with a GB18030 comment:
    // any real decode either errors or eats the closing backquote, so
    // the reference expects FAILURE for auto/gb18030/utf8mb4
    // (run.sh run_lightning_expecting_fail ×3) — ours fails loudly at
    // DDL parse or decode, never imports garbage silently
    assume(Files.exists(base), "reference tests not present")
    Seq("auto", "gb18030", "utf8mb4").foreach { cs =>
      val out = Files.createTempDirectory(s"graft_cs_mixed_$cs").toString
      intercept[Exception] {
        Ingest.run(spark, Ingest.Config(
          base.resolve("mixed").toString, out, charset = cs))
      }
    }
  }

  test("mixed-charset source imports under binary; pinned sum") {
    assume(Files.exists(base), "reference tests not present")
    val out = imp("mixed", "binary")
    val df = spark.read.parquet(s"$out/charsets.mixed")
    // binary preserves bytes: the UTF-8 identifier surfaces as its
    // latin1 reading in our byte-faithful contract (the reference
    // POSTs the raw bytes to MySQL, which re-reads them as utf8)
    val name = new String("唯一键".getBytes("UTF-8"), "ISO-8859-1")
    // unique key only — no integer handle, so the _tidb_rowid
    // pseudo-column rides along
    assert(df.columns.toSeq === Seq(name, "_tidb_rowid"))
    assert(df.agg(sum(col(s"`$name`"))).collect()(0).getAs[Number](0)
      .longValue === 5291L)
  }

  test("explicit utf8mb4 against gb18030 bytes fails loudly") {
    assume(Files.exists(base), "reference tests not present")
    val out = Files.createTempDirectory("graft_cs_fail").toString
    val e = intercept[Exception] {
      Ingest.run(spark, Ingest.Config(
        base.resolve("gb18030").toString, out, charset = "utf8mb4"))
    }
    assert(e.getMessage != null && e.getMessage.contains("utf8mb4"))
  }

  test("data files decode leniently: a malformed byte does not abort") {
    // SCHEMA decode is strict (reference errors), but a DATA file with
    // one invalid sequence imports with the replacement char — the
    // reference's data-invalid-char-replace behavior; aborting a
    // whole-table import on one byte would be a regression vs upstream
    val root = Files.createTempDirectory("graft_cs_lenient")
    val src = root.resolve("src"); Files.createDirectories(src)
    Files.writeString(src.resolve("d.t-schema.sql"),
      "CREATE TABLE t (id int NOT NULL, s varchar(10), PRIMARY KEY (id));")
    val bytes = "insert into t values (1, 'a".getBytes("GB18030") ++
      Array(0xFF.toByte) ++ "b'), (2, 'ok');".getBytes("GB18030")
    Files.write(src.resolve("d.t.0001.sql"), bytes)
    val out = root.resolve("out").toString
    val reports = Ingest.run(spark, Ingest.Config(
      src.toString, out, charset = "gb18030"))
    assert(reports.head.nRows === 2L && reports.head.checksumOk)
    val rows = spark.read.parquet(s"$out/d.t").orderBy("id").collect()
      .map(_.getString(1))
    assert(rows(0).contains('�'), s"replacement char expected: ${rows(0)}")
    assert(rows(1) === "ok")
  }

  test("binary mode: gb18030 bytes survive undecoded (mojibake name)") {
    assume(Files.exists(base), "reference tests not present")
    val out = imp("gb18030", "binary")
    val df = spark.read.parquet(s"$out/charsets.gb18030")
    // run.sh: the column surfaces as the latin1 reading of the
    // gb18030 bytes — and the data still sums
    val mojibake = new String(
      "主键".getBytes("GB18030"), "ISO-8859-1")
    assert(df.columns.toSeq === Seq(mojibake))
    assert(df.agg(sum(col(s"`$mojibake`"))).collect()(0).getAs[Number](0)
      .longValue === 267L)
  }
}
