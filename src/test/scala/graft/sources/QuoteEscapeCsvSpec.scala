package graft.sources

import graft.SparkSpec

/** Doubled-quote escaping with a single-quote delimiter and
  * backslash-escape off — the reference's `tests/issue_519` fixture
  * (quote char `'`, fields like `''''` meaning one literal `'`).
  */
class QuoteEscapeCsvSpec extends SparkSpec {

  private val fixture =
    """'a','b'
      |'''','"'
      |'"',''''''
      |'''''','""'
      |'""','''"'''""".stripMargin

  // MySQL LOAD DATA semantics: outer quotes delimit, '' collapses to '
  private val expected = Seq(
    ("a", "b"),
    ("'", "\""),
    ("\"", "''"),
    ("''", "\"\""),
    ("\"\"", "'\"'"))

  private def dialect(sep: String) = CsvDialect(
    separator = sep, delimiter = "'", backslashEscape = false)

  private def write(dir: java.nio.file.Path, text: String): String = {
    val f = dir.resolve("issue519.t.csv")
    java.nio.file.Files.write(f, text.getBytes("UTF-8"))
    f.toString
  }

  test("spark-reader path collapses doubled quotes without backslash escapes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q519")
    val p = write(dir, fixture)
    val rows = MySqlCsv.readRaw(spark, Seq(p), Seq("a", "b"), dialect(","))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === expected)
  }

  test("tokenizer path (multi-char separator) agrees on doubled quotes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q519m")
    val p = write(dir, fixture.replace(",", "||"))
    val rows = MySqlCsv.readRaw(spark, Seq(p), Seq("a", "b"), dialect("||"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === expected)
  }
}
