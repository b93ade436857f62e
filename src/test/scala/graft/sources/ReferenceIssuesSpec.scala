package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.schema.MysqlDdl

/** The reference's issue-repro tests replayed over its OWN data files
  * (`tests/issue_282|410|519`): dump escapes incl. \Z → 0x1A, wide
  * 40-char CSV headers, and quote-doubling with backslash escapes
  * off. Each assertion is the hex/value the reference's run.sh
  * check_contains pins.
  */
class ReferenceIssuesSpec extends SparkSpec {

  private val base = Paths.get("/root/reference/tests")

  private def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  test("issue_282: dump special chars and \\Z parse to the pinned bytes") {
    val d = base.resolve("issue_282/data")
    assume(Files.exists(d), "reference tests not present")
    val schema = MysqlDdl.parse(
      Files.readString(d.resolve("issue282.t_access3-schema.sql")))
    val got = DumpSource.read(spark,
        Seq(d.resolve("issue282.t_access3.sql").toString), schema)
      .collect().map(r => hexOf(r.getString(0))).sorted
    // run.sh: hex(accessKey) ∈ {405026464C415348534841, 1A}
    assert(got === Array("1A", "405026464C415348534841"))
  }

  test("issue_410: 40-char headers map values by position") {
    val d = base.resolve("issue_410/data")
    assume(Files.exists(d), "reference tests not present")
    val schema = MysqlDdl.parse(
      Files.readString(d.resolve("issue410.row_flow_d-schema.sql")))
    val dialect = CsvDialect(header = true)
    val rows = MySqlCsv.read(spark,
      Seq(d.resolve("issue410.row_flow_d.0.csv").toString), schema, dialect)
    val r = rows.collect()
    assert(r.length === 1)
    val row = r.head
    // run.sh pins: A-column → 'A', the 39-char Y column → 'Y', Z → 'Z'
    assert(row.getAs[String](
      "A123456789012345678901234567890123456789") === "A")
    assert(row.getAs[String](
      "Y12345678901234567890123456789012345678") === "Y")
    assert(row.getAs[String]("Z") === "Z")
  }

  test("issue_519: doubled single-quote delimiters with backslash escapes off") {
    val d = base.resolve("issue_519/data")
    assume(Files.exists(d), "reference tests not present")
    val schema = MysqlDdl.parse(
      Files.readString(d.resolve("issue519.t-schema.sql")))
    val dialect = CsvDialect(separator = ",", delimiter = "'",
      header = true, backslashEscape = false)
    val rows = MySqlCsv.read(spark,
        Seq(d.resolve("issue519.t.csv").toString), schema, dialect)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // run.sh: WHERE a = '''' (i.e. a is one quote char) → b = '"'
    assert(rows.collect { case ("'", b) => b }.toSeq === Seq("\""))
    // run.sh: WHERE b = 0x222722272727272722 → hex(a) = 2227272727222722
    val byB = rows.collect { case (a, b)
      if hexOf(b) == "222722272727272722" => hexOf(a) }
    assert(byB.toSeq === Seq("2227272727222722"))
  }
}
