package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class MySqlCsvSpec extends AnyFunSuite {

  test("multi-char separator split with quoted fields") {
    val fields = MySqlCsv.splitLine("""1|+|"a|+|b"|+|\N|+|plain""", "|+|", '"', backslashEscape = true)
    assert(fields.toSeq === Seq("1", "\"a|+|b\"", "\\N", "plain"))
  }

  test("stripQuotes unescapes the quoted body") {
    assert(MySqlCsv.stripQuotes("\"a\\nb\"", '"', esc = true) === "a\nb")
    assert(MySqlCsv.stripQuotes("\"say \"\"hi\"\"\"", '"', esc = true) === "say \"hi\"")
    assert(MySqlCsv.stripQuotes("bare", '"', esc = true) === "bare")
  }

  test("escaped quote inside quoted field stays inside the field") {
    val fields = MySqlCsv.splitLine(""""a\"x"||b""", "||", '"', backslashEscape = true)
    assert(fields.toSeq === Seq("\"a\\\"x\"", "b"))
  }
}
