package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class SqlLiteralsSpec extends AnyFunSuite {

  test("escape/unescape round-trips MySQL control characters") {
    val nasty = "a\tb\nc\rd\\e'f\u0000g\u001Ah"
    assert(SqlLiterals.unescape(SqlLiterals.escape(nasty), '\'') === nasty)
  }

  test("unescape handles doubled quotes") {
    assert(SqlLiterals.unescape("it''s", '\'') === "it's")
    assert(SqlLiterals.unescape("say \"\"hi\"\"", '"') === "say \"hi\"")
  }

  test("unescape named escapes per the MySQL table") {
    assert(SqlLiterals.unescape("\\0\\b\\n\\r\\t\\Z", '\'') ===
      "\u0000\b\n\r\t\u001A")
    assert(SqlLiterals.unescape("\\q", '\'') === "q") // unknown → literal
  }

  test("literal rendering") {
    assert(SqlLiterals.literal(null) === "NULL")
    assert(SqlLiterals.literal("o'brien") === "'o\\'brien'")
    assert(SqlLiterals.literal(42L) === "42")
    assert(SqlLiterals.literal(true) === "1")
    assert(SqlLiterals.literal(Array[Byte](0x0F, -1)) === "0x0FFF")
    assert(SqlLiterals.literal(Array.emptyByteArray) === "''")
  }
}
