package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI flag grammar: Go-flag spellings, inline `=`, repeatable -f,
  * unknown flags loud.
  */
class MainArgsSpec extends AnyFunSuite {

  test("value flags take the next token or inline =") {
    val m = Main.parseArgs(Array("--config", "a.toml", "-d=/dumps",
      "--checksum", "off"))
    assert(m("--config") === Seq("a.toml"))
    assert(m("-d") === Seq("/dumps"))
    assert(m("--checksum") === Seq("off"))
  }

  test("single and double dashes are interchangeable; -c aliases") {
    val m = Main.parseArgs(Array("-config", "x.toml", "--d", "/src"))
    assert(m("--config") === Seq("x.toml"))
    assert(m("-d") === Seq("/src"))
    val c = Main.parseArgs(Array("-c", "y.toml"))
    assert(c("-c") === Seq("y.toml"))
  }

  test("boolean flags: bare = true, inline value honored") {
    val m = Main.parseArgs(Array("--server-mode", "--no-schema=false"))
    assert(m("--server-mode") === Seq("true"))
    assert(m("--no-schema") === Seq("false"))
  }

  test("-f repeats and keeps order") {
    val m = Main.parseArgs(Array("-f", "app.*", "-f", "!app.tmp_*"))
    assert(m("-f") === Seq("app.*", "!app.tmp_*"))
  }

  test("unknown flags and missing values fail loudly") {
    intercept[RuntimeException](Main.parseArgs(Array("--frobnicate", "x")))
    intercept[IllegalArgumentException](Main.parseArgs(Array("--config")))
    intercept[IllegalArgumentException](Main.parseArgs(Array("stray")))
  }
}
