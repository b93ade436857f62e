package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the parsing core: escaping must round-trip
  * for EVERY string (the dump round-trip correctness ultimately rests
  * on this), and the tokenizers must preserve field counts. The
  * generator is seeded — failures reproduce — and leans on the hostile
  * cases: control chars, quotes, backslashes, separators inside
  * quoted fields.
  */
class EscapePropertySpec extends AnyFunSuite {

  private val NUL: Char = 0
  private val SUB: Char = 26

  private val hostile =
    Array(NUL, '\b', '\n', '\r', '\t', SUB, '\\', '\'', '"', ',', '`')

  private def cases(seed: Long, n: Int = 500): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map { _ =>
        rnd.nextInt(3) match {
          case 0 => hostile(rnd.nextInt(hostile.length))
          case 1 => (32 + rnd.nextInt(95)).toChar // printable ASCII
          case _ => ('a' + rnd.nextInt(26)).toChar
        }
      }.mkString
    }
  }

  test("unescape(escape(s)) == s for arbitrary hostile strings") {
    cases(seed = 42).foreach { s =>
      assert(SqlLiterals.unescape(SqlLiterals.escape(s), '\'') === s,
        s"round-trip failed for ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
  }

  test("literal() of a string parses back through readTuple") {
    cases(seed = 7).foreach { s =>
      val tuple = s"(${SqlLiterals.literal(s)})"
      val (vals, _) = DumpSource.readTuple(tuple, 0)
      assert(vals.length === 1 && vals(0) === s,
        s"tuple round-trip failed for ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
  }

  test("csv splitLine + stripQuotes round-trips rendered fields") {
    val fieldCases = cases(seed = 99, n = 300)
    fieldCases.grouped(4).foreach { fields =>
      // render like MySqlCsv.writeRaw: quoted, backslash-escaped
      def render(s: String): String = {
        val sb = new StringBuilder
        s.foreach {
          case '\\' => sb ++= "\\\\"
          case '\n' => sb ++= "\\n"
          case '\r' => sb ++= "\\r"
          case '"' => sb ++= "\\\""
          case c => sb += c
        }
        "\"" + sb + "\""
      }
      val line = fields.map(render).mkString(",")
      val split = MySqlCsv.splitLine(line, ",", '"', backslashEscape = true)
      assert(split.length === fields.length, s"field count changed for line: $line")
      val back = split.map(f => MySqlCsv.stripQuotes(f, '"', esc = true))
      assert(back.toSeq === fields.toSeq)
    }
  }

  test("escape never emits raw line breaks or control chars") {
    cases(seed = 13).foreach { s =>
      val e = SqlLiterals.escape(s)
      assert(!e.exists(c => c == '\n' || c == '\r' || c == NUL || c == SUB))
    }
  }
}
