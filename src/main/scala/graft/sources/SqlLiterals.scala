package graft.sources

/** MySQL literal escaping/unescaping (SURVEY T8/T9).
  *
  * `unescape` mirrors the reference's dump-parser string handling
  * (reference `lightning/mydump/parser.go:270-316`): backslash escapes
  * `\0 \b \n \r \t \Z \\ \' \"` plus doubled-quote collapse.
  * `escape`/`literal` is the sink-side emitter used to build INSERT
  * statements (reference `lightning/backend/tidb.go:122-239`).
  * Pure byte/char-level functions — safe inside executor tasks.
  */
object SqlLiterals {

  /** Unescape the *contents* of a quoted literal (quotes already
    * stripped), for the given quote char.
    */
  def unescape(s: String, quote: Char): String = {
    if (s.indexOf('\\') < 0 && s.indexOf(quote) < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '0' => sb += '\u0000'
          case 'b' => sb += '\b'
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case 't' => sb += '\t'
          case 'Z' => sb += '\u001A'
          case other => sb += other // includes \\ \' \" and pass-through
        }
        i += 2
      } else if (c == quote && i + 1 < s.length && s.charAt(i + 1) == quote) {
        sb += quote; i += 2 // doubled quote
      } else {
        sb += c; i += 1
      }
    }
    sb.toString
  }

  /** Escape a string for inclusion in a single-quoted SQL literal. */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\u0000' => sb ++= "\\0"
        case '\b' => sb ++= "\\b"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case '\u001A' => sb ++= "\\Z"
        case '\\' => sb ++= "\\\\"
        case '\'' => sb ++= "\\'"
        case c => sb += c
      }
      i += 1
    }
    sb.toString
  }

  private val hexDigits = "0123456789ABCDEF".toCharArray

  /** Render one value as a MySQL literal (NULL / number / 0x-hex blob /
    * quoted string), the datum→SQL-text direction of the tidb backend.
    */
  def literal(v: Any): String = v match {
    case null => "NULL"
    case b: Array[Byte] =>
      if (b.isEmpty) "''"
      else {
        val sb = new StringBuilder(2 + b.length * 2)
        sb ++= "0x"
        b.foreach { x => sb += hexDigits((x >> 4) & 0xF); sb += hexDigits(x & 0xF) }
        sb.toString
      }
    case s: String => "'" + escape(s) + "'"
    case b: Boolean => if (b) "1" else "0"
    case t: java.sql.Timestamp => "'" + t.toInstant.toString + "'"
    case d: java.sql.Date => "'" + d.toString + "'"
    case n => n.toString // numeric types round-trip via toString
  }
}
