package graft.sources

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Schema-file reader with charset detection (SURVEY S9): decodes
  * `*-schema.sql` bytes as UTF-8, GB18030, binary, or auto (strict
  * UTF-8 first, GB18030 fallback) — the reference's ExportStatement
  * surface (`lightning/mydump/reader.go:39-118`). Driver-side only:
  * schema files are small and few.
  */
object CharsetReader {

  /** `lenient = false` (schema files): the reference errors when the
    * file does not match the configured charset ("the schema files
    * must be encoded as UTF-8, otherwise will emit errors" — sample
    * config; `tests/character_sets` runs utf8mb4.toml against gb18030
    * data expecting failure). `lenient = true` (DATA files): the
    * reference substitutes invalid sequences with a replacement char
    * and continues — one malformed byte must not abort a whole-table
    * import. `binary` (ISO-8859-1) is total either way.
    */
  def decode(bytes: Array[Byte], charset: String = "auto",
      lenient: Boolean = false): String =
    charset.toLowerCase match {
      case "auto" =>
        strictUtf8(bytes).getOrElse(new String(bytes, Charset.forName("GB18030")))
      // every explicit charset resolves through the ONE alias table
      // (jvmName) so the schema-decode and data-tokenizer paths cannot
      // disagree on what a config value means
      case other =>
        val cs = Charset.forName(jvmName(other))
        if (cs == StandardCharsets.ISO_8859_1 || lenient) new String(bytes, cs)
        else {
          val dec = cs.newDecoder()
            .onMalformedInput(CodingErrorAction.REPORT)
            .onUnmappableCharacter(CodingErrorAction.REPORT)
          try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
          catch {
            case e: java.nio.charset.CharacterCodingException =>
              throw new IllegalArgumentException(
                s"file is not valid $other (configured character-set): $e", e)
          }
        }
    }

  /** True when `charset` is UTF-8 (or `auto`, whose DATA-path contract
    * is UTF-8 — auto-detection applies to schema files only, which are
    * small enough to buffer): those can go through Spark's native
    * UTF-8 text readers with no per-byte decode step.
    */
  def isNativeUtf8(charset: String): Boolean =
    charset.toLowerCase match {
      case "utf8" | "utf-8" | "utf8mb4" | "utf8mb3" | "auto" => true
      case _ => false
    }

  /** JVM charset name for a reference charset config value — THE alias
    * table (decode and the CSV tokenizer path both resolve through it).
    * utf8mb4/utf8mb3 are MySQL's spellings of UTF-8 (byte-identical on
    * the wire; the reference's accepted value is `utf8mb4`,
    * `lightning/mydump/reader.go:43`); `binary` maps to ISO-8859-1 (a
    * 1:1 byte→char round trip, the "don't decode" contract).
    */
  def jvmName(charset: String): String =
    charset.toLowerCase match {
      case "utf8" | "utf-8" | "utf8mb4" | "utf8mb3" | "auto" => "UTF-8"
      case "gb18030" => "GB18030"
      case "binary" => "ISO-8859-1"
      case other => Charset.forName(other).name()
    }

  /** True when a 0x0A byte in `charset`-encoded text can ONLY be the
    * newline character — the invariant byte-range chunking and raw
    * line splitting rely on. Every byte-oriented MySQL charset
    * qualifies (UTF-8/GB18030/GBK/Big5/Shift_JIS/latin1 all keep
    * 0x00-0x3F out of their multi-byte tails); UTF-16/UTF-32 do not
    * ('\n' itself is a multi-byte unit and 0x0A appears inside other
    * characters' code units).
    */
  def newlineByteSafe(charset: String): Boolean = {
    val n = jvmName(charset).toUpperCase
    !(n.contains("UTF-16") || n.contains("UTF-32"))
  }

  private def strictUtf8(bytes: Array[Byte]): Option[String] = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** Read + decode a schema file, stripping SQL comments and joining
    * statements (the reference strips comments the same way before
    * executing DDL). Local-filesystem convenience overload.
    */
  def readSchemaFile(path: String, charset: String = "auto"): String =
    clean(decode(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), charset))

  /** Hadoop-FS variant: reads through `FileSystem.open`, so schema
    * files resolve on whatever store discovery listed them from
    * (local, hdfs://, s3a:// — the same API `Ingest.discover` walks).
    */
  def readSchemaFile(
      conf: org.apache.hadoop.conf.Configuration,
      path: String,
      charset: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val bytes =
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    clean(decode(bytes, charset))
  }

  private def clean(s: String): String =
    graft.schema.MysqlDdl.unwrapAndStripBlockComments(s)
      .replaceAll("(?m)^\\s*--.*$", " ")
}
