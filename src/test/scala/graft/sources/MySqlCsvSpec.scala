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

  test("native and tokenizer paths parse round-trip data identically") {
    // the two parsers are allowed to differ only on dialect corners no
    // MySQL tool emits (quoted "\N"); on writeRaw's rendering — quoted
    // strings, backslash escapes, bare \N nulls, numbers — they must
    // agree byte for byte, since strictFormat routes whole tables to
    // the tokenizer that the default path reads natively.
    val spark = graft.SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "plain", 1.5),
      (2L, "comma, quote \" backslash \\ mix", -2.25),
      (3L, null.asInstanceOf[String], 0.0),
      (4L, "tab\there nl-escape \\n literal", 9.75))
      .toDF("id", "s", "d")
    val dir = java.nio.file.Files.createTempDirectory("graft_eqv").toString
    MySqlCsv.writeRaw(df.repartition(1), dir)
    val cols = Seq("id", "s", "d")
    val native = MySqlCsv.readRaw(spark, Seq(dir), cols, CsvDialect())
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val tok = MySqlCsv.readRaw(spark, Seq(dir), cols, CsvDialect(), forceTokenizer = true)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(native.toSeq === tok.toSeq)
    assert(native.length === 4 && native(2)(1) == null)
  }

  test("chunkLines partitions a file exactly at every chunk size") {
    // MyDumper-region alignment: each line belongs to exactly one chunk
    // (the one owning its first byte), chunks reading past their end to
    // finish a line, later chunks skipping their partial first line —
    // for ANY chunk size, including boundaries landing mid-line.
    val tmp = java.nio.file.Files.createTempFile("graft_chunklines", ".csv")
    val lines = (1 to 57).map(i => s"$i,row_number_$i")
    java.nio.file.Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    val size = java.nio.file.Files.size(tmp)
    val conf = new org.apache.hadoop.conf.Configuration()
    for (chunk <- Seq(1L, 7L, 64L, 100L, size, size + 5)) {
      val got = (0L until size by chunk).flatMap { off =>
        MySqlCsv.chunkLines(conf, tmp.toString, off, math.min(chunk, size - off))
          .map(t => new String(t._2, "UTF-8")).toSeq
      }
      assert(got === lines, s"chunk size $chunk")
    }
    // CRLF + no trailing newline
    java.nio.file.Files.writeString(tmp, "a,1\r\nb,2\r\nc,3")
    val sz2 = java.nio.file.Files.size(tmp)
    val got2 = (0L until sz2 by 5L).flatMap { off =>
      MySqlCsv.chunkLines(conf, tmp.toString, off, math.min(5L, sz2 - off))
        .map(t => new String(t._2, "UTF-8")).toSeq
    }
    assert(got2 === Seq("a,1", "b,2", "c,3"))
  }

  test("seeded random CSVs: every chunk grid reproduces the file's lines") {
    // property sweep over GENERATED strict-format CSVs (quoted fields
    // with escaped hostile chars, multi-byte text, CRLF or LF, with
    // and without a trailing newline) — line-boundary arithmetic must
    // hold for shapes nobody hand-picked. Seeded: failures reproduce.
    val rnd = new scala.util.Random(20260813L)
    val alphabet = "ab\"',\\|;β日 \t#" // no raw newlines: the strict-format precondition
    def field(): String =
      if (rnd.nextBoolean()) "\"" + SqlLiterals.escape((0 until rnd.nextInt(10))
        .map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString) + "\""
      else rnd.nextInt(1000).toString
    val conf = new org.apache.hadoop.conf.Configuration()
    for (round <- 1 to 12) {
      val lines = (0 until 3 + rnd.nextInt(40))
        .map(_ => (0 until 1 + rnd.nextInt(5)).map(_ => field()).mkString(","))
      val sep = if (rnd.nextBoolean()) "\r\n" else "\n"
      val body = lines.mkString(sep) + (if (rnd.nextBoolean()) sep else "")
      val tmp = java.nio.file.Files.createTempFile("graft_csvprop", ".csv")
      java.nio.file.Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val size = java.nio.file.Files.size(tmp)
      for (chunk <- Seq(1L, 2L + rnd.nextInt(15), 64L, size + 3)) {
        val got = (0L until size by chunk).flatMap { off =>
          MySqlCsv.chunkLines(conf, tmp.toString, off, math.min(chunk, size - off))
            .map(t => new String(t._2, "UTF-8")).toSeq
        }
        assert(got === lines, s"round=$round chunk=$chunk sep=${sep.length}")
      }
      java.nio.file.Files.delete(tmp)
    }
  }

  test("UTF-16 rejects loudly on every byte-splitting path") {
    // 0x0A bytes are not unambiguous line ends in UTF-16/32 ('\n' is
    // 0A 00, and other characters' code units contain 0x0A too), so
    // the tokenizer and chunk readers must refuse rather than decode
    // garbled fragments; byte-oriented charsets stay chunkable.
    val d16 = CsvDialect(encoding = "UTF-16")
    // the guards fire before any session/file use, so no Spark needed
    val e1 = intercept[IllegalArgumentException] {
      MySqlCsv.readRaw(null, Seq("/tmp/nope.csv"), Seq("a"), d16, forceTokenizer = true)
    }
    assert(e1.getMessage.contains("UTF-16/32"))
    val e2 = intercept[IllegalArgumentException] {
      MySqlCsv.readRawChunk(null, "/tmp/nope.csv", 0L, 10L, Seq("a"), d16)
    }
    assert(e2.getMessage.contains("UTF-16/32"))
    for (cs <- Seq("UTF-8", "GB18030", "ISO-8859-1", "GBK", "Big5"))
      assert(graft.sources.CharsetReader.newlineByteSafe(cs), cs)
    for (cs <- Seq("UTF-16", "UTF-16LE", "UTF-32", "utf-16be"))
      assert(!graft.sources.CharsetReader.newlineByteSafe(cs), cs)
  }
}
