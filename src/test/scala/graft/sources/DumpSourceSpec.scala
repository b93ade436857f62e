package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class DumpSourceSpec extends AnyFunSuite {

  test("multi-row INSERT with mixed literal kinds") {
    val stmts = DumpSource.parseStatements(
      """-- MySQL dump
        |INSERT INTO `db`.`t` VALUES (1,'alice',NULL,3.14),(2,'bob; the builder',TRUE,0x414243);
        |""".stripMargin)
    assert(stmts.length === 1)
    assert(stmts.head.table === "db.t")
    val rows = stmts.head.rows
    assert(rows(0).toSeq === Seq("1", "alice", null, "3.14"))
    // hex literals stay lexical (type-aware resolution happens against
    // the schema, see resolveHex)
    assert(rows(1).toSeq === Seq("2", "bob; the builder", "1",
      DumpSource.HexSentinel + "414243"))
  }

  test("semicolons and quotes inside strings do not break statement parsing") {
    val stmts = DumpSource.parseStatements(
      """INSERT INTO t VALUES ('a;b','it''s \'ok\''),('c\\d','line1\nline2');
        |INSERT INTO t VALUES ('last',NULL);""".stripMargin)
    assert(stmts.length === 2)
    assert(stmts(0).rows(0).toSeq === Seq("a;b", "it's 'ok'"))
    assert(stmts(0).rows(1).toSeq === Seq("c\\d", "line1\nline2"))
    assert(stmts(1).rows(0).toSeq === Seq("last", null))
  }

  test("explicit column list recorded for projection") {
    val stmts = DumpSource.parseStatements(
      "INSERT INTO t (b, a) VALUES (1, 2), (3, 4);")
    assert(stmts.head.columns === Some(Seq("b", "a")))
    assert(stmts.head.rows.map(_.toSeq) === Seq(Seq("1", "2"), Seq("3", "4")))
  }

  test("bit and negative number literals") {
    val stmts = DumpSource.parseStatements(
      "INSERT INTO t VALUES (b'101', -42, x'6869', FALSE);")
    assert(stmts.head.rows(0).toSeq ===
      Seq("5", "-42", DumpSource.HexSentinel + "6869", "0"))
  }

  test("hex literals resolve type-aware: bytes into BINARY, text elsewhere") {
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("graft_dump_hex")
    val f = dir.resolve("vt.t.0001.sql")
    // 0xEE72AE0A is NOT valid UTF-8: a parse-time string decode would
    // corrupt it to U+FFFD (reference tests/various_types BINARY keys)
    java.nio.file.Files.writeString(f,
      "INSERT INTO t VALUES (1, x'EE72ae0a', x'68656C6C6F', 0x5A);\n" +
      "INSERT INTO t VALUES (2, 0xDEADBEEF, 'plain', NULL);")
    val schema = graft.schema.MysqlDdl.parse(
      "CREATE TABLE t (id int NOT NULL, bin varbinary(16), s varchar(20), c char(4));")
    val rows = DumpSource.read(spark, Seq(f.toString), schema)
      .orderBy("id").collect()
    assert(rows(0).getAs[Array[Byte]]("bin").toSeq ===
      Seq(0xEE, 0x72, 0xAE, 0x0A).map(_.toByte))
    assert(rows(0).getAs[String]("s") === "hello")
    assert(rows(0).getAs[String]("c") === "Z")
    assert(rows(1).getAs[Array[Byte]]("bin").toSeq ===
      Seq(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte))
    assert(rows(1).getAs[String]("s") === "plain")
    assert(rows(1).isNullAt(rows(1).fieldIndex("c")))
  }

  test("malformed hex body stays lexical instead of throwing mid-parse") {
    val stmts = DumpSource.parseStatements(
      "INSERT INTO t VALUES (0xZZ, x'nothex');")
    assert(stmts.head.rows(0).toSeq === Seq("0xZZ", "x'nothex'"))
  }

  test("bit literals: 64-bit pattern parses, malformed stays lexical") {
    val stmts = DumpSource.parseStatements(
      "INSERT INTO t VALUES (b'" + "1" * 64 + "', b'', b'102');")
    // BIT(64) all-ones = uint64 max = two's-complement -1 in LongType
    assert(stmts.head.rows(0).toSeq === Seq("-1", "b''", "b'102'"))
  }

  test("a string datum colliding with the hex sentinel survives exactly") {
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("graft_dump_guard")
    val f = dir.resolve("g.t.0001.sql")
    // \0 is MyDumper's escape for a NUL byte: this datum unescapes to
    // NUL+"hex:4142" — byte-identical to what a hex literal parses to
    java.nio.file.Files.writeString(f,
      "INSERT INTO t VALUES (1, '\\0hex:4142', x'4142');")
    val schema = graft.schema.MysqlDdl.parse(
      "CREATE TABLE t (id int NOT NULL, s varchar(20), s2 varchar(20));")
    val r = DumpSource.read(spark, Seq(f.toString), schema).collect()(0)
    assert(r.getString(1) === "\u0000hex:4142") // the literal string, intact
    assert(r.getString(2) === "AB") // the real hex literal decodes
  }

  test("schema-less resolution decodes hex datums as text, no sentinel leak") {
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("graft_dump_noschema")
    val f = dir.resolve("n.t.0001.sql")
    java.nio.file.Files.writeString(f,
      "INSERT INTO t VALUES (0x414243, 'plain');")
    val raw = DumpSource.readRaw(spark, Seq(f.toString), Seq("a", "b"))
    val r = DumpSource.resolveHexText(raw).collect()(0)
    assert(r.getString(0) === "ABC")
    assert(r.getString(1) === "plain")
  }

  test("REPLACE INTO and noise between statements") {
    val stmts = DumpSource.parseStatements(
      """/* comment */ SET NAMES utf8;
        |REPLACE INTO t VALUES (9,'z');""".stripMargin)
    assert(stmts.length === 1)
    assert(stmts.head.rows(0).toSeq === Seq("9", "z"))
  }

  test("commented-out and string-embedded INSERTs never inject phantom rows") {
    // the reference's lexer skips comments/strings before keyword
    // matching (parser.rl); a keyword-hunting scanner without that
    // state would ingest all three decoys below as data
    val stmts = DumpSource.parseStatements(
      """-- INSERT INTO t VALUES (901),(902);
        |# INSERT INTO t VALUES (903);
        |/* multi-line
        |   INSERT INTO t VALUES (904); */
        |SET @msg = 'INSERT INTO t VALUES (905)';
        |INSERT INTO t VALUES (1),(2);
        |-- trailing comment: REPLACE INTO t VALUES (906);
        |REPLACE INTO t VALUES (3);""".stripMargin)
    assert(stmts.map(_.rows.map(_.head).toSeq) === Seq(Seq("1", "2"), Seq("3")))
  }

  test("versioned /*! */ comments execute their contents like MySQL") {
    val stmts = DumpSource.parseStatements(
      """/*!40101 INSERT INTO t VALUES (7) */;
        |INSERT INTO t VALUES (2);""".stripMargin)
    assert(stmts.map(_.rows.head.toSeq) === Seq(Seq("7"), Seq("2")))
  }

  test("an unterminated quote in noise recovers instead of swallowing the file") {
    // the reference's lexer errors here; tolerant-recovery must at
    // minimum keep every later statement instead of silently dropping
    // the rest of a 256 MiB file
    val stmts = DumpSource.parseStatements(
      """SELECT 'unterminated...
        |INSERT INTO t VALUES (1);
        |/* also unterminated
        |INSERT INTO t VALUES (2);""".stripMargin)
    assert(stmts.map(_.rows.head.toSeq) === Seq(Seq("1"), Seq("2")))
  }

  test("an unterminated quote must not pair with a quote on a LATER line") {
    // dump strings never contain raw newlines (mysqldump escapes
    // LF/CR), so a quote open at EOL is truncation. If it paired with
    // the next apostrophe below, parity would invert and both INSERTs
    // would be swallowed or mis-split.
    val stmts = DumpSource.parseStatements(
      """SET @a = 'truncated...
        |INSERT INTO t VALUES (1,'a');
        |INSERT INTO t VALUES (2,'b');""".stripMargin)
    assert(stmts.map(_.rows.head.toSeq) === Seq(Seq("1", "a"), Seq("2", "b")))
  }

  test("line comments with apostrophes and --5 arithmetic don't derail the scan") {
    val stmts = DumpSource.parseStatements(
      """-- don't trip on this apostrophe
        |INSERT INTO t VALUES (1--5);
        |INSERT INTO t VALUES (2);""".stripMargin)
    // --5 after a value is MySQL arithmetic (1 - (-5)), not a comment:
    // the bare-token reader keeps it lexical; crucially the second
    // INSERT still parses
    assert(stmts.length === 2)
    assert(stmts(1).rows.head.toSeq === Seq("2"))
  }

  test("double-quoted string values parse (reference tests/tool_1420)") {
    val stmts = DumpSource.parseStatements(
      """INSERT INTO `pt_role` (`ROLE_ID`) VALUES ("1");
        |INSERT INTO `pt_role` (`ROLE_ID`) VALUES ("say ""hi"" \" ok");""".stripMargin)
    assert(stmts.map(_.rows.head.toSeq) === Seq(Seq("1"), Seq("say \"hi\" \" ok")))
  }

  test("ctrl-Z escape and literal @-strings survive (reference tests/issue_282)") {
    val stmts = DumpSource.parseStatements(
      """INSERT INTO `t_access3` VALUES
        |('@P&FLASHSHA');
        |INSERT INTO `t_access3` VALUES
        |('\Z');""".stripMargin)
    assert(stmts.map(_.rows.head.toSeq) === Seq(Seq("@P&FLASHSHA"), Seq("\u001A")))
  }

  test("a VALUES-less statement does not swallow the next statement's rows") {
    val stmts = DumpSource.parseStatements(
      """INSERT INTO t1 SELECT * FROM src;
        |INSERT INTO t2 VALUES (1, 2);""".stripMargin)
    assert(stmts.length === 1)
    assert(stmts.head.table === "t2")
    assert(stmts.head.rows.map(_.toSeq) === Seq(Seq("1", "2")))
  }

  test("INSERT IGNORE and the VALUE spelling parse at the statement head") {
    val stmts = DumpSource.parseStatements(
      """INSERT IGNORE INTO t VALUES (1);
        |INSERT INTO u VALUE (2);""".stripMargin)
    assert(stmts.map(_.table) === Seq("t", "u"))
    assert(stmts.map(_.rows.head.toSeq) === Seq(Seq("1"), Seq("2")))
  }

  test("statement iterator is lazy and boundary-safe mid-file") {
    val text =
      """INSERT INTO a VALUES ('x');
        |INSERT INTO b SELECT 1;
        |REPLACE INTO c VALUES ('y'),('z');""".stripMargin
    val it = DumpSource.statementIterator(text)
    assert(it.next().table === "a")
    assert(it.next().table === "c")
    assert(!it.hasNext)
  }

  test("typed DECIMAL leg: dump parse yields exact DecimalType values") {
    // The driver's correctness gate only ever sees decimals rendered as
    // strings (its hash canonicalizes typed DECIMAL differently — see
    // IngestQueries.variousTypesDec scaladoc), so the typed schema and
    // values out of the parser are pinned HERE: DECIMAL(6,4) keeps all
    // four scale digits, BIGINT UNSIGNED maps to DECIMAL(20,0) and
    // holds the uint64 ceiling losslessly.
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("graft_dump_dec")
    val f = dir.resolve("d.t.0001.sql")
    java.nio.file.Files.writeString(f,
      "INSERT INTO t VALUES (1, 12.3456, 18446744073709551615)," +
        "(2, -9.9999, 0),(3, NULL, NULL);")
    val schema = graft.schema.MysqlDdl.parse(
      "CREATE TABLE t (id int NOT NULL, d decimal(6,4), u bigint UNSIGNED);")
    val df = DumpSource.read(spark, Seq(f.toString), schema)
    import org.apache.spark.sql.types.DecimalType
    assert(df.schema("d").dataType === DecimalType(6, 4))
    assert(df.schema("u").dataType === DecimalType(20, 0))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getDecimal(1) === new java.math.BigDecimal("12.3456"))
    assert(rows(0).getDecimal(2) === new java.math.BigDecimal("18446744073709551615"))
    assert(rows(1).getDecimal(1) === new java.math.BigDecimal("-9.9999"))
    assert(rows(1).getDecimal(2) === new java.math.BigDecimal("0"))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("a gzipped dump file reads transparently (S8 beyond the reference)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dump_gz")
    val gz = dir.resolve("d.t.0001.sql.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    out.write("INSERT INTO t (a,b) VALUES (1,'x'),(2,'y');\n".getBytes("UTF-8"))
    out.close()
    val rows = DumpSource.readRaw(graft.SparkSpec.session, Seq(gz.toString), Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq === Seq(("1", "x"), ("2", "y")))
  }
}
