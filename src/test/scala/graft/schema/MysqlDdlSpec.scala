package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class MysqlDdlSpec extends AnyFunSuite {

  test("full palette table") {
    val t = MysqlDdl.parse(
      """CREATE TABLE IF NOT EXISTS `db`.`t` (
        |  `id` bigint(20) UNSIGNED NOT NULL AUTO_INCREMENT,
        |  `name` varchar(128) DEFAULT 'anon',
        |  `ratio` decimal(6,4),
        |  `payload` longblob,
        |  `when` datetime(6),
        |  `day` date,
        |  `dur` time(3),
        |  `y` year,
        |  `j` json,
        |  `st` set('a','b'),
        |  `en` enum('YES','NO') NOT NULL,
        |  PRIMARY KEY (`id`),
        |  UNIQUE KEY uk (`name`),
        |  KEY k2 (`ratio`)
        |);""".stripMargin)
    assert(t.database === Some("db") && t.table === "t")
    assert(t.primaryKey === Seq("id"))
    val types = t.columns.map(c => c.name -> c.sparkType).toMap
    assert(types("id") === DecimalType(20, 0)) // unsigned bigint
    assert(types("name") === StringType)
    assert(types("ratio") === DecimalType(6, 4))
    assert(types("payload") === BinaryType)
    assert(types("when") === TimestampType)
    assert(types("day") === DateType)
    assert(types("dur") === StringType)
    assert(types("y") === IntegerType)
    assert(types("j") === StringType)
    assert(types("st") === StringType)
    assert(types("en") === StringType)
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("id").autoIncrement && !byName("id").nullable && byName("id").unsigned)
    assert(byName("name").default === Some("anon"))
    assert(byName("st").enumValues === Seq("a", "b"))
  }

  test("generated columns, stored and virtual") {
    val t = MysqlDdl.parse(
      """CREATE TABLE gencol.nested (
        |  a int,
        |  b int AS (a + 1) VIRTUAL,
        |  c int GENERATED ALWAYS AS (b + 1) STORED
        |);""".stripMargin)
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("a").generated.isEmpty)
    assert(byName("b").generated === Some(GeneratedCol("a + 1", stored = false)))
    assert(byName("c").generated === Some(GeneratedCol("b + 1", stored = true)))
  }

  test("generated-column attributes parse in ANY order after the expression") {
    // MySQL accepts the storage keyword and index/null attributes in
    // any order; an ordered-groups regex silently drops the generated
    // clause for the orders it missed and the column imports as NULL
    val t = MysqlDdl.parse(
      """CREATE TABLE t (
        |  a int,
        |  b int AS (a + 1) VIRTUAL UNIQUE,
        |  c int AS (a + 2) NOT NULL UNIQUE,
        |  d int AS (a + 3) UNIQUE KEY STORED,
        |  e int AS (a + 4) STORED NOT NULL COMMENT 'derived (really)'
        |);""".stripMargin)
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("b").generated === Some(GeneratedCol("a + 1", stored = false)))
    assert(byName("c").generated === Some(GeneratedCol("a + 2", stored = true)))
    assert(byName("d").generated === Some(GeneratedCol("a + 3", stored = true)))
    assert(byName("e").generated === Some(GeneratedCol("a + 4", stored = true)))
    assert(!byName("c").nullable && !byName("e").nullable)
  }

  test("generated clause survives UNLISTED attributes and paren-bearing tails") {
    // the attribute tail is open-ended in MySQL (INVISIBLE since
    // 8.0.23, CHECK constraints carry their own parens); the expr is
    // extracted by balanced-paren scan, so neither shape can silently
    // drop the generated clause or mis-capture the expression
    val t = MysqlDdl.parse(
      """CREATE TABLE t (
        |  a int,
        |  b int AS (a + 1) VIRTUAL INVISIBLE,
        |  c int AS (f(a, g(a))) STORED CHECK (c > 0),
        |  d varchar(10) DEFAULT 'as (fake)' COMMENT 'not as (generated)'
        |);""".stripMargin)
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("b").generated === Some(GeneratedCol("a + 1", stored = false)))
    assert(byName("c").generated === Some(GeneratedCol("f(a, g(a))", stored = true)))
    assert(byName("d").generated === None,
      "AS ( inside string literals must not fabricate a generated clause")
    assert(byName("d").default === Some("as (fake)"))
  }

  test("comments and inline primary key") {
    val t = MysqlDdl.parse(
      """/* header */
        |CREATE TABLE s (
        |  id int PRIMARY KEY, -- trailing comment
        |  v varchar(10)
        |);""".stripMargin)
    assert(t.primaryKey === Seq("id"))
    assert(t.columns.map(_.name) === Seq("id", "v"))
  }

  test("column names starting with index keywords are still columns") {
    val t = MysqlDdl.parse(
      "CREATE TABLE x (key_mod int, index_col int, unique_id bigint, KEY k (key_mod))")
    assert(t.columns.map(_.name) === Seq("key_mod", "index_col", "unique_id"))
  }

  test("partitioned-table DDL parses; expression partitioning extracts no key") {
    // reference tests/partitioned-table: an expression partition key
    // (YEAR(created)) has no partitionBy-column analog — columns still
    // parse, the key list stays empty
    val t = MysqlDdl.parse(
      """CREATE TABLE p (
        |  id bigint NOT NULL,
        |  created date,
        |  PRIMARY KEY (id)
        |) PARTITION BY RANGE (YEAR(created)) (
        |  PARTITION p2020 VALUES LESS THAN (2021),
        |  PARTITION pmax VALUES LESS THAN MAXVALUE
        |);""".stripMargin)
    assert(t.columns.map(_.name) === Seq("id", "created"))
    assert(t.primaryKey === Seq("id"))
    assert(t.partitionBy === Nil)
  }

  test("column-list PARTITION BY forms extract the partition key") {
    // the reference's own fixture shape (tests/partitioned-table)
    val h = MysqlDdl.parse(
      "create table a (a int, b varchar(16), KEY key_b (`b`)) " +
        "partition by hash(a) partitions 5;")
    assert(h.partitionBy === Seq("a"))
    val k = MysqlDdl.parse(
      "CREATE TABLE t (x int, y int) PARTITION BY LINEAR KEY (`x`, `y`) PARTITIONS 3;")
    assert(k.partitionBy === Seq("x", "y"))
    val rc = MysqlDdl.parse(
      "CREATE TABLE t (x int, y date) PARTITION BY RANGE COLUMNS(x) " +
        "(PARTITION p0 VALUES LESS THAN (10));")
    assert(rc.partitionBy === Seq("x"))
    // a false positive inside a column COMMENT string must not trigger
    val c = MysqlDdl.parse(
      "CREATE TABLE t (x int COMMENT 'partition by hash(x)', y int);")
    assert(c.partitionBy === Nil)
  }

  test("defaults with commas inside enum args survive splitting") {
    val t = MysqlDdl.parse(
      "CREATE TABLE x (e enum('a,b','c') DEFAULT 'a,b', n int DEFAULT 0)")
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("e").enumValues === Seq("a,b", "c"))
    assert(byName("e").default === Some("a,b"))
    assert(byName("n").default === Some("0"))
  }

  test("AUTO_RANDOM parses bare, with bits, and inside TiDB executable comments") {
    val t = MysqlDdl.parse(
      """CREATE TABLE ar (
        |  a bigint AUTO_RANDOM,
        |  b bigint /*T![auto_rand] AUTO_RANDOM(6) */ NOT NULL,
        |  c bigint AUTO_INCREMENT,
        |  d bigint
        |);""".stripMargin)
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("a").autoRandomBits === Some(5)) // TiDB default shard bits
    assert(byName("b").autoRandomBits === Some(6))
    assert(!byName("b").nullable) // NOT NULL survives the unwrap
    assert(byName("c").autoRandomBits === None && byName("c").autoIncrement)
    assert(byName("d").autoRandomBits === None)
  }

  test("keywords inside string literals do not flip column flags") {
    val t = MysqlDdl.parse(
      """CREATE TABLE f (
        |  id bigint NOT NULL,
        |  note varchar(50) COMMENT 'migrated from auto_random source',
        |  u varchar(20) DEFAULT 'unsigned not null auto_increment'
        |);""".stripMargin)
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("note").autoRandomBits === None)
    assert(!byName("u").unsigned && !byName("u").autoIncrement && byName("u").nullable)
    assert(byName("u").default === Some("unsigned not null auto_increment"))
  }

  test("DEFAULT/AS clauses inside COMMENT strings are not extracted; real ones are") {
    val t = MysqlDdl.parse(
      """CREATE TABLE g (
        |  a varchar(20) COMMENT 'reverts to default value at runtime',
        |  b varchar(20) COMMENT 'computed as (x + 1) elsewhere',
        |  c int DEFAULT 7 COMMENT 'the default 9 never applies',
        |  d bigint AS (`unsigned_raw` + 1) STORED
        |);""".stripMargin)
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("a").default === None)
    assert(byName("b").generated === None)
    assert(byName("c").default === Some("7"))
    assert(byName("d").generated.map(_.expr) === Some("`unsigned_raw` + 1"))
    assert(!byName("d").unsigned) // identifier must not flip the flag
  }

  test("prefixed literal defaults (bit/hex/introducer) decode to plain values") {
    val t = MysqlDdl.parse(
      """CREATE TABLE p (
        |  a bigint DEFAULT b'101',
        |  b varchar(4) DEFAULT x'6869',
        |  c varchar(10) DEFAULT _utf8mb4'hi there',
        |  d varchar(10) DEFAULT _utf8mb4 'spaced'
        |);""".stripMargin)
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(byName("a").default === Some("5")) // b'101' = 5, castable to bigint
    assert(byName("b").default === Some("hi")) // x'6869' = "hi"
    assert(byName("c").default === Some("hi there"))
    assert(byName("d").default === Some("spaced"))
  }

  test("hex defaults on binary columns keep exact bytes (no UTF-8 mangling)") {
    val t = MysqlDdl.parse(
      """CREATE TABLE bb (
        |  raw varbinary(4) DEFAULT x'80ff00aa',
        |  txt varchar(4) DEFAULT x'6869'
        |);""".stripMargin)
    val byName = t.columns.map(c => c.name -> c).toMap
    // binary-typed: the x'..' form survives parse, and its byte payload
    // round-trips exactly — 0x80/0xff are not valid UTF-8 lead bytes
    assert(byName("raw").default === Some("x'80ff00aa'"))
    assert(MysqlDdl.hexLiteralBytes("x'80ff00aa'").get.toSeq ===
      Seq(0x80.toByte, 0xff.toByte, 0x00.toByte, 0xaa.toByte))
    // character-typed columns still decode to the string
    assert(byName("txt").default === Some("hi"))
  }

  test("two-argument AUTO_RANDOM(shard, range) takes the shard width") {
    val t = MysqlDdl.parse(
      "CREATE TABLE ar2 (id bigint /*T![auto_rand] AUTO_RANDOM(6, 54) */ NOT NULL);")
    assert(t.columns.head.autoRandomBits === Some(6))
  }

  test("plain block comments still strip while versioned comments unwrap") {
    val t = MysqlDdl.parse(
      "CREATE TABLE x (a int /* just a note */, b int /*!50100 UNSIGNED */);")
    val byName = t.columns.map(c => c.name -> c).toMap
    assert(!byName("a").unsigned)
    assert(byName("b").unsigned)
  }

  test("exotic table names parse: escaped backticks and unicode (reference tests/exotic_filenames)") {
    // the routed FILE name is authoritative for the table identity;
    // the DDL must still parse its column list under these names
    val t1 = MysqlDdl.parse(
      "create table `exotic``table````name` (a varchar(6) primary key, " +
        "b int unique auto_increment) auto_increment=80000;")
    assert(t1.colNames === Seq("a", "b"))
    assert(t1.columns(1).autoIncrement)
    assert(t1.primaryKey === Seq("a"))
    val t2 = MysqlDdl.parse("create table 中文表(a int primary key);")
    assert(t2.colNames === Seq("a"))
    assert(t2.table.nonEmpty)
  }

  test("spaced and escaped backquoted identifiers parse whole") {
    // a spaced backquoted pk must survive whole — a whitespace split
    // would truncate it to "`my" and break the int-handle detection
    val t = MysqlDdl.parse(
      "CREATE TABLE t (`my id` bigint PRIMARY KEY, v varchar(4));")
    assert(t.colNames === Seq("my id", "v"))
    assert(t.primaryKey === Seq("my id"))
    // doubled backticks are ESCAPED backticks, for columns exactly
    // like for table names
    val e = MysqlDdl.parse("CREATE TABLE t (`a``b` int, c int);")
    assert(e.colNames === Seq("a`b", "c"))
    assert(MysqlDdl.unquoteIdent("`a``b`") === "a`b")
    assert(MysqlDdl.unquoteIdent("\"x\"\"y\"") === "x\"y")
  }
}
