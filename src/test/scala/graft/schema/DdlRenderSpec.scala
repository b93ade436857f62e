package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** render is parse's inverse: parse(render(parse(ddl))) ≡ parse(ddl)
  * across the attribute surface the parser reads.
  */
class DdlRenderSpec extends AnyFunSuite {

  private val palette =
    """CREATE TABLE IF NOT EXISTS `db`.`t` (
      |  `id` bigint(20) UNSIGNED NOT NULL AUTO_INCREMENT,
      |  `name` varchar(128) DEFAULT 'anon',
      |  `ratio` decimal(6,4),
      |  `flags` bit(4),
      |  `status` enum('YES','NO') NOT NULL DEFAULT 'YES',
      |  `created` timestamp DEFAULT CURRENT_TIMESTAMP,
      |  `payload` longblob,
      |  `doubled` int AS (id * 2) STORED,
      |  PRIMARY KEY (`id`)
      |);""".stripMargin

  test("parse-render-parse is a fixed point on the palette DDL") {
    val once = MysqlDdl.parse(palette)
    val twice = MysqlDdl.parse(MysqlDdl.render(once))
    assert(twice.table === once.table)
    assert(twice.primaryKey === once.primaryKey)
    assert(twice.columns.map(_.name) === once.columns.map(_.name))
    once.columns.zip(twice.columns).foreach { case (a, b) =>
      assert(b.sparkType === a.sparkType, a.name)
      assert(b.nullable === a.nullable, a.name)
      assert(b.default === a.default, a.name)
      assert(b.autoIncrement === a.autoIncrement, a.name)
      assert(b.unsigned === a.unsigned, a.name)
      assert(b.generated.isDefined === a.generated.isDefined, a.name)
      assert(b.enumValues === a.enumValues, a.name)
    }
  }

  test("auto_random renders in the TiDB comment form and re-parses") {
    val ddl = "CREATE TABLE t (id bigint PRIMARY KEY /*T![auto_rand] AUTO_RANDOM(5) */);"
    val once = MysqlDdl.parse(ddl)
    assert(once.columns.head.autoRandomBits === Some(5))
    val twice = MysqlDdl.parse(MysqlDdl.render(once))
    assert(twice.columns.head.autoRandomBits === Some(5))
  }

  test("fromStruct + render produce DDL whose types round-trip") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType),
      StructField("c", DoubleType),
      StructField("d", DecimalType(20, 0)),
      StructField("e", BinaryType),
      StructField("f", TimestampType),
      StructField("g", DateType),
      StructField("h", IntegerType)))
    val ts = MysqlDdl.fromStruct("db", "t", st, Seq("a"))
    val back = MysqlDdl.parse(MysqlDdl.render(ts))
    assert(back.struct.fields.map(f => (f.name, f.dataType)).toSeq ===
      st.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.primaryKey === Seq("a"))
  }

  test("sub-int integers widen to int on re-parse (documented), others exact") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("b8", ByteType),
      StructField("b16", ShortType),
      StructField("f32", FloatType),
      StructField("bool", BooleanType)))
    val back = MysqlDdl.parse(MysqlDdl.render(MysqlDdl.fromStruct("db", "t", st)))
    assert(back.struct("b8").dataType === IntegerType)   // tinyint widens
    assert(back.struct("b16").dataType === IntegerType)  // smallint widens
    assert(back.struct("f32").dataType === FloatType)
    assert(back.struct("bool").dataType === BooleanType)
  }

  test("a DEFAULT containing quotes and backslashes survives render-parse") {
    val ddl = """CREATE TABLE t (s varchar(30) DEFAULT 'o\'brien \\ 100%');"""
    val once = MysqlDdl.parse(ddl)
    assert(once.columns.head.default === Some("o'brien \\ 100%"))
    val twice = MysqlDdl.parse(MysqlDdl.render(once))
    assert(twice.columns.head.default === once.columns.head.default)
  }
}
