package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The reference's `tests/default-columns` replayed over its own data
  * dir: empty column lists and EMPTY TUPLES (`INSERT INTO t () VALUES
  * (), ()`) must parse, auto-increment must fill the pk across
  * statements, and non-auto defaults must land.
  */
class DefaultColumnsSpec extends SparkSpec {

  test("default-columns: empty tuples, auto-inc continuation, defaults") {
    val src = Paths.get("/root/reference/tests/default-columns/data")
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory("graft_defcol").toString
    val reports = Ingest.run(spark, Ingest.Config(src.toString, out))
    assert(reports.map(_.table).sorted === Seq("t", "u"))
    assert(reports.forall(_.checksumOk))

    val t = spark.read.parquet(s"$out/defcol.t").orderBy("pk").collect()
    assert(t.length === 9, "6 + 3 empty-tuple rows")
    assert(t.map(_.getAs[Number]("pk").longValue).toSeq === (1L to 9L),
      "auto-increment continues across statements")
    assert(t.forall(_.isNullAt(t.head.fieldIndex("x"))), "x NULL default")
    assert(t.forall(_.getAs[Number]("y").longValue == 123L), "y literal default")
    assert(t.forall(!_.isNullAt(t.head.fieldIndex("z"))),
      "z CURRENT_TIMESTAMP default fills")

    val u = spark.read.parquet(s"$out/defcol.u").orderBy("yy").collect()
    assert(u.map(_.getAs[Number]("yy").longValue).toSeq === Seq(40L, 60L))
    assert(u.map(_.getAs[Number]("xx").longValue).sorted.toSeq === Seq(1L, 2L),
      "unique auto-inc fills from 1")
  }
}
