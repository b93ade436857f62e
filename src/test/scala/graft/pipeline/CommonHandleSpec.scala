package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/common_handle` replayed: under TiDB's
  * clustered-index mode a table whose primary key is non-integer uses
  * the KEY ITSELF as the handle — no `_tidb_rowid` column (run.sh's
  * `ADMIN CHECKSUM` pins Total_kvs = row count, i.e. zero extra
  * handle kv-pairs) — while the data pins hold (count 6, sum(i) 21).
  * The corpus builds its data inline in run.sh; mirrored verbatim.
  */
class CommonHandleSpec extends SparkSpec {

  private def mkSource(): String = {
    val dir = Files.createTempDirectory("graft_ch")
    Files.writeString(dir.resolve("ch-schema-create.sql"),
      "CREATE DATABASE ch;")
    Files.writeString(dir.resolve("ch.t-schema.sql"),
      "CREATE TABLE t(s varchar(32), i INT, j TINYINT,  PRIMARY KEY(s, i));")
    Files.writeString(dir.resolve("ch.t.0.sql"),
      """INSERT INTO t (s, i, j) VALUES
        |  ("this_is_test1", 1, 1),
        |  ("this_is_test2", 2, 2),
        |  ("this_is_test3", 3, 3),
        |  ("this_is_test4", 4, 4),
        |  ("this_is_test5", 5, 5);
        |""".stripMargin)
    Files.writeString(dir.resolve("ch.t.1.sql"),
      """INSERT INTO t(s, i, j) VALUES ("another test case", 6, 6);""" + "\n")
    dir.toString
  }

  test("clustered index: composite varchar pk is the handle, no _tidb_rowid") {
    val out = Files.createTempDirectory("graft_ch_out").toString
    val reports = Ingest.run(spark, Ingest.Config(mkSource(), out,
      clusteredIndex = true))
    assert(reports.forall(_.checksumOk))
    val df = spark.read.parquet(s"$out/ch.t")
    // the Total_kvs=6 analog: six rows and NO synthesized handle column
    assert(!df.columns.contains("_tidb_rowid"), df.columns.mkString(","))
    val r = df.agg(count(lit(1)), sum(col("i"))).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((6L, 21L)))
  }

  test("default (non-clustered) mode still synthesizes the handle") {
    val out = Files.createTempDirectory("graft_ch_out2").toString
    Ingest.run(spark, Ingest.Config(mkSource(), out))
    assert(spark.read.parquet(s"$out/ch.t").columns.contains("_tidb_rowid"))
  }

  test("pk-less tables need the handle in BOTH modes") {
    val noPk = graft.schema.MysqlDdl.parse("CREATE TABLE t (a varchar(3), b int);")
    assert(Ingest.rowidRequired(noPk, clusteredIndex = true))
    assert(Ingest.rowidRequired(noPk))
    val varcharPk = graft.schema.MysqlDdl.parse(
      "CREATE TABLE t (pk varchar(6) NOT NULL, PRIMARY KEY (pk));")
    assert(!Ingest.rowidRequired(varcharPk, clusteredIndex = true))
    assert(Ingest.rowidRequired(varcharPk))
  }
}
