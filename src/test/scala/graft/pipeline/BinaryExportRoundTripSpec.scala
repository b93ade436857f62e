package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

/** Byte-charset columns through the FULL cycle: a latin1 column
  * holding non-UTF-8 bytes (0x99, a lone 0xF0 — the `tests/sqlmode`
  * shapes) imports from a dump, exports back to the MyDumper layout
  * (binary renders as 0x… hex literals), and re-imports BYTE-EXACT.
  * This is the fidelity the BinaryType mapping exists for — a string
  * round-trip would mangle both values at the first re-encode.
  */
class BinaryExportRoundTripSpec extends SparkSpec {

  test("latin1 bytes survive import -> export -> re-import") {
    val src = Files.createTempDirectory("graft_binrt")
    Files.writeString(src.resolve("d-schema-create.sql"), "CREATE DATABASE d;")
    Files.writeString(src.resolve("d.t-schema.sql"),
      "CREATE TABLE t (id int NOT NULL, c varchar(4) CHARSET latin1, PRIMARY KEY (id));")
    Files.writeString(src.resolve("d.t.sql"),
      "INSERT INTO t VALUES (1, x'99'), (2, x'f0'), (3, 'ok'), (4, x'0099f0');")
    val out = Files.createTempDirectory("graft_binrt_out").toString
    assert(Ingest.run(spark, Ingest.Config(src.toString, out)).forall(_.checksumOk))
    def bytes(dir: String): Map[Int, Seq[Int]] =
      spark.read.parquet(s"$dir/d.t").collect()
        .map(r => r.getInt(0) ->
          r.getAs[Array[Byte]]("c").toSeq.map(_ & 0xff)).toMap
    val first = bytes(out)
    assert(first(1) === Seq(0x99))
    assert(first(2) === Seq(0xf0))
    assert(first(3) === "ok".getBytes("UTF-8").toSeq.map(_ & 0xff))
    assert(first(4) === Seq(0x00, 0x99, 0xf0))

    // dumpling direction and back
    val dump = Files.createTempDirectory("graft_binrt_dump").toString
    Export.run(spark, out, dump, "d")
    val out2 = Files.createTempDirectory("graft_binrt_out2").toString
    assert(Ingest.run(spark, Ingest.Config(dump, out2)).forall(_.checksumOk))
    assert(bytes(out2) === first, "byte-exact after the full cycle")
  }
}
