package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.transform.GeneratedColumns.SessionVars

/** The reference's `tests/generated_columns` corpus replayed on its own
  * fixture — THE generated-column torture: a chain of alternating
  * virtual/stored columns (`nested`), and `various_types` where every
  * column is generated, including sha1-of-repeat over a generated
  * width, AES under `block_encryption_mode='aes-256-cbc'`, and
  * `from_unixtime` under `time_zone='-08:00'` (run.sh SETs both
  * globals before importing — here they ride
  * [[graft.transform.GeneratedColumns.SessionVars]], the analog of the
  * reference reading important variables from the target cluster).
  * Pins are run.sh:28-56's check_contains values.
  */
class GencolCorpusSpec extends SparkSpec {

  private val src = Paths.get("/root/reference/tests/generated_columns/data")

  private lazy val out: String = {
    assume(Files.exists(src), "reference tests not present")
    val dir = Files.createTempDirectory("graft_gencol_ref").toString
    val reports = Ingest.run(spark, Ingest.Config(src.toString, dir,
      sessionVars = SessionVars(
        timeZone = "-08:00", blockEncryptionMode = "aes-256-cbc")))
    assert(reports.forall(_.checksumOk),
      reports.map(r => r.table -> r.checksumOk).toString)
    dir
  }

  test("nested: the virtual/stored chain evaluates in declared order") {
    val rows = spark.read.parquet(s"$out/gencol.nested").orderBy("a").collect()
    assert(rows.map(_.getAs[Number]("a").intValue).toSeq === Seq(1, 10, 100, 1000))
    // run.sh pins the a=100 row: b..e = 101..104
    val r100 = rows.find(_.getAs[Number]("a").intValue == 100).get
    assert(Seq("b", "c", "d", "e").map(c => r100.getAs[Number](c).intValue)
      === Seq(101, 102, 103, 104))
    // and the chain holds for every row
    rows.foreach { r =>
      val a = r.getAs[Number]("a").intValue
      assert(Seq("b", "c", "d", "e").map(c => r.getAs[Number](c).intValue)
        === Seq(a + 1, a + 2, a + 3, a + 4), s"row a=$a")
    }
  }

  test("various_types: every generated value matches run.sh's pins") {
    val r = spark.read.parquet(s"$out/gencol.various_types").collect() match {
      case Array(only) => only
      case other => fail(s"expected one row, got ${other.length}")
    }
    assert(r.getAs[Number]("int64").longValue === 3L)
    assert(r.getAs[Number]("uint64").longValue === 5764801L) // pow(7,8)
    assert(r.getAs[Float]("float32") === 0.5625f) // 9/16
    assert(r.getAs[Double]("float64") === 5e222)
    val sha = "6ad8402ba6610f04d3ec5c9875489a7bc8e259c5"
    assert(r.getAs[String]("string") === sha) // sha1(repeat('x', uint64))
    assert(r.getAs[Array[Byte]]("bytes").map("%02x".format(_)).mkString === sha)
    assert(r.getAs[java.math.BigDecimal]("decimal")
      .compareTo(new java.math.BigDecimal("1234.5678")) === 0)
    assert(r.getAs[String]("duration") === "01:02:03") // TIME-normalized '1:2:3'
    assert(r.getAs[String]("enum") === "c")
    assert(r.getAs[Number]("bit").longValue === 3L) // run.sh 0x03 (bit(4))
    assert(r.getAs[String]("set") === "c")
    // render via date_format (session-tz controlled), not
    // Timestamp.toString (JVM-default-tz dependent) — the pin must not
    // depend on the machine's zone
    val timeStr = spark.read.parquet(s"$out/gencol.various_types")
      .select(date_format(col("time"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .collect()(0).getString(0)
    assert(timeStr === "1987-06-05 04:03:02.100")
    assert(r.getAs[String]("json") === s"""{"$sha":0.5625}""")
    // the headline pin: MySQL aes-256-cbc bytes with the folded 'key'
    // and the sha1-digest IV — 0xA876B03CFC8AF93D22D19E2220BD2375
    assert(r.getAs[Array[Byte]]("aes").map("%02X".format(_)).mkString
      === "A876B03CFC8AF93D22D19E2220BD2375")
    assert(r.getAs[String]("tz") === "1969-12-31 16:00:01") // tz=-08:00
  }
}
