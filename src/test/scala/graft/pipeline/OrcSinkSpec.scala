package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The ORC output-format knob (`tikv-importer.output-format = "orc"`):
  * one e2e leg through the same sorted/partitioned sink, with the
  * post-import checksum read-back gate green — the read-back follows
  * the configured format, so the CRC64 whole-table verification runs
  * against the ORC files the import actually wrote.
  */
class OrcSinkSpec extends SparkSpec {

  private def mkFixture(): String = {
    val root = Files.createTempDirectory("graft_orc_spec").toString
    def w(name: String, s: String) = Files.writeString(Paths.get(root, name), s)
    w("d.t-schema.sql",
      "CREATE TABLE t (id int NOT NULL, v varchar(10), PRIMARY KEY (id));")
    w("d.t.0001.csv", (1 to 200).map(i => s"""$i,"val_$i"""").mkString("", "\n", "\n"))
    root
  }

  test("orc e2e: import writes ORC, checksum read-back verifies, resume skips") {
    val root = mkFixture()
    val out = Files.createTempDirectory("graft_orc_out").toString
    val stateDir = Files.createTempDirectory("graft_orc_state").toString
    val cfg = Ingest.Config(root, out, stateDir = Some(stateDir),
      outputFormat = "orc")
    val reports = Ingest.run(spark, cfg)
    assert(reports.length === 1 && reports.head.checksumOk && !reports.head.skipped)
    assert(reports.head.nRows === 200)
    // the sink actually wrote ORC (no parquet files anywhere)
    val files = Files.list(Paths.get(out, "d.t"))
    val names = try {
      val b = Seq.newBuilder[String]
      files.forEach(p => b += p.getFileName.toString)
      b.result()
    } finally files.close()
    assert(names.exists(_.endsWith(".orc")), s"no .orc files in $names")
    assert(!names.exists(_.endsWith(".parquet")), s"parquet leaked into $names")
    // the rows round-trip through the ORC reader
    val back = spark.read.orc(s"$out/d.t").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(back.length === 200)
    assert(back.map(_._1).sorted.toSeq === (1 to 200))
    assert(back.toMap.apply(37) === "val_37")
    // a second run sees the verified table and skips (the state gate
    // reads the same format)
    assert(Ingest.run(spark, cfg).head.skipped)
  }

  test("the TOML key maps and validates") {
    val root = mkFixture()
    val loaded = TomlConfig.load(
      s"""[mydumper]
         |data-source-dir = "$root"
         |[tikv-importer]
         |output-format = "ORC"
         |""".stripMargin, targetDirOverride = Some("/tmp/ignored"))
    assert(loaded.config.outputFormat === "orc")
    intercept[IllegalArgumentException] {
      TomlConfig.load(
        s"""[mydumper]
           |data-source-dir = "$root"
           |[tikv-importer]
           |output-format = "avro"
           |""".stripMargin, targetDirOverride = Some("/tmp/ignored"))
    }
  }
}
