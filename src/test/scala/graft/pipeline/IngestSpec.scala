package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  private def mkFixture(): String = {
    val root = Files.createTempDirectory("graft_ingest_spec").toString
    def w(name: String, s: String) = Files.writeString(Paths.get(root, name), s)
    w("d.t-schema.sql",
      "CREATE TABLE t (id int NOT NULL, v varchar(10), PRIMARY KEY (id));")
    w("d.t.0001.csv", "1,\"a\"\n2,\"b\"\n")
    w("d.t.0002.csv", "3,\\N\n")
    root
  }

  test("ingest restores a CSV table with verified checksum") {
    val src = mkFixture()
    val out = Files.createTempDirectory("graft_ingest_out").toString
    val reports = Ingest.run(spark, Ingest.Config(src, out))
    assert(reports.length === 1)
    val r = reports.head
    assert(r.table === "t" && r.nRows === 3 && r.checksumOk && !r.skipped)
    val back = spark.read.parquet(s"$out/d.t").collect()
      .map(x => (x.getInt(0), if (x.isNullAt(1)) null else x.getString(1))).sortBy(_._1)
    assert(back.toSeq === Seq((1, "a"), (2, "b"), (3, null)))
  }

  test("re-run with job state skips verified tables") {
    val src = mkFixture()
    val out = Files.createTempDirectory("graft_ingest_out2").toString
    val state = Files.createTempDirectory("graft_ingest_state").toString
    val first = Ingest.run(spark, Ingest.Config(src, out, stateDir = Some(state)))
    assert(first.forall(r => !r.skipped && r.checksumOk))
    val second = Ingest.run(spark, Ingest.Config(src, out, stateDir = Some(state)))
    assert(second.forall(_.skipped))
    assert(second.head.nRows === first.head.nRows)
  }

  test("job state round-trips records") {
    val r = JobState.Record("db.t", "verified", 42L, -12345L)
    assert(JobState.parse(JobState.render(r)) === Some(r))
  }
}
