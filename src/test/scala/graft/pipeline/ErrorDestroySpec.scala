package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The reference's `tests/checkpoint_error_destroy` replayed over its
  * own data: the bad corpus ('1111-11-11 11:11:11' — below TIMESTAMP's
  * epoch floor) fails the import 8 times in a row, `error-destroy all`
  * clears the wreckage between attempts (never leaking state or
  * output across retries), and the good corpus then imports with
  * run.sh's pin (`x: 1999-09-09 09:09:09`).
  */
class ErrorDestroySpec extends SparkSpec {

  private val base = Paths.get("/root/reference/tests/checkpoint_error_destroy")

  test("8 failed imports + error-destroy all each time; good data lands") {
    assume(Files.exists(base), "reference tests not present")
    val out = Files.createTempDirectory("graft_cped_out").toString
    val state = Files.createTempDirectory("graft_cped_state").toString
    (1 to 8).foreach { i =>
      val rep = Ingest.run(spark, Ingest.Config(
        base.resolve("bad-data").toString, out,
        stateDir = Some(state), maxError = 0L))
      assert(rep.exists(r => !r.checksumOk), s"attempt $i must fail")
      Ctl.main(Array("error-destroy", state, out, "all"))
      // destroyed: no failed record survives, no output dir remains
      assert(!Files.readString(Paths.get(state, "state.jsonl"))
        .lines().anyMatch(l => JobState.parse(l).exists(_.status == "failed")))
      assert(!Files.exists(Paths.get(out, "cped.t")), s"attempt $i output")
    }
    val good = Ingest.run(spark, Ingest.Config(
      base.resolve("good-data").toString, out,
      stateDir = Some(state), maxError = 0L))
    assert(good.forall(_.checksumOk))
    // run.sh pin: x: 1999-09-09 09:09:09
    val rows = spark.read.parquet(s"$out/cped.t").collect()
    assert(rows.length === 1)
    assert(rows(0).getTimestamp(0).toInstant ===
      java.time.Instant.parse("1999-09-09T09:09:09Z"))
  }
}
