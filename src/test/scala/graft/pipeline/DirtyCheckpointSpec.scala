package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The reference's `tests/checkpoint_dirty_tableid` analog over its
  * own data: a checkpoint that survives while its target table is
  * dropped out-of-band no longer describes anything — the rerun must
  * STOP with the illegal-checkpoint message and a checkpoint-remove
  * suggestion (run.sh greps both), never skip-as-success or append
  * onto a phantom base; after removal the import runs clean.
  */
class DirtyCheckpointSpec extends SparkSpec {

  private val src = Paths.get("/root/reference/tests/checkpoint_dirty_tableid/data")

  test("dropped target + surviving checkpoint stops; remove recovers") {
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory("graft_cpdt_out").toString
    val state = Files.createTempDirectory("graft_cpdt_state").toString
    val cfg = Ingest.Config(src.toString, out, stateDir = Some(state))
    val first = Ingest.run(spark, cfg)
    assert(first.forall(_.checksumOk))
    // the run.sh shape: the target database is dropped while the
    // checkpoint lives on
    graft.GraftSession.deleteRec(Paths.get(out, "cpdt.t"))
    val e = intercept[IllegalStateException] { Ingest.run(spark, cfg) }
    assert(e.getMessage.contains("illegal checkpoint"), e.getMessage)
    assert(e.getMessage.contains("cpdt.t"), e.getMessage)
    assert(e.getMessage.contains("checkpoint-remove"), e.getMessage)
    // reference recovery: remove the checkpoints, rerun lands clean
    Ctl.main(Array("checkpoint-remove", state, "all"))
    val rerun = Ingest.run(spark, cfg)
    assert(rerun.forall(r => r.checksumOk && !r.skipped))
    val rows = spark.read.parquet(s"$out/cpdt.t").collect()
    assert(rows.length === 1)
    assert(rows(0).getTimestamp(0).toInstant ===
      java.time.Instant.parse("1999-09-09T09:09:09Z"))
  }
}
