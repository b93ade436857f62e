package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/checkpoint_timestamp` replayed over its own
  * data: 98 all-default rows into `ts datetime(6) NOT NULL DEFAULT
  * current_timestamp(6)` through a MID-IMPORT CRASH and resume must
  * land run.sh's pins — COUNT(ts)=98 and COUNT(DISTINCT ts)=1. The
  * reference anchors the default to its task timestamp; the engine
  * stores the task timestamp in the job-state record and reuses it on
  * resume, so a crash between chunk batches cannot split the table
  * across two "now"s.
  */
class CheckpointTimestampSpec extends SparkSpec {

  private val src = Paths.get("/root/reference/tests/checkpoint_timestamp/data")

  test("all-default current_timestamp rows land ONE ts through crash-resume") {
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory("graft_cpts_out").toString
    val state = Files.createTempDirectory("graft_cpts_state").toString
    // chunked import with a failpoint crash after the first batch —
    // the run.sh FailIfImportedChunk loop shape
    val cfg = Ingest.Config(src.toString, out, stateDir = Some(state),
      strictFormat = true, chunkBytes = 256L, chunkBatch = 1,
      failpointAfterBatches = Some(1))
    val crashed = intercept[IllegalStateException] { Ingest.run(spark, cfg) }
    assert(crashed.getMessage.contains("failpoint"))
    // resume without the failpoint — same state, same task timestamp
    val reports = Ingest.run(spark, cfg.copy(failpointAfterBatches = None))
    assert(reports.forall(_.checksumOk))
    val r = spark.read.parquet(s"$out/cpts.cpts")
      .agg(count(col("ts")), countDistinct(col("ts"))).collect()(0)
    // run.sh pins: a: 98, b: 1
    assert(r.getLong(0) === 98L, "every all-default row carries a ts")
    assert(r.getLong(1) === 1L, "ONE distinct task timestamp across the crash")
  }
}
