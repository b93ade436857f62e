package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/checkpoint_engines` replayed over its own
  * data: the import is crashed again and again (one more chunk batch
  * survives each attempt — the reference's kill-per-engine failpoint
  * loop), until a run finally completes; a further run must be a
  * checkpoint no-op. Pins are run.sh's: a → count 4 / sum 10,
  * b → count 4 / sum 46.
  */
class CheckpointEnginesSpec extends SparkSpec {

  private val src = Paths.get("/root/reference/tests/checkpoint_engines/data")

  test("crash-per-batch loop converges; rerun is a checkpoint no-op") {
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory("graft_cpeng_out").toString
    val state = Files.createTempDirectory("graft_cpeng_state").toString
    // chunkBytes above every file size: each tiny file is ONE chunk
    // (b.1.sql carries a multi-line block comment, legal only in a
    // whole-file chunk), so batches advance file by file — the
    // reference's engine granularity
    val crashy = Ingest.Config(src.toString, out, stateDir = Some(state),
      strictFormat = true, chunkBytes = 4096L, chunkBatch = 1,
      failpointAfterBatches = Some(1))
    // run.sh loops run_lightning until it exits 0 (each attempt gets
    // one batch further); bound the loop well above the batch count
    var done = false
    var attempts = 0
    while (!done && attempts < 20) {
      attempts += 1
      try { Ingest.run(spark, crashy); done = true }
      catch { case e: IllegalStateException
        if e.getMessage.contains("failpoint") => () }
    }
    assert(done, s"import never converged in $attempts attempts")
    assert(attempts > 1, "the failpoint did crash at least one attempt")
    def pins(): Unit = {
      val a = spark.read.parquet(s"$out/cpeng.a")
        .agg(count(lit(1)), sum(col("c"))).collect()(0)
      assert((a.getLong(0), a.getLong(1)) === ((4L, 10L)))
      val b = spark.read.parquet(s"$out/cpeng.b")
        .agg(count(lit(1)), sum(col("c"))).collect()(0)
      assert((b.getLong(0), b.getLong(1)) === ((4L, 46L)))
    }
    pins()
    // "Verify checkpoint no-op": nothing re-imports, pins unchanged
    val noop = Ingest.run(spark, crashy.copy(failpointAfterBatches = None))
    assert(noop.forall(_.skipped), noop.map(r => r.table -> r.skipped))
    pins()
  }
}
