package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/local_backend` DATA legs, replayed on its own
  * corpus and configs (the cpeng 3-file dump, run.sh pins a → count 4 /
  * sum 10, b → count 4 / sum 46):
  *
  *  - the `config.toml` import, crash-per-batch convergence, and the
  *    "Verify checkpoint no-op" rerun (run.sh's FailBeforeDataEngine
  *    Imported loop over ENGINE_COUNT, then the clean pass);
  *  - the `file.toml` leg's `[[black-white-list.do-tables]]` filter
  *    (only cpeng.a imports) with a crash-resume inside the filtered
  *    run;
  *  - the `mysql.toml` leg's checkpoint driver: no MySQL server exists
  *    here, so the pin is the LOUD reject (the reference would dial the
  *    DSN; silently falling back to the file driver would be a lie).
  *
  * Scoped out (engine-ctl infrastructure, not data semantics — see
  * SURVEY §2 D5): `--check-local-storage` intermediate-file audits,
  * and the GO_FAILPOINTS notleader/epochnotmatch injections, which
  * exercise TiKV ingest-RPC retries with no Spark analog.
  */
class LocalBackendSpec extends SparkSpec {

  private val base = Paths.get("/root/reference/tests/local_backend")

  private def pins(out: String): Unit = {
    val a = spark.read.parquet(s"$out/cpeng.a")
      .agg(count(lit(1)), sum(col("c"))).collect()(0)
    assert((a.getLong(0), a.getAs[Number](1).longValue) === ((4L, 10L)))
    val b = spark.read.parquet(s"$out/cpeng.b")
      .agg(count(lit(1)), sum(col("c"))).collect()(0)
    assert((b.getLong(0), b.getAs[Number](1).longValue) === ((4L, 46L)))
  }

  /** The corpus config with the sandbox's source dir injected under its
    * own `[mydumper]` header (appending at EOF would land inside the
    * last section — file.toml ends inside a do-tables array entry).
    */
  private def loadCorpusToml(name: String, out: String): Ingest.Config = {
    val toml = Files.readString(base.resolve(name)).replace("[mydumper]",
      s"[mydumper]\ndata-source-dir = '${base.resolve("data")}'")
    TomlConfig.load(toml, targetDirOverride = Some(out)).config
  }

  test("config.toml: crash-per-batch loop converges; rerun is a checkpoint no-op") {
    assume(Files.exists(base), "reference tests not present")
    val out = Files.createTempDirectory("graft_lb_out").toString
    // batch granularity: each tiny file is one chunk, one chunk per
    // batch (the corpus' batch-size=50 exists to force multi-batch
    // imports; b.1.sql's block comment is legal only in a whole-file
    // chunk)
    val crashy = loadCorpusToml("config.toml", out).copy(
      strictFormat = true, chunkBytes = 4096L, chunkBatch = 1,
      failpointAfterBatches = Some(1))
    assert(crashy.stateDir.isDefined, "checkpoint.enable must map to a stateDir")
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
    pins(out)
    val noop = Ingest.run(spark, crashy.copy(failpointAfterBatches = None))
    assert(noop.forall(_.skipped), noop.map(r => r.table -> r.skipped))
    pins(out)
  }

  test("file.toml: do-tables filters to cpeng.a, crash-resume included") {
    assume(Files.exists(base), "reference tests not present")
    val out = Files.createTempDirectory("graft_lb_file").toString
    val cfg = loadCorpusToml("file.toml", out).copy(
      strictFormat = true, chunkBytes = 4096L, chunkBatch = 1,
      failpointAfterBatches = Some(1))
    var done = false
    var attempts = 0
    while (!done && attempts < 20) {
      attempts += 1
      try { Ingest.run(spark, cfg); done = true }
      catch { case e: IllegalStateException
        if e.getMessage.contains("failpoint") => () }
    }
    assert(done && attempts > 1, s"converged=$done attempts=$attempts")
    val a = spark.read.parquet(s"$out/cpeng.a")
      .agg(count(lit(1)), sum(col("c"))).collect()(0)
    assert((a.getLong(0), a.getAs[Number](1).longValue) === ((4L, 10L)))
    assert(!Files.exists(Paths.get(s"$out/cpeng.b")),
      "black-white-list must keep cpeng.b out entirely")
  }

  test("mysql.toml: the mysql checkpoint driver rejects loudly") {
    assume(Files.exists(base), "reference tests not present")
    val out = Files.createTempDirectory("graft_lb_mysql").toString
    val e = intercept[IllegalArgumentException] {
      loadCorpusToml("mysql.toml", out)
    }
    assert(e.getMessage.contains("driver"), e.getMessage)
  }
}
