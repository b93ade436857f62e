package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `tests/error_summary` replayed over its own data:
  * two of three tables fail their gate, the third must import anyway
  * with its exact pins (run.sh: sum(id)=28, sum(k)=32 on `b`), and the
  * end-of-run summary must name EXACTLY the failed tables — count
  * header, per-table status line, and the error-destroy
  * recommendedAction (the reference's `checkpoint-error-destroy`).
  * Recovery: Ctl error-destroy + fixed data re-imports green.
  *
  * The reference induces the failures by pre-populating the target
  * with conflicting rows; the same observable (per-table checksum
  * failure with clean siblings) is induced here through the error
  * budget — a bad row in `a` and `c` under maxError=0.
  */
class ErrorSummarySpec extends SparkSpec {

  private val src = Paths.get("/root/reference/tests/error_summary/data")

  private def mkSource(withBadRows: Boolean): String = {
    val dir = Files.createTempDirectory("graft_errsum")
    Files.list(src).forEach(p => Files.copy(p, dir.resolve(p.getFileName)))
    if (withBadRows) Seq("a", "c").foreach { t =>
      Files.writeString(dir.resolve(s"error_summary.$t.0002.sql"),
        s"INSERT INTO $t VALUES (999, 'oops');\n")
    }
    dir.toString
  }

  test("failed tables summarize; clean sibling imports with its pins") {
    assume(Files.exists(src), "reference tests not present")
    val out = Files.createTempDirectory("graft_errsum_out").toString
    val state = Files.createTempDirectory("graft_errsum_state").toString
    val srcDir = mkSource(withBadRows = true)
    val cfg = Ingest.Config(srcDir, out,
      stateDir = Some(state), maxError = 0L)
    val reports = Ingest.run(spark, cfg)
    val byTable = reports.map(r => r.table -> r).toMap
    assert(!byTable("a").checksumOk && !byTable("c").checksumOk)
    assert(byTable("b").checksumOk)
    // run.sh pins: b is indeed imported
    val b = spark.read.parquet(s"$out/error_summary.b")
      .agg(sum(col("id")), sum(col("k"))).collect()(0)
    assert((b.getLong(0), b.getLong(1)) === ((28L, 32L)))
    // the summary names exactly a and c, never b
    val lines = Ingest.errorSummary(reports, cfg)
    assert(lines.head === """["tables failed to be imported"] [count=2]""")
    assert(lines.exists(_.contains("[table=`error_summary`.`a`] [status=checksum]")))
    assert(lines.exists(_.contains("[table=`error_summary`.`c`] [status=checksum]")))
    assert(!lines.exists(_.contains("`b`")), lines.mkString("\n"))
    assert(lines.tail.forall(_.contains("error-destroy")), "recommendedAction present")
    // state records the failures
    val stateText = Files.readString(Paths.get(state, "state.jsonl"))
    assert(stateText.contains("\"failed\""))

    // recovery: error-destroy the failed tables, fix the data IN PLACE
    // (the reference reruns over the same tests/ dir) and re-import
    Seq("error_summary.a", "error_summary.c").foreach { key =>
      Ctl.main(Array("error-destroy", state, out, key))
    }
    Seq("a", "c").foreach(t =>
      Files.delete(Paths.get(srcDir, s"error_summary.$t.0002.sql")))
    val fixed = Ingest.run(spark, cfg)
    assert(fixed.forall(_.checksumOk), fixed.map(r => r.table -> r.checksumOk))
    assert(Ingest.errorSummary(fixed,
      Ingest.Config("/x", "/y")).isEmpty, "clean run summarizes nothing")
    val a = spark.read.parquet(s"$out/error_summary.a")
      .agg(sum(col("id")), sum(col("k"))).collect()(0)
    assert((a.getLong(0), a.getLong(1)) === ((7L, 10L)))
    // b was already verified — the fixed run skips it, no duplicates
    assert(spark.read.parquet(s"$out/error_summary.b").count() === 2L)
  }
}
