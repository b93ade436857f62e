package graft.pipeline

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Maintenance verbs over the job state (`tidb-lightning-ctl` parity:
  * checkpoint-dump / checkpoint-remove / error-destroy; reference
  * `cmd/tidb-lightning-ctl/main.go:45-97`).
  */
class CtlSpec extends AnyFunSuite {

  private def mkState(): String = {
    val dir = Files.createTempDirectory("graft_ctl_state").toString
    val st = new JobState(Some(dir))
    st.put(JobState.Record("d.a", "verified", 10, 1, 100, Seq("/x/a.csv")))
    st.put(JobState.Record("d.b", "failed", 0, 0))
    dir
  }

  test("checkpoint-remove drops one table's state") {
    val dir = mkState()
    Ctl.main(Array("checkpoint-remove", dir, "d.b"))
    val st = new JobState(Some(dir))
    assert(st.get("d.a").map(_.status) === Some("verified"))
    assert(st.get("d.b") === None)
  }

  test("checkpoint-remove all clears every record") {
    val dir = mkState()
    Ctl.main(Array("checkpoint-remove", dir, "all"))
    val st = new JobState(Some(dir))
    assert(st.get("d.a") === None && st.get("d.b") === None)
  }

  test("error-destroy deletes the staged output and resets state") {
    val dir = mkState()
    val target = Files.createTempDirectory("graft_ctl_target")
    val staged = Files.createDirectories(target.resolve("d.b"))
    Files.writeString(staged.resolve("part-0000.parquet"), "junk")
    Ctl.main(Array("error-destroy", dir, target.toString, "d.b"))
    assert(!Files.exists(staged))
    val st = new JobState(Some(dir))
    assert(st.get("d.b") === None)
    assert(st.get("d.a").isDefined) // untouched
  }

  test("pause/resume toggle the spool's pause file idempotently") {
    val spool = Files.createTempDirectory("graft_ctl_spool").toString
    Ctl.main(Array("pause", spool))
    assert(Files.exists(Paths.get(spool, "pause")))
    Ctl.main(Array("pause", spool)) // second pause is a no-op, not a crash
    Ctl.main(Array("resume", spool))
    assert(!Files.exists(Paths.get(spool, "pause")))
    Ctl.main(Array("resume", spool)) // resume when not paused is fine
  }
}
