package graft

/** Registry-wide analysis smoke: every registered query must at least
  * ANALYZE against the current testdata. This is the net that was
  * missing when the regenerated events.parquet changed `ts`'s type and
  * 13 registered queries silently failed analysis for two rounds —
  * execution-level gates (Verify, Bench) run out-of-band, but this
  * runs on every `sbt test`.
  *
  * Forcing `.schema` builds and analyzes the full logical plan without
  * executing it, so the sweep is cheap for MOST queries; builders with
  * eager construction-time work still execute it here — fixture
  * writes, driver-side inits, and notably q_winnow_pairs/q_winnow_align
  * whose builders localCheckpoint(true) the full winnow relation — so
  * this test really runs a few heavy jobs. That cost is accepted: it is
  * exactly what the driver's Verify pays, and memoizing the checkpoint
  * across queries would break under Bench's synchronous unpersist-all
  * between measurements (a freed localCheckpoint is unrecoverable).
  */
class RegistrySpec extends SparkSpec {

  test("every registered query analyzes against the current testdata") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf()).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle entry names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("flagship entry returns rows on the smallest sf") {
    assert(SparkEntry.entry(spark).limit(1).count() === 1)
  }
}
