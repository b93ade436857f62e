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
    val schemas = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        try { name -> Right(fn(spark, sf()).schema) }
        catch { case e: Throwable =>
          name -> Left(s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
        }
    }
    val failures = schemas.collect { case (n, Left(m)) => s"$n: $m" }
    assert(failures.isEmpty, failures.mkString("\n"))

    // House numeric policy: no registered query may ship a bare DECIMAL
    // output column to the driver — Spark's and DuckDB's decimal values
    // stringify differently in the driver's canonicalization even when
    // numerically identical (the r9 q_lenient_cast hash-fail). Decimals
    // must cross the boundary as STRING (q_various_types_dec convention)
    // or a scaled integer.
    val decimals = schemas.collect {
      case (n, Right(s)) =>
        val offending = s.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
            f.name
        }
        (n, offending)
    }.filter(_._2.nonEmpty)
    assert(decimals.isEmpty,
      "bare DECIMAL output columns (stringify them per q_various_types_dec): " +
        decimals.map { case (n, cs) => s"$n(${cs.mkString(",")})" }.mkString(", "))
  }

  test("every oracle entry names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("flagship entry returns rows on the smallest sf") {
    assert(SparkEntry.entry(spark).limit(1).count() === 1)
  }
}
