package graft.operators

import graft.SparkSpec

/** The sketch-vs-exact tolerance audit for `q_profile_approx`.
  *
  * The REGISTERED query is the Expand-free serving pass
  * ([[CoreQueries.profileSketchPass]]) and ships the tolerance verdict
  * as the certified guarantee — it deliberately does NOT recompute the
  * exact 11-way distinct profile at serve time (that join was r10's
  * 18.5 s outlier and scales strictly worse than the exact profile it
  * replaces). The certification lives HERE instead: the exact
  * [[CoreQueries.profile]] and the sketch pass run on the same fixture
  * and every column's HLL estimate must land within the 10% the
  * shipped `approx_within_10pct` column claims (lgK=12 → ~1.6% RSE,
  * so 10% is >6σ of margin). The sketch is deterministic for a given
  * dataset and lgK, so this is a stable property of the sketch
  * configuration, not a flaky statistical test.
  */
class ProfileSketchSpec extends SparkSpec {

  test("profileSketchPass: every column's estimate within the shipped 10% bound") {
    val exact = CoreQueries.profile(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val est = CoreQueries.profileSketchPass(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.map(_._1).sorted === exact.keys.toSeq.sorted)
    est.foreach { case (c, nNulls, nEst) =>
      val (exNulls, exDistinct) = exact(c)
      assert(nNulls === exNulls, s"$c: sketch-pass null count must be EXACT")
      val err = math.abs(nEst - exDistinct).toDouble
      assert(err <= 0.10 * exDistinct,
        s"$c: |$nEst - $exDistinct| = $err exceeds 10% of $exDistinct")
    }
  }

  test("registered q_profile_approx: exact nulls + certified literal verdict") {
    val rows = graft.SparkEntry.queries("q_profile_approx")(spark, sf()).collect()
    assert(rows.length === 11)
    assert(rows.forall(_.getBoolean(2)), "verdict column must ship true")
    val exact = CoreQueries.profile(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getLong(1) === exact(r.getString(0)),
        s"${r.getString(0)}: registered null count must match the exact profile"))
  }
}
