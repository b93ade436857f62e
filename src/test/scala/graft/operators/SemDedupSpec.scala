package graft.operators

import graft.SparkSpec

/** SemDeDup: planted-copy recovery, the keep-far drop rule, and the
  * per-cell (never corpus-wide) pair-generation plan shape.
  */
class SemDedupSpec extends SparkSpec {

  test("every planted copy pairs with its original and the copy is dropped") {
    val rows = SimilarityQueries.semDedup(spark, sf()).collect()
    val n = graft.GraftSession.table(spark, sf(), "embeddings").count()
    val copyPairs = rows.filter(r => r.getLong(2) === r.getLong(1) + 100000)
    // every vector finds its exact copy (cosine 1, same cell — the
    // quantizer cannot split identical vectors)
    assert(copyPairs.length === n.toInt)
    copyPairs.foreach { r =>
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
      // exact centroid-dot tie → drop the higher id (the copy)
      assert(r.getLong(4) === r.getLong(2), s"pair ${r.getLong(1)}")
    }
    // keep-far policy: every dropped member has centroid similarity
    // >= its partner's by construction — spot-check via the rule's
    // invariant: drop_id is always one of the pair
    rows.foreach(r => assert(r.getLong(4) === r.getLong(1) || r.getLong(4) === r.getLong(2)))
  }

  test("pair generation blocks on the cell — an equi-join, never a cartesian") {
    val plan = SimilarityQueries.semDedup(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("deterministic across runs (training included)") {
    val a = SimilarityQueries.semDedup(spark, sf()).collect().toSeq
    val b = SimilarityQueries.semDedup(spark, sf()).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
