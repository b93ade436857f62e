package graft.operators

import graft.SparkSpec

class HardNegativesSpec extends SparkSpec {

  test("hard negatives: k per anchor, all cross-label, scored by exact quantized dot") {
    val rows = SimilarityQueries.hardNegatives(spark, sf()).collect()
    // 5 anchors × 5 negatives
    assert(rows.length === 25)
    val byAnchor = rows.groupBy(_.getAs[Long]("anchor_id"))
    assert(byAnchor.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(byAnchor.values.forall(_.length === 5))
    // ranks are 1..k and scores non-increasing within an anchor
    byAnchor.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      val scores = sorted.map(_.getAs[Long]("score")).toSeq
      assert(scores === scores.sorted.reverse, s"scores not descending: $scores")
    }
    // every negative's label differs from its anchor's label
    val labels = graft.GraftSession.table(spark, sf(), "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("vec_id")) !== labels(r.getAs[Long]("anchor_id")))
    }
  }

  test("hard negatives plan: anchors broadcast, corpus unshuffled, window group-limits") {
    val df = SimilarityQueries.hardNegatives(spark, sf())
    val optimized = df.queryExecution.optimizedPlan.toString
    // the rank filter must rewrite to a group limit: each map partition
    // keeps k rows per anchor BEFORE the exchange — without it, the
    // window sorts corpus×anchors rows at 100 TB
    assert(optimized.contains("WindowGroupLimit"), optimized)
    val plan = df.queryExecution.executedPlan.toString
    // anchors ride a broadcast; the corpus never sort-merge-joins
    assert(plan.contains("Broadcast"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
