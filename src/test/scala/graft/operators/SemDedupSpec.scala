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

  test("k grows with the corpus: mean cell population stays bounded") {
    // the contract in the signature: k = max(8, ceil(n/target)), so the
    // MEAN cell population never exceeds the target no matter the n —
    // the within-cell pair join stays blocked-quadratic, not quadratic
    val t = SimilarityQueries.SemDedupCellTarget
    Seq(1L, t, t * 8, t * 8 + 1, t * 1000, 1000L * 1000 * 1000).foreach { n =>
      val k = SimilarityQueries.semDedupK(n)
      assert(k >= 8, s"n=$n")
      assert(n.toDouble / k <= t, s"n=$n k=$k mean=${n / k}")
    }
    assert(SimilarityQueries.semDedupK(t * 8 + 1) === 9, "crosses the floor")
  }

  test("derived k drives the clustering: folded corpus stays bounded per cell") {
    import org.apache.spark.sql.functions._
    // 4× fold of the embeddings under shifted ids — the ScalingProbe
    // shape; with a test-sized target the derived k must exceed the
    // floor and the realized MEAN population must honor the bound
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val folded = (0 until 4).map(i =>
      base.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L)))
      .reduce(_ unionByName _)
    val n = folded.count()
    val target = 64L
    val k = math.max(8L, math.ceil(n.toDouble / target).toLong).toInt
    assert(k > 8, s"fold must cross the floor: n=$n k=$k")
    val m = KMeans.fit(folded, "vec_id", "embedding", k = k, iters = 2,
      withInertia = false)
    val pops = folded
      .select(KMeans.cellOf(col("embedding"), m.centroids).as("cell"))
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(pops.sum === n)
    assert(n.toDouble / k <= target, "mean population within the target")
  }
}
