package graft.operators

import graft.SparkSpec

/** Two-level SemDeDup: verdict parity with the flat form, planted-copy
  * recovery, the sub-quadratic plan shape (per-row assignment cost is
  * the row's own group's centroid count, never k_total), and the
  * hierarchy's k-shape rule.
  */
class SemDedupHierSpec extends SparkSpec {

  test("hier verdicts == flat verdicts (cell ids aside)") {
    // the planted corpus has no natural near-dups (max natural cosine
    // ≈ 0.47), so BOTH forms must find exactly the planted exact-copy
    // pairs with identical cosine and drop decisions — the hierarchy
    // renames cells but must not change a single verdict
    def strip(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cosine", "drop_id").collect().toSeq
    val flat = strip(SimilarityQueries.semDedup(spark, sf()))
    val hier = strip(SimilarityQueries.semDedupHier(spark, sf()))
    assert(hier === flat)
    assert(hier.nonEmpty)
  }

  test("every planted copy pairs with its original and the copy is dropped") {
    val rows = SimilarityQueries.semDedupHier(spark, sf()).collect()
    val n = graft.GraftSession.table(spark, sf(), "embeddings").count()
    val copyPairs = rows.filter(r => r.getLong(2) === r.getLong(1) + 100000)
    assert(copyPairs.length === n.toInt)
    copyPairs.foreach { r =>
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
      // exact centroid-dot tie (identical vectors share coarse AND
      // fine cell) → drop the higher id (the copy)
      assert(r.getLong(4) === r.getLong(2), s"pair ${r.getLong(1)}")
    }
  }

  test("pair generation blocks on the (coarse, fine) cell — an equi-join") {
    val plan = SimilarityQueries.semDedupHier(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("deterministic across runs (both training levels included)") {
    val a = SimilarityQueries.semDedupHier(spark, sf()).collect().toSeq
    val b = SimilarityQueries.semDedupHier(spark, sf()).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("hierarchy shape: k_c·k_f covers k_total with ≈ √k levels") {
    Seq(1L, 2048L, 2048L * 8, 2048L * 100, 1000L * 1000 * 1000).foreach { n =>
      val kt = SimilarityQueries.semDedupK(n)
      val (kc, kf) = SimilarityQueries.semDedupHierKs(n)
      assert(kc.toLong * kf >= kt, s"n=$n: $kc x $kf < $kt")
      // each level stays ≈ √k_total — the whole point: per-row
      // assignment cost kc + kf, never kt
      assert(kc <= math.ceil(math.sqrt(kt.toDouble)).toInt, s"n=$n")
      assert(kf <= kc + 1, s"n=$n kc=$kc kf=$kf")
      assert((kc + kf).toDouble <= 2 * math.sqrt(kt.toDouble) + 2, s"n=$n")
    }
  }

  test("grouped Lloyd trains an independent quantizer per group") {
    import org.apache.spark.sql.functions._
    // two groups planted far apart on the first axis; each group's
    // fine centroids must converge inside its own group's data
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      val g = i % 2
      val base = if (g == 0) 1.0f else -1.0f
      (i.toLong, g, Array.fill(4)(base * (1.0f + (i / 2 % 5) * 0.01f)).toSeq)
    }
    val df = rows.toDF("vec_id", "g", "embedding")
    val cents = KMeans.fitGrouped(df, "vec_id", "embedding", "g",
      nGroups = 2, kPerGroup = 2, iters = 2)
    assert(cents.length === 2)
    assert(cents(0).nonEmpty && cents(1).nonEmpty)
    assert(cents(0).forall(_.forall(_ > 0)), cents(0).map(_.toSeq).toSeq)
    assert(cents(1).forall(_.forall(_ < 0)), cents(1).map(_.toSeq).toSeq)
  }
}
