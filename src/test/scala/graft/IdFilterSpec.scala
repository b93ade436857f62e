package graft

import org.apache.spark.sql.functions._

/** The cohort-id filter's two plan shapes ([[GraftSession.filterIdIn]]
  * / [[GraftSession.filterIdNotIn]]): people-scale cohorts keep the
  * literal pushed-down In plan bit-for-bit (row-group pruning at the
  * scan); a batch erasure campaign (10⁵ ids) runs as a broadcast
  * semi/anti join instead of building a 10⁵-literal expression tree —
  * the plan-size cliff the threshold exists to avoid.
  */
class IdFilterSpec extends SparkSpec {

  test("small cohorts keep the pushed-down literal In plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idf").toString
    spark.range(0, 10000).select(col("id").as("doc_id"),
      (col("id") * 7).as("payload"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val df = spark.read.parquet(s"$dir/t.parquet")
    val small = GraftSession.filterIdIn(df, "doc_id", Seq(3L, 5L, 8L))
    assert(small.collect().map(_.getLong(0)).sorted === Array(3L, 5L, 8L))
    val plan = small.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(doc_id"),
      s"small cohort must stay a pushed-down literal In:\n$plan")
    assert(!plan.toLowerCase.contains("join"),
      "small cohort must not pay a join")
    // ...and the anti leg
    val smallNot = GraftSession.filterIdNotIn(df, "doc_id", Seq(3L, 5L, 8L))
    assert(smallNot.count() === 10000L - 3)
    assert(!smallNot.queryExecution.executedPlan.toString
      .toLowerCase.contains("join"))
  }

  test("a 1e5-id cohort runs as a broadcast semi/anti join — no plan-size cliff") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idf2").toString
    spark.range(0, 50000).select(col("id").as("vec_id"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val df = spark.read.parquet(s"$dir/t.parquet")
    // 100k-id cohort, half hitting the relation
    val ids: Seq[Long] = (0L until 100000L).map(_ * 2)
    val t0 = System.nanoTime()
    val hit = GraftSession.filterIdIn(df, "vec_id", ids)
    val n = hit.count()
    val planMs = (System.nanoTime() - t0) / 1e6
    assert(n === 25000L, s"even ids below 50000: $n")
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"large cohort must be a semi join:\n${plan.take(800)}")
    assert(!plan.contains("In(vec_id"),
      "large cohort must not build a literal In tree")
    // the whole analyze+optimize+execute round stays interactive —
    // generous bound, the pre-fix literal tree took far longer just
    // to optimize (every rule pass walks 1e5 literals)
    assert(planMs < 60000, s"1e5-id filter took ${planMs}ms")
    val miss = GraftSession.filterIdNotIn(df, "vec_id", ids)
    assert(miss.count() === 25000L)
    assert(miss.queryExecution.executedPlan.toString.contains("LeftAnti"))
  }

  test("filterIdNotIn drops a NULL id identically on BOTH sides of the threshold") {
    // id columns are null-free by contract, but the two plan shapes
    // must not DISAGREE on a null that slips through: `!isin` drops
    // it (three-valued NOT IN), and the LeftAnti leg pins the same
    // semantics with an explicit isNotNull — same call, same rows,
    // at any cohort size
    import spark.implicits._
    val df = Seq[Option[Long]](Some(1L), Some(2L), None)
      .toDF("doc_id")
    val small = GraftSession.filterIdNotIn(df, "doc_id", Seq(1L))
    assert(small.collect().map(_.get(0)) === Array(2L))
    val bigCohort = 1L +: (100L until 110000L)
    val large = GraftSession.filterIdNotIn(df, "doc_id", bigCohort)
    assert(large.collect().map(_.get(0)) === Array(2L),
      "the join leg must drop the NULL row like the literal leg does")
  }
}
