package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing is the pre-shuffle: both sides of a recurring join are
  * written hash-bucketed on the join key, so every subsequent join
  * co-locates by bucket id and the per-query Exchange disappears — at
  * 100 TB that converts the dominant nightly shuffle into a one-time
  * layout cost. The plan, not the result, is the test subject.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-on-key tables join with no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_buckets")
    val orders = graft.GraftSession.table(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.GraftSession.table(spark, sf(), "customer")
      .select("c_custkey", "c_name")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$tmp/b_orders").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$tmp/b_customer").saveAsTable("b_customer")

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-or-not decision to be about bucketing, not size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_name").agg(sum("o_totalprice"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join's inputs (printed below the SortMergeJoin node) read
      // bucketed scans directly — no exchange; the only acceptable one
      // sits above the join, for the final aggregate
      val joinInputs = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinInputs.contains("Exchange hashpartitioning"), plan)
      assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
      // and it still computes the right thing
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
