package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch operators for corpus-scale cardinality questions where exact
  * distinct counting would shuffle every key: HLL sketches aggregate
  * map-side into a few KB per partition, MERGE across shards/days
  * (the property exact counts lack), and land within documented error
  * bounds. Not oracle-checkable (estimates are impl-specific), so the
  * accuracy and merge contracts pin here against exact ground truth.
  */
class SketchSpec extends SparkSpec {

  private lazy val orders = graft.GraftSession.table(spark, sf("sf0.01"), "orders")

  test("hll_sketch_agg estimates distinct keys within 5% of exact") {
    val exact = orders.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    val est = orders
      .select(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("e"))
      .collect()(0).getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("sketches merge across shards: union of halves equals whole estimate") {
    val whole = orders
      .select(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))))
      .collect()(0).getLong(0)
    val halves = orders
      .withColumn("shard", pmod(col("o_orderkey"), lit(2)))
      .groupBy("shard").agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = halves
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect()(0).getLong(0)
    // merging per-shard sketches must agree with the one-pass sketch —
    // the distributed-rollup contract (per-day sketches → monthly
    // distinct) that makes sketches worth shipping
    assert(merged === whole, s"merged=$merged whole=$whole")
  }

  test("approx_percentile brackets the exact percentile within accuracy") {
    val q = orders.select(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx"))
      .collect()(0).getDouble(0)
    val exactMedian = orders.stat.approxQuantile("o_totalprice", Array(0.5), 0.0)(0)
    val span = orders.agg(max(col("o_totalprice")) - min(col("o_totalprice")))
      .collect()(0).getDouble(0)
    assert(math.abs(q - exactMedian) / span < 0.01, s"approx=$q exact=$exactMedian")
  }
}
