package graft.transform

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter pushdown: when a selective filter sits on one
  * side of a join, the optimizer builds a bloom filter from that side
  * and applies it to the OTHER side's scan — at 100 TB the probe-side
  * scan skips most rows before the shuffle. Thresholds forced low so
  * the sf fixture triggers the same injection a real fact table would.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective join side injects a bloom filter into the big side's scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // plain scans: the injection rule wants a scan-shaped application
      // side (the small-file fan-out Repartition in GraftSession.table
      // hides the scan — irrelevant at real scale, where files are big
      // enough that fanOut is a no-op)
      val lineitem = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
        .where(col("o_orderstatus") === "P") // selective creation side
      val j = lineitem.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"), optimized)
      assert(j.collect().nonEmpty)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
