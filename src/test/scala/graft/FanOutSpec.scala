package graft

import org.apache.spark.sql.functions._

/** GraftSession.fanOut: single-split scans are widened to the session's
  * parallelism; scans that already feed the cores are left untouched.
  */
class FanOutSpec extends SparkSpec {

  test("single-row-group table fans out to the session parallelism") {
    val df = GraftSession.table(spark, sf("sf0.01"), "documents")
    assert(df.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }

  test("a scan with enough splits is returned untouched") {
    // 8 part-files ≥ 2×4 cores → the fan-out condition must not fire
    val tmp = java.nio.file.Files.createTempDirectory("graft_fanout").toString
    spark.range(0, 1000).toDF("doc_id")
      .withColumn("text", lit("alpha beta gamma"))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", lit(16L))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val df = GraftSession.table(spark, tmp, "documents")
    // the scan packs the 8 files into ≥ cores/2 splits on its own, so
    // no fan-out exchange may be inserted
    assert(df.rdd.getNumPartitions * 2 > spark.sparkContext.defaultParallelism)
    assert(df.queryExecution.executedPlan.toString.indexOf("RoundRobin") === -1)
  }

  test("filter pushdown survives the fan-out exchange") {
    val df = GraftSession.table(spark, sf("sf0.01"), "documents")
      .where(col("doc_id") === 42L).select("doc_id", "lang")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)"), plan)
    val rows = df.collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 42L)
  }
}
