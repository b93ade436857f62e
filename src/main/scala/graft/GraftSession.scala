package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by SparkEntry / Verify / Bench.
  *
  * Tables are the driver-generated TPC-H-ish corpus described in
  * /root/repo/TESTDATA.md (one parquet file per table under the sf dir).
  */
object GraftSession {

  /** Build a local session tuned for the test harness: 32 shuffle
    * partitions (matches local[32]), AQE on so range-partitioned
    * writes coalesce like they would on a real cluster.
    */
  def build(master: String = "local[*]"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
