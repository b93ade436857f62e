package graft.pipeline

import org.apache.spark.sql.SparkSession

/** A7: post-import ANALYZE (reference `analyzeTable`,
  * `lightning/restore/restore.go:2215-2220`; levels
  * `lightning/config/config.go:170-241`).
  *
  * The written parquet directory is registered as an external catalog
  * table and `ANALYZE TABLE … COMPUTE STATISTICS` records its size and
  * row count in the catalog — where Catalyst's cost-based optimizer
  * (join reorder, broadcast-hash selection, AQE hints) reads them for
  * every later query over the imported table. Same rationale as the
  * reference: imports bypass the stats pipeline, so collect stats as
  * the final import step.
  */
object Analyze {

  def tableName(key: String): String =
    "graft_" + key.replaceAll("[^A-Za-z0-9_]", "_")

  /** Register `path` as external table `tableName(key)` and compute
    * table-level statistics; returns the catalog-recorded row count.
    */
  def analyze(spark: SparkSession, key: String, path: String,
      format: String = "parquet"): Option[Long] = {
    val tbl = tableName(key)
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.sql(s"CREATE TABLE `$tbl` USING $format LOCATION '$path'")
    spark.sql(s"ANALYZE TABLE `$tbl` COMPUTE STATISTICS")
    statsRowCount(spark, tbl)
  }

  /** Row count as recorded in the catalog statistics (None if the
    * table has no stats entry).
    */
  def statsRowCount(spark: SparkSession, tbl: String): Option[Long] =
    spark.sql(s"DESCRIBE TABLE EXTENDED `$tbl`").collect()
      .find(r => r.getString(0) == "Statistics")
      .flatMap(r => "(\\d+) rows".r.findFirstMatchIn(r.getString(1)).map(_.group(1).toLong))
}
