package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 gets a `queries` entry; the
  * SQL-expressible ones also get a DuckDB oracle in `oracleSql` (same
  * column names, same ORDER BY, decimal-cast aggregates — see
  * CoreQueries for the numeric policy).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing" -> CoreQueries.aggPricing,
    "q_probe_counts" -> CoreQueries.probeCounts,
    "q_checksum_lineitem" -> CoreQueries.checksumLineitem,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" -> CoreQueries.aggPricingSql,
    "q_probe_counts" -> CoreQueries.probeCountsSql,
  )
}
