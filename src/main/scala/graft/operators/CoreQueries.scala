package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession.table
import graft.verify.Checksum

/** Verification-style aggregation queries — the reference's "query
  * surface" (SURVEY §2.6 A6–A8: count/sum/conditional-count probes used
  * as its integration-test oracle, reference `tests/csv/run.sh:14-22`).
  *
  * Numeric policy for oracle hash-stability: every double that feeds a
  * SUM is first cast to DECIMAL(18,4). Decimal addition is exact and
  * commutative, so Spark's parallel partial aggregation and DuckDB's
  * serial sum produce bit-identical results regardless of row order —
  * this is also what makes these aggregates safe on a 1000-executor
  * shuffle at 100 TB (map-side partial agg, no ordering assumptions).
  */
object CoreQueries {

  private def dec(c: String) = col(c).cast(DecimalType(18, 4))

  /** TPC-H Q1-shaped pricing summary: the canonical groupBy/agg probe.
    * Scale: group-by on 2 low-cardinality keys → partial agg reduces
    * ~6e9 rows to a handful before the shuffle; no skew possible.
    */
  def aggPricing(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).as("sum_qty"),
        sum(dec("l_extendedprice")).as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def aggPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
      |  sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS sum_base_price,
      |  sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_quantity > 0
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Conditional-count probes in the style of the reference's CSV
    * oracle (`count(*)`, `sum(col)`, `count(col) WHERE …`).
    */
  def probeCounts(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "orders")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(dec("o_totalprice")).as("sum_price"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_totalprice") > 1000, 1)).as("n_big"),
        countDistinct(col("o_custkey")).as("n_cust"))

  def probeCountsSql: String =
    """SELECT count(*) AS n_rows,
      |  sum(CAST(o_totalprice AS DECIMAL(18,4))) AS sum_price,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  count(CASE WHEN o_totalprice > 1000 THEN 1 END) AS n_big,
      |  count(DISTINCT o_custkey) AS n_cust
      |FROM orders""".stripMargin

  /** CRC64-XOR table checksum (SURVEY A1/A2) — the flagship custom
    * aggregate. No DuckDB oracle (CRC64-ECMA is not expressible there);
    * correctness is covered by ChecksumSpec + the write/read-back
    * round-trip query.
    */
  def checksumLineitem(spark: SparkSession, sfDir: String): DataFrame =
    Checksum.tableChecksum(table(spark, sfDir, "lineitem"))
}
