package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession.table

/** Event-stream operators in their batch form. The same logic runs
  * incrementally under Structured Streaming (graft.streaming) — batch
  * is the replay/backfill path, streaming the live path; Spark
  * guarantees the two agree for these windowed aggregations.
  */
object EventQueries {

  // Exact-integer sums (engine-identical, see CoreQueries numeric policy).
  private def quant(c: String) = graft.functions.TextFunctions.quant4(col(c))

  /** Hourly tumbling-window aggregation by event type. */
  def windowHourly(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .groupBy(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(quant("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  def windowHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(floor(value*10000) AS BIGINT)) AS BIGINT) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Sessionization: per-user sessions split on >30 min inactivity
    * gaps; the batch twin of the mapGroupsWithState streaming session
    * operator. Window functions partition by user — scales by hash
    * shuffle on user_id, no global sort.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    table(spark, sfDir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  def sessionizeSql: String =
    """WITH g AS (SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |      OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM events)
      |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
}
