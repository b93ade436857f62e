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

  /** Semi-structured property extraction: the `props` column is a JSON
    * string (the universal escape hatch for evolving event payloads);
    * `get_json_object` pulls typed fields out at scan speed — codegen'd
    * path extraction, no UDF, no schema migration. Aggregates are exact
    * integers so the compare is engine-identical.
    */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  def jsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Time-series gap fill: the hourly count series per event type,
    * with MISSING hours materialized as zeros over the data's own
    * [min, max] hour span — the resample step every downstream
    * time-series consumer (anomaly detection, forecasting) needs. The
    * spine (hours × types) is bounded by the time range, not the
    * corpus, so it broadcast-joins against the one aggregated counts
    * relation regardless of input size.
    */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE corpus scan: span and types both derive from the already-
    // aggregated (hours × types)-bounded counts relation, which
    // materializes once and feeds all three uses
    val counts = table(spark, sfDir, "events")
      .groupBy(date_trunc("HOUR", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val span = counts.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val types = counts.select(col("event_type")).distinct()
    // left-outer keeps the spine; the broadcast-able side of a left
    // join is the RIGHT one — and the aggregated counts relation is
    // just as bounded (hours × types) as the spine itself
    span.crossJoin(types)
      .join(broadcast(counts), Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("h", "event_type")
  }

  def gapFillSql: String =
    """WITH c AS (SELECT date_trunc('hour', ts) AS h, event_type,
      |    count(*) AS n FROM events GROUP BY 1, 2),
      |span AS (SELECT unnest(generate_series(
      |    (SELECT min(date_trunc('hour', ts)) FROM events),
      |    (SELECT max(date_trunc('hour', ts)) FROM events),
      |    INTERVAL 1 HOUR)) AS h),
      |types AS (SELECT DISTINCT event_type FROM events)
      |SELECT span.h AS h, types.event_type, coalesce(c.n, 0) AS n
      |FROM span CROSS JOIN types
      |LEFT JOIN c ON c.h = span.h AND c.event_type = types.event_type
      |ORDER BY span.h, types.event_type""".stripMargin

  /** Moving-window aggregate: 3-hour rolling event count per type over
    * the hourly series. The window runs on the AGGREGATED relation —
    * bounded by the time range, not the corpus — so the per-type
    * partitions are small at any input scale; the corpus-sized work is
    * the one map-side-combined groupBy beneath it.
    */
  def movingSum(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = table(spark, sfDir, "events")
      .groupBy(date_trunc("HOUR", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy(col("h"))
      .rowsBetween(-2, Window.currentRow)
    hourly
      .withColumn("moving_3h", sum(col("n")).over(w))
      .orderBy("h", "event_type")
  }

  def movingSumSql: String =
    """WITH c AS (SELECT date_trunc('hour', ts) AS h, event_type,
      |    count(*) AS n FROM events GROUP BY 1, 2)
      |SELECT h, event_type, n,
      |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_3h
      |FROM c ORDER BY h, event_type""".stripMargin

  /** As-of join — the operator Spark has no builtin for (DuckDB ships
    * one; the oracle uses it, pinning OUR composition against a native
    * implementation): each purchase picks up the value of the most
    * recent view at-or-before it for the same user. Composition: tag
    * both streams, union, and carry the last non-null view value
    * forward with a per-user running window (`last(_, ignoreNulls)`
    * over rows-unbounded-preceding). Scale shape: ONE hash shuffle on
    * user_id and a within-partition sort — millions of users means
    * millions of independent window partitions, no global sort, no
    * range join, no skewed reducer. Ties at the same timestamp sort
    * views first (tag 0), so an exactly-simultaneous view counts, and
    * view values dedupe per (user, ts) with max() so the answer is
    * deterministic on any input.
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = table(spark, sfDir, "events")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max(quant("value")).as("view_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // the carried value is a one-field STRUCT: non-null for every view
    // ROW (even when its value is NULL), null for purchase rows — so
    // `last(ignoreNulls)` picks the most recent view ROW, matching the
    // oracle's ASOF row semantics, instead of skipping a NULL-valued
    // view and reaching back to an older one
    val tagged = views.select(col("user_id"), col("ts"), lit(0).as("tag"),
        lit(null).cast("long").as("event_id"),
        struct(col("view_value")).as("vrec"))
      .unionByName(purchases.select(col("user_id"), col("ts"), lit(1).as("tag"),
        col("event_id"),
        lit(null).cast("struct<view_value:bigint>").as("vrec")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_rec", last(col("vrec"), ignoreNulls = true).over(w))
      .where(col("tag") === 1 && col("asof_rec").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_rec.view_value").as("asof_view"))
      .orderBy("event_id")
  }

  def asofJoinSql: String =
    """WITH v AS (SELECT user_id, ts,
      |    max(CAST(floor(value*10000) AS BIGINT)) AS view_value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |p AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts, v.view_value AS asof_view
      |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY event_id""".stripMargin

  /** Range (interval) join WITHOUT an equi key — naively a
    * nested-loop/cartesian, the canonical 100 TB scale-killer. The
    * scale path is bucket expansion: each interval explodes to the
    * hour buckets it covers (bounded fanout: 2 per 2-hour window),
    * each event keys by its hour, and the join becomes a plain
    * equi-join on the bucket plus an exact residual filter. The
    * windows here (daily 06–08 and 18–20 maintenance slots derived
    * from the data's own days) stand in for any interval dimension.
    */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = table(spark, sfDir, "events")
    val days = ev.select(date_trunc("DAY", col("ts")).as("day")).distinct()
    val wins = days.select(explode(array(
        struct(expr("day + INTERVAL 6 HOURS").as("win_start"),
          expr("day + INTERVAL 8 HOURS").as("win_end")),
        struct(expr("day + INTERVAL 18 HOURS").as("win_start"),
          expr("day + INTERVAL 20 HOURS").as("win_end")))).as("w"))
      .select(col("w.win_start"), col("w.win_end"))
    val winBuckets = wins.withColumn("bucket",
      explode(sequence(date_trunc("HOUR", col("win_start")),
        date_trunc("HOUR", expr("win_end - INTERVAL 1 SECOND")),
        expr("INTERVAL 1 HOUR"))))
    val evBuckets = ev.withColumn("bucket", date_trunc("HOUR", col("ts")))
    evBuckets.join(winBuckets, "bucket")
      .where(col("ts") >= col("win_start") && col("ts") < col("win_end"))
      .groupBy("win_start")
      .agg(count(lit(1)).as("n_events"), sum(quant("value")).as("sum_value"))
      .orderBy("win_start")
  }

  def rangeJoinSql: String =
    """WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
      |wins AS (
      |  SELECT day + INTERVAL 6 HOUR AS win_start, day + INTERVAL 8 HOUR AS win_end FROM days
      |  UNION ALL
      |  SELECT day + INTERVAL 18 HOUR, day + INTERVAL 20 HOUR FROM days)
      |SELECT win_start, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value*10000) AS BIGINT)) AS BIGINT) AS sum_value
      |FROM events e JOIN wins w ON e.ts >= w.win_start AND e.ts < w.win_end
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Last-touch view→click attribution: each click joins the views of
    * the same user in the preceding 30 minutes and keeps the latest
    * (the canonical ad-attribution interval join, and the batch twin
    * of [[graft.streaming.StreamingOps.attributionJoin]]). The
    * interval join is the same bucket-expansion trick as
    * [[rangeJoin]]: views sit in their hour bucket, clicks probe
    * their own and the previous hour as an EQUI-join key, and the
    * 30-minute residual filters after — no nested loop at any scale,
    * and the shuffle keys on (user, hour) so hot users spread across
    * hours. Latency is exact integer microseconds→ms (`unix_micros`
    * both engines).
    */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = table(spark, sfDir, "events")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"),
        date_trunc("HOUR", col("ts")).as("bucket"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      .withColumn("bucket", explode(array(
        date_trunc("HOUR", col("c_ts")),
        expr("date_trunc('HOUR', c_ts) - INTERVAL 1 HOUR"))))
    clicks.join(views, Seq("user_id", "bucket"))
      .where(col("v_ts") <= col("c_ts") &&
        col("v_ts") >= expr("c_ts - INTERVAL 30 MINUTES"))
      .groupBy(col("click_id"), col("user_id"), col("c_ts"))
      .agg(max(col("v_ts")).as("last_view"))
      .withColumn("latency_ms",
        expr("(unix_micros(c_ts) - unix_micros(last_view)) div 1000"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_attributed"),
        sum(col("latency_ms")).as("sum_latency_ms"),
        min(col("latency_ms")).as("min_latency_ms"))
      .orderBy("user_id")
  }

  def attributionSql: String =
    """WITH v AS (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
      |c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM events
      |      WHERE event_type = 'click'),
      |j AS (
      |  SELECT c.click_id, c.user_id, c.c_ts, max(v.v_ts) AS last_view
      |  FROM c JOIN v ON v.user_id = c.user_id
      |    AND v.v_ts <= c.c_ts AND v.v_ts >= c.c_ts - INTERVAL 30 MINUTE
      |  GROUP BY 1, 2, 3)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_attributed,
      |  CAST(sum((epoch_us(c_ts) - epoch_us(last_view)) // 1000) AS BIGINT)
      |    AS sum_latency_ms,
      |  CAST(min((epoch_us(c_ts) - epoch_us(last_view)) // 1000) AS BIGINT)
      |    AS min_latency_ms
      |FROM j GROUP BY 1 ORDER BY user_id""".stripMargin

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

  /** Day-over-day cohort retention: per active day, how many users
    * were active and how many returned the next day. One distinct
    * (user, day) pass, one self-equi-join on (user, day+1), one small
    * aggregate — every shuffle keys on user/day, nothing global.
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val d = table(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val nxt = d.select(col("user_id"), date_sub(col("day"), 1).as("day"),
      lit(1L).as("r"))
    d.join(nxt, Seq("user_id", "day"), "left")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(coalesce(col("r"), lit(0L))).as("n_retained"))
      .orderBy("day")
  }

  def retentionSql: String =
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |n AS (SELECT user_id, day - 1 AS day, 1 AS r FROM d)
      |SELECT d.day AS day, count(*) AS n_active,
      |  CAST(sum(coalesce(n.r, 0)) AS BIGINT) AS n_retained
      |FROM d LEFT JOIN n USING (user_id, day)
      |GROUP BY d.day ORDER BY day""".stripMargin

  /** Ordered funnel view → click → purchase by first occurrence: a
    * user converts a stage only after converting the previous one.
    * Three per-user min-aggregates chained by timestamp inequality —
    * each stage is one filtered aggregate plus an equi-join on
    * user_id; the inequality is applied as a post-join filter, never a
    * join condition, so every join stays hash-partitioned.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = table(spark, sfDir, "events")
    def first(tpe: String) =
      e.where(col("event_type") === tpe).groupBy("user_id")
    val v = first("view").agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("n_view")).crossJoin(
        c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  def funnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |  (SELECT count(*) FROM c) AS n_view_click,
      |  (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Daily event-type pivot: one row per day, one count column per
    * type. The pivot's value list is FIXED (not discovered), so the
    * plan is a single groupBy with conditional aggregates — no extra
    * pass to collect distinct pivot keys, and the schema is stable for
    * downstream consumers.
    */
  def pivotDaily(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy("day")

  def pivotDailySql: String = {
    val cols = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
      .mkString(",\n  ")
    s"""SELECT CAST(ts AS DATE) AS day,
       |  $cols
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin
  }

  /** Per-user activity anomaly detection: hours where a user's event
    * count exceeds their own mean by > 2 standard deviations — the
    * monitoring primitive over the hourly series (bot bursts, runaway
    * clients, broken instrumentation). Two map-side-combining
    * aggregates (user-hour counts → per-user moments) and an equi-join
    * back on user_id; per-user stats are ~16 bytes regardless of
    * history length, so the stats relation broadcasts at any scale.
    *
    * Numeric policy: the moments come from exact integer sums (n,
    * Σc, Σc²), and mean/std/z are then the same exactly-rounded IEEE
    * double ops in both engines, with the z-score floor-quantized to
    * ppm — a deterministic hash-checkable verdict (a double std
    * computed via Spark's stddev would merge partials in shuffle
    * order and diverge). Single-hour users (n = 1) and flat series
    * (std = 0) can't flag — guarded identically on both sides.
    */
  private def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("hour"))
      .agg(count(lit(1)).as("c"))

  /** Per-user (mean, std) of the hourly counts — the TRAINED side of
    * the anomaly train/serve split, shared by the batch detector and
    * the streaming gate ([[graft.streaming.StreamingOps
    * .anomalyGateStream]]) so both flag from identical statistics.
    * Exact integer moments, IEEE-exact mean/std (see [[eventAnomaly]]).
    */
  def userHourlyStats(spark: SparkSession, sfDir: String): DataFrame = {
    val stats = hourlyCounts(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("sq"))
      .where(col("n") > 1)
    val mean = col("s").cast("double") / col("n").cast("double")
    // population variance from exact integer moments: (sq - s²/n) / n
    val variance = (col("sq").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n").cast("double")) /
      col("n").cast("double")
    stats.select(col("user_id"), mean.as("mean"), sqrt(variance).as("std"))
  }

  /** The flagging expressions over an (n_events, mean, std) row — ONE
    * definition consumed by the batch detector and the streaming gate.
    */
  private[graft] def anomalyFlag(c: org.apache.spark.sql.Column): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val keep = col("std") > 0 &&
      (c.cast("double") - col("mean")) > lit(2d) * col("std")
    val zPpm = floor((c.cast("double") - col("mean")) / col("std") * 1000000d)
      .cast("long")
    (keep, zPpm)
  }

  def eventAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val (keep, zPpm) = anomalyFlag(col("c"))
    hourlyCounts(spark, sfDir)
      .join(userHourlyStats(spark, sfDir), "user_id")
      .where(keep)
      .select(col("user_id"), col("hour"), col("c").as("n_events"),
        zPpm.as("z_ppm"))
      .orderBy("user_id", "hour")
  }

  def eventAnomalySql: String =
    """WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS hour,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |stats AS (SELECT user_id, count(*) AS n,
      |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS sq
      |  FROM hourly GROUP BY 1 HAVING count(*) > 1)
      |SELECT h.user_id, h.hour, h.c AS n_events,
      |  CAST(floor((CAST(h.c AS DOUBLE) - CAST(s.s AS DOUBLE)/CAST(s.n AS DOUBLE))
      |    / sqrt((CAST(s.sq AS DOUBLE) - CAST(s.s AS DOUBLE)*CAST(s.s AS DOUBLE)/CAST(s.n AS DOUBLE))/CAST(s.n AS DOUBLE))
      |    * 1000000) AS BIGINT) AS z_ppm
      |FROM hourly h JOIN stats s USING (user_id)
      |WHERE sqrt((CAST(s.sq AS DOUBLE) - CAST(s.s AS DOUBLE)*CAST(s.s AS DOUBLE)/CAST(s.n AS DOUBLE))/CAST(s.n AS DOUBLE)) > 0
      |  AND (CAST(h.c AS DOUBLE) - CAST(s.s AS DOUBLE)/CAST(s.n AS DOUBLE))
      |    > 2 * sqrt((CAST(s.sq AS DOUBLE) - CAST(s.s AS DOUBLE)*CAST(s.s AS DOUBLE)/CAST(s.n AS DOUBLE))/CAST(s.n AS DOUBLE))
      |ORDER BY user_id, hour""".stripMargin
}
