package graft.operators

import graft.SparkSpec

/** Batch event analytics: cohort retention and the ordered funnel.
  * (The windowed/sessionized operators are oracle-gated; these pin the
  * edge semantics on a hand-built fixture.)
  */
class EventOpsSpec extends SparkSpec {

  private def nanos(s: String): Long =
    java.sql.Timestamp.valueOf(s).getTime * 1000000L

  private def fixture(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_events").toString
    rows.zipWithIndex
      .map { case ((_, ts, uid, tpe), i) => (i.toLong, ts, uid, tpe, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    tmp
  }

  test("retention counts next-day returners per active day") {
    val dir = fixture(Seq(
      (1L, nanos("2024-01-01 09:00:00"), 1L, "view"),
      (2L, nanos("2024-01-02 09:00:00"), 1L, "view"), // user 1 returns
      (3L, nanos("2024-01-01 10:00:00"), 2L, "view")  // user 2 does not
    ))
    val out = EventQueries.retention(spark, dir).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
    assert(out.toSeq === Seq(
      "2024-01-01" -> ((2L, 1L)),
      "2024-01-02" -> ((1L, 0L))))
  }

  test("asof join picks the most recent view ROW even when its value is NULL") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_asof").toString
    Seq(
      (1L, nanos("2024-01-01 09:00:00"), 1L, "view", Some(5.0), "{}"),
      // the MOST RECENT view before the purchase carries a NULL value:
      // ASOF semantics match this row (with NULL), never reach back to 09:00
      (2L, nanos("2024-01-01 10:00:00"), 1L, "view", None, "{}"),
      (3L, nanos("2024-01-01 11:00:00"), 1L, "purchase", Some(1.0), "{}"),
      // purchase with no prior view at all: dropped (inner asof)
      (4L, nanos("2024-01-01 08:00:00"), 2L, "purchase", Some(1.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val out = EventQueries.asofJoin(spark, tmp).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 3L)
    assert(out(0).isNullAt(3), out(0).toString)
  }

  test("funnel requires stage order: view before click before purchase") {
    val dir = fixture(Seq(
      // user 1 converts the full funnel in order
      (0L, nanos("2024-01-01 09:00:00"), 1L, "view"),
      (0L, nanos("2024-01-01 09:05:00"), 1L, "click"),
      (0L, nanos("2024-01-01 09:10:00"), 1L, "purchase"),
      // user 2 clicked BEFORE viewing — no view→click conversion
      (0L, nanos("2024-01-01 08:00:00"), 2L, "click"),
      (0L, nanos("2024-01-01 09:00:00"), 2L, "view"),
      // user 3 views and clicks, purchase precedes the click
      (0L, nanos("2024-01-01 09:00:00"), 3L, "view"),
      (0L, nanos("2024-01-01 09:01:00"), 3L, "purchase"),
      (0L, nanos("2024-01-01 09:02:00"), 3L, "click")
    ))
    val r = EventQueries.funnel(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 1L)))
  }
}
