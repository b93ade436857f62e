package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CoreQueries

/** Streaming sketch maintenance parity: events fed through the live
  * path across micro-batches must leave the standing daily-sketch
  * layout serving the same weekly estimates (and the same exact
  * n_events anchors) as a one-pass build over the union.
  */
case class SkEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class SketchMaintainStreamSpec extends SparkSpec {

  private def ev(id: Long, day: String, user: Long) =
    SkEvent(id, Timestamp.valueOf(s"$day 10:00:00"), user, "click", 1.0, "")

  test("stream-fed daily partials == one-pass build over the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // seed week + two streamed batches touching an EXISTING day (the
    // partial-merge case) and a new week; user 7 re-appears across
    // batches (duplicate-insensitivity of the distinct sketch)
    val seed = Seq(ev(1, "2024-01-01", 7), ev(2, "2024-01-02", 8))
    val b0 = Seq(ev(10, "2024-01-02", 7), ev(11, "2024-01-03", 9))
    val b1 = Seq(ev(20, "2024-01-09", 7), ev(21, "2024-01-09", 10))

    val liveDir = java.nio.file.Files.createTempDirectory("graft_sks_live").toString
    seed.toDF().write.mode("overwrite").parquet(s"$liveDir/events.parquet")
    CoreQueries.userSketchLayout(spark, liveDir) // warm the base layout

    val input = MemoryStream[SkEvent]
    val q = StreamingOps.sketchMaintainStream(input.toDF(), liveDir).start()
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()

    val fullDir = java.nio.file.Files.createTempDirectory("graft_sks_full").toString
    (seed ++ b0 ++ b1).toDF().write.mode("overwrite")
      .parquet(s"$fullDir/events.parquet")

    def weekly(dir: String): Map[String, (Long, Long)] = {
      val anchors = CoreQueries.sketchRollup(spark, dir).collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      CoreQueries.sketchRollupEstimates(spark, dir).collect()
        .map(r => r.get(0).toString -> (r.getLong(1), anchors(r.get(0).toString)))
        .toMap
    }
    assert(weekly(liveDir) === weekly(fullDir))
    assert(weekly(liveDir).values.map(_._2).sum === 6L)
  }
}
