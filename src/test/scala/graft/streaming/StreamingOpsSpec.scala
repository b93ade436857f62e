package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.streaming.StreamingOps._

class StreamingOpsSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(3600_000L + min * 60_000L)

  test("windowedCounts aggregates a micro-batched stream like the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = windowedCounts(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(70), 2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("event_type", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows === Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("windowedCounts over the REAL events table equals the batch aggregation") {
    // the live path and the backfill path must agree on the same data:
    // stream the actual events parquet through the watermarked window
    // and compare every (window, type) group against the batch run of
    // the identical expression
    import org.apache.spark.sql.functions._
    val src = s"${sf()}/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("part-00000.parquet"))
    val raw = spark.read.parquet(src)
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", col("ts").cast("timestamp"))
    val stream = normalize(
      spark.readStream.schema(raw.schema).parquet(dir.toString))
    val q = windowedCounts(stream).writeStream
      .format("memory").queryName("wc_real").outputMode(OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("wc_real").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val want = normalize(raw)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("window.start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got.keySet === want.keySet)
      assert(got.nonEmpty)
      got.foreach { case (k, (n, s)) =>
        val (wn, ws) = want(k)
        assert(n === wn, s"count mismatch at $k")
        // double sums may associate differently between the streaming
        // partials and the batch hash aggregate
        assert(math.abs(s - ws) <= math.max(1e-9 * math.abs(ws), 1e-9),
          s"sum mismatch at $k: $s vs $ws")
      }
    } finally q.stop()
  }

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("dedupStream keeps first occurrence per fingerprint across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = dedupStream(input.toDF()).writeStream
      .format("memory").queryName("dds").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Doc(1, ts(0), "alpha beta"), Doc(2, ts(1), "gamma"),
        Doc(3, ts(2), "alpha beta")) // in-batch dup
      q.processAllAvailable()
      input.addData(Doc(4, ts(3), "gamma"), Doc(5, ts(4), "delta")) // cross-batch dup
      q.processAllAvailable()
      val kept = spark.table("dds").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept.intersect(Set(1L, 3L)).size === 1) // one copy of "alpha beta"
      assert(kept.contains(2L) && !kept.contains(4L)) // first "gamma" only
      assert(kept.contains(5L))
      assert(kept.size === 3)
    } finally q.stop()
  }

  test("hotTokensStream surfaces every true heavy hitter of the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = hotTokensStream(input.toDF(), k = 8)
      .writeStream.format("memory").queryName("htk")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      // "hot" carries >1/8 of the window's mass split across batches;
      // tail tokens are all distinct
      input.addData(Doc(1, ts(0), Seq.fill(30)("hot").mkString(" ")),
        Doc(2, ts(5), (1 to 20).map(i => s"t$i").mkString(" ")))
      q.processAllAvailable()
      input.addData(Doc(3, ts(10), Seq.fill(30)("hot").mkString(" ")),
        Doc(4, ts(15), (21 to 40).map(i => s"u$i").mkString(" ")))
      q.processAllAvailable()
      val rows = spark.table("htk").collect()
      assert(rows.length === 1)
      val hot = rows.head.getSeq[String](1)
      assert(hot.contains("hot"), hot.mkString(","))
      assert(hot.size <= 8)
      assert(rows.head.getLong(2) === 100L)
    } finally q.stop()
  }

  test("decontaminateStream drops exactly the docs the batch probe flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // eval set: two 5-gram-bearing docs; the stream carries one exact
    // leak, one partial-overlap leak (shares a full shingle), one
    // clean doc, and one too-short-to-shingle doc (must pass: no
    // shingles means nothing can overlap)
    val evalDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val eval = evalShingleArray(evalDocs)
    assert(eval.nonEmpty)
    val input = MemoryStream[Doc]
    val q = decontaminateStream(input.toDF(), eval).writeStream
      .format("memory").queryName("decon").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Doc(10, ts(0), "the quick brown fox jumps over the lazy dog"), // exact leak
        Doc(11, ts(1), "intro words pack my box with five dozen liquor jugs"), // embedded leak
        Doc(12, ts(2), "a perfectly original sentence about spark engines at scale"),
        Doc(13, ts(3), "too short"),
        Doc(14, ts(4), null)) // NULL text: no shingles, must pass (batch never flags it)
      q.processAllAvailable()
      val kept = spark.table("decon").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(12L, 13L, 14L), s"kept=$kept")
    } finally q.stop()
  }

  test("qualityGateStream keeps exactly the docs the batch classifier keeps") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length, lit}
    implicit val sqlCtx = spark.sqlContext
    // enough lexical variety that both keep-verdicts occur; the batch
    // op is the ground truth (shared expressions, independent path)
    val docs = (1L to 20L).map(i => (i, s"tok${i}a tok${i}b common word$i here")) ++
      Seq((21L, "   "), (22L, "single"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_qgate").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val batchKept = graft.operators.TextQueries.qualityClassifier(spark, tmp)
      .where(col("keep") === 1L).collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < docs.size) // both verdicts occur
    val input = MemoryStream[Doc]
    val q = qualityGateStream(input.toDF()).writeStream
      .format("memory").queryName("qgate").outputMode(OutputMode.Append())
      .start()
    try {
      val (head, tail) = docs.splitAt(docs.size / 2)
      input.addData(head.map { case (id, t) => Doc(id, ts(id.toInt), t) })
      q.processAllAvailable()
      input.addData(tail.map { case (id, t) => Doc(id, ts(id.toInt), t) })
      q.processAllAvailable()
      val streamKept = spark.table("qgate").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamKept === batchKept)
    } finally q.stop()
  }

  test("sessionize splits on the inactivity gap and counts events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS()).writeStream
      .format("memory").queryName("sess").outputMode(OutputMode.Append())
      .start()
    try {
      // one user: 3 events in one session, then a 40-min gap → new session
      input.addData(
        Event(1, ts(0), 7, "a", 0), Event(2, ts(5), 7, "a", 0),
        Event(3, ts(10), 7, "a", 0), Event(4, ts(50), 7, "a", 0))
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select("user_id", "n_events", "closed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      // first session closed with 3 events; second open with 1
      assert(rows.contains((7L, 3L, true)))
      assert(rows.contains((7L, 1L, false)))
    } finally q.stop()
  }

  test("anomalyGateStream flags exactly the hours the batch detector flags") {
    // train/serve parity on the REAL events: stats trained by the
    // batch side, the stream gated with the shared expressions —
    // flagged (user, hour, count, z) sets must be identical
    import org.apache.spark.sql.functions._
    val src = s"${sf()}/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_anom")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("part-00000.parquet"))
    val raw = spark.read.parquet(src)
    val stream = spark.readStream.schema(raw.schema).parquet(dir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    val stats = graft.operators.EventQueries.userHourlyStats(spark, sf())
      .localCheckpoint(true) // static side of the stream-static join
    val q = anomalyGateStream(stream, stats).writeStream
      .format("memory").queryName("anom").outputMode(OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("anom").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
      val want = graft.operators.EventQueries.eventAnomaly(spark, sf()).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("sessionize over the REAL events table matches the batch operator") {
    // the stateful parity pin: stream the production events parquet
    // through the mapGroupsWithState sessionizer and compare per-user
    // session COUNTS and session START boundaries against the batch
    // EventQueries.sessionize / its window expression. Precision note:
    // batch gaps compare unix_timestamp SECONDS, streaming state
    // compares epoch MILLIS — equivalent unless a gap lands within 1 s
    // of the 1800 s threshold, which the real corpus never does
    // (verified at every sf); synthetic edge gaps are covered by the
    // MemoryStream test above.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = s"${sf()}/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sess")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("part-00000.parquet"))
    val raw = spark.read.parquet(src)
    val stream = spark.readStream.schema(raw.schema).parquet(dir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    val q = sessionize(stream).writeStream
      .format("memory").queryName("sess_real").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      // reconstruct final sessions: a session is keyed by (user,
      // started); later updates supersede earlier ones (same session
      // grows across batches, then may close), so keep the max view
      val sessions = spark.table("sess_real")
        .groupBy(col("user_id"), col("started"))
        .agg(max(col("n_events")).as("n_events"), max(col("ended")).as("ended"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getLong(2), r.getTimestamp(3).getTime))
      val gotCounts = sessions.groupBy(_._1).view
        .mapValues(s => (s.length.toLong, s.map(_._3).sum)).toMap
      val want = graft.operators.EventQueries.sessionize(spark, sf()).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(gotCounts === want)
      // boundary parity: the streaming session starts are exactly the
      // batch new_sess=1 event timestamps (compared at millis — the
      // streaming state's precision)
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
      val batchStarts = raw.withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .where(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800)
        .select("user_id", "ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSet
      assert(sessions.map(s => (s._1, s._2)).toSet === batchStarts)
      assert(sessions.nonEmpty)
    } finally q.stop()
  }

  test("forgetStream drops exactly the batch rewrite's victims (parity)") {
    import org.apache.spark.sql.functions._
    val src = s"${sf()}/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_forget")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("part-00000.parquet"))
    val raw = spark.read.parquet(src)
    // the same deterministic cohort the batch forget operator purges
    val requests = raw.select(col("user_id")).distinct()
      .where(pmod(col("user_id"), lit(97)) === 0)
    val stream = spark.readStream.schema(raw.schema).parquet(dir.toString)
    val q = forgetStream(stream, requests).writeStream
      .format("memory").queryName("forget_live").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("forget_live").select("event_id").collect()
        .map(_.getLong(0)).toSet
      val want = raw.join(broadcast(requests), Seq("user_id"), "left_anti")
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(got === want)
      assert(got.size < raw.count(), "the cohort must actually drop events")
    } finally q.stop()
  }

  test("attributionJoin matches clicks to in-horizon views only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = attributionJoin(views.toDF(), clicks.toDF()).writeStream
      .format("memory").queryName("attr").outputMode(OutputMode.Append())
      .start()
    try {
      views.addData(
        Event(10, ts(0), 1, "view", 0.0),   // user 1 views at t+0
        Event(11, ts(20), 1, "view", 0.0),  // and again at t+20
        Event(12, ts(0), 2, "view", 0.0))   // user 2 views at t+0
      clicks.addData(
        Event(20, ts(25), 1, "click", 1.0), // in horizon of BOTH user-1 views
        Event(21, ts(45), 1, "click", 1.0), // only the t+20 view is within 30m
        Event(22, ts(45), 2, "click", 1.0), // user-2 view is 45m old — no match
        Event(23, ts(5), 3, "click", 1.0))  // user 3 never viewed
      q.processAllAvailable()
      val pairs = spark.table("attr")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((20L, 10L), (20L, 11L), (21L, 11L)))
    } finally q.stop()
  }

  test("attributionJoin over the REAL events equals the batch interval join") {
    import org.apache.spark.sql.functions._
    val src = s"${sf()}/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_attr")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("part-00000.parquet"))
    val raw = spark.read.parquet(src)
    def side(tpe: String) = spark.readStream.schema(raw.schema)
      .parquet(dir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
      .where(col("event_type") === tpe)
    val q = attributionJoin(side("view"), side("click")).writeStream
      .format("memory").queryName("attr_real").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("attr_real")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = raw.withColumn("ts", col("ts").cast("timestamp"))
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("ts").as("v_ts"),
          col("event_id").as("view_id"))
      val want = ev.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
        .join(v, expr(
          "vu = cu AND v_ts <= c_ts AND v_ts >= c_ts - INTERVAL 30 MINUTES"))
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
      assert(got.nonEmpty, "the real corpus must produce attributed pairs")
    } finally q.stop()
  }
}
