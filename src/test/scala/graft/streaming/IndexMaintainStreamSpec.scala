package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextQueries

/** Streaming index maintenance parity: documents fed through the live
  * path across several micro-batches must leave the standing inverted
  * index identical to a from-scratch batch rebuild over the full
  * corpus — the stream twin shares the batch append, so the only
  * thing to prove is the plumbing.
  */
case class MaintainDoc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

class IndexMaintainStreamSpec extends SparkSpec {

  private def doc(id: Long, text: String) =
    MaintainDoc(id, text, "en", "s", text.length.toLong)

  test("stream-fed index == batch rebuild over the union corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = Seq(doc(1, "spark merge data"), doc(2, "data data spark"))
    val b = Seq(doc(10, "merge spark merge"), doc(11, "fresh words"))
    val c = Seq(doc(20, "spark spark spark"))

    val liveDir = java.nio.file.Files.createTempDirectory("graft_ims_live").toString
    a.toDF().write.mode("overwrite").parquet(s"$liveDir/documents.parquet")
    TextQueries.warmLayouts(spark, liveDir) // standing base over A

    val input = MemoryStream[MaintainDoc]
    val q = StreamingOps.indexMaintainStream(input.toDF(), liveDir).start()
    try {
      input.addData(b: _*)
      q.processAllAvailable()
      input.addData(c: _*)
      q.processAllAvailable()
    } finally q.stop()

    val fullDir = java.nio.file.Files.createTempDirectory("graft_ims_full").toString
    (a ++ b ++ c).toDF().write.mode("overwrite")
      .parquet(s"$fullDir/documents.parquet")
    TextQueries.warmLayouts(spark, fullDir)
    val fullLayout = s"${graft.GraftSession.fixtureRoot(fullDir)}/invindex_v2"
    val liveLayout = s"${graft.GraftSession.fixtureRoot(liveDir)}/invindex_v2"

    def postings(layout: String): Seq[Seq[Any]] =
      spark.read.parquet(s"$layout/postings")
        .select("tok", "doc_id", "dl", "tf", "positions", "tb")
        .collect().toSeq.map(_.toSeq)
        .sortBy(r => (r(0).toString, r(1).toString.toLong))
    assert(postings(liveLayout) === postings(fullLayout))
    // stats are summable partials on disk (base + one delta/append)
    def stats(layout: String): Seq[Any] =
      spark.read.parquet(s"$layout/stats")
        .agg(sum(col("n_docs")), sum(col("t_tokens"))).head.toSeq
    assert(stats(liveLayout) === stats(fullLayout))
  }
}
