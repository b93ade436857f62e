package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupQueries

/** Streaming simhash maintenance parity: documents fed through the
  * live path across micro-batches must leave the standing fingerprint
  * index identical to a from-scratch rebuild over the full corpus.
  */
case class ShDoc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

class SimhashMaintainStreamSpec extends SparkSpec {

  private def doc(id: Long, text: String) =
    ShDoc(id, text, "en", "s", text.length.toLong)

  test("stream-fed fingerprints == batch rebuild over the union corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = Seq(doc(1, "spark merge data"), doc(2, "data data spark"))
    val b = Seq(doc(10, "merge spark merge"))
    val c = Seq(doc(20, "fresh words here"))

    val liveDir = java.nio.file.Files.createTempDirectory("graft_shs_live").toString
    a.toDF().write.mode("overwrite").parquet(s"$liveDir/documents.parquet")
    DedupQueries.warmLayouts(spark, liveDir)

    val input = MemoryStream[ShDoc]
    val q = StreamingOps.simhashMaintainStream(input.toDF(), liveDir).start()
    try {
      input.addData(b: _*)
      q.processAllAvailable()
      input.addData(c: _*)
      q.processAllAvailable()
    } finally q.stop()

    val fullDir = java.nio.file.Files.createTempDirectory("graft_shs_full").toString
    (a ++ b ++ c).toDF().write.mode("overwrite")
      .parquet(s"$fullDir/documents.parquet")
    def fps(dir: String): Seq[(Long, Long)] =
      DedupQueries.dedupSimhash(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(fps(liveDir) === fps(fullDir))
    assert(fps(liveDir).map(_._1) === Seq(1L, 2L, 10L, 20L))
  }
}
