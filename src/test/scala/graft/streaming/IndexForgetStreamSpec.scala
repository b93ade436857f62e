package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupQueries, SimilarityQueries, TextQueries}

/** Deletion requests as a live stream (`indexForgetStream`): requests
  * fed across micro-batches propagate into EVERY standing
  * per-document layout, leaving retrieval, near-dup pairing and the
  * knn graph exactly equal to rebuilds over the remaining corpus —
  * and because the forget tier is at-least-once safe by construction
  * (no batchId marker on this stream), a checkpointed RESTART that
  * replays nothing still converges: a fresh query over the same
  * checkpoint picks up new requests and the state stays exact.
  */
case class ForgetReq(doc_id: Long)

class IndexForgetStreamSpec extends SparkSpec {

  test("streamed requests == batch rebuilds over remaining; restart clean") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft_fstream").toString
    val docs = graft.GraftSession.table(spark, sf(), "documents")
      .where(col("doc_id") < 300)
    val vecs = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 300)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // stand up all four layouts before any request arrives
    assert(TextQueries.bm25Topk(spark, dir).count() > 0)
    assert(DedupQueries.dedupSimhashPairs(spark, dir).count() >= 0)
    assert(SimilarityQueries.annIvfPq(spark, dir).count() > 0)
    val g0 = SimilarityQueries.knnGraphIndexed(spark, dir)
    // victims that bite: a served bm25 doc and a knn top-1 neighbor
    val vBm = TextQueries.bm25Topk(spark, dir).head.getLong(0)
    val vKnn = g0.where(col("rank") === 1 &&
        !col("neighbor_id").isin(vBm)).head.getLong(2)
    val batch1 = Seq(vBm, vKnn).distinct
    val batch2 = Seq(7L) // arbitrary third id, present in both tables

    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_fstream_ckpt").toString
    val input = MemoryStream[ForgetReq]
    val q = StreamingOps.indexForgetStream(input.toDF(), dir)
      .option("checkpointLocation", checkpoint).start()
    try {
      input.addData(batch1.map(ForgetReq): _*)
      q.processAllAvailable()
    } finally q.stop()

    // restart over the SAME checkpoint: nothing replays, new batch lands
    val input2 = MemoryStream[ForgetReq]
    // a fresh MemoryStream starts a new source; give it its own
    // checkpoint (the restart-safety claim under test is the LAYOUT
    // state's — forget converges without any batch marker — not the
    // file-source offset log's, which IndexMaintainStreamSpec pins)
    val checkpoint2 = java.nio.file.Files
      .createTempDirectory("graft_fstream_ckpt2").toString
    val q2 = StreamingOps.indexForgetStream(input2.toDF(), dir)
      .option("checkpointLocation", checkpoint2).start()
    try {
      // REPLAY batch1 (at-least-once delivery) plus the new batch2:
      // the replay must be absorbed silently
      input2.addData((batch1 ++ batch2).map(ForgetReq): _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val victims = batch1 ++ batch2

    // ground truths: rebuilds over the remaining corpus
    val truth = java.nio.file.Files.createTempDirectory("graft_fstream_t").toString
    docs.where(!col("doc_id").isin(victims: _*))
      .write.mode("overwrite").parquet(s"$truth/documents.parquet")
    vecs.where(!col("vec_id").isin(victims: _*))
      .write.mode("overwrite").parquet(s"$truth/embeddings.parquet")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq
    assert(rows(TextQueries.bm25Topk(spark, dir))
      === rows(TextQueries.bm25Topk(spark, truth)),
      "bm25 diverged from the rebuild-over-remaining")
    assert(rows(DedupQueries.dedupSimhashPairs(spark, dir))
      === rows(DedupQueries.dedupSimhashPairs(spark, truth)),
      "simhash pairs diverged from the rebuild-over-remaining")
    assert(rows(SimilarityQueries.knnGraphIndexed(spark, dir))
      === rows(SimilarityQueries.knnGraphIndexed(spark, truth)),
      "knn graph diverged from the rebuild-over-remaining")
    // ivfpq trains on its own corpus, so rebuild rows differ by
    // design; the contract is non-retrievability
    val ann = SimilarityQueries.annIvfPq(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    assert(ann.nonEmpty && !ann.exists(victims.contains),
      "a forgotten vector is still retrievable from ivfpq")
  }
}
