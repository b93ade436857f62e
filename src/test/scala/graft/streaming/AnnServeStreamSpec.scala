package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityQueries

/** Live ANN serving parity: query vectors fed through the stream twin
  * across micro-batches must produce exactly the hits the batch lookup
  * returns for the same queries — the twin shares
  * [[SimilarityQueries.annBatchLookup]], so the proof is the plumbing
  * (per-batch application, batch stamping, append-only output).
  */
case class AnnQuery(query_id: Long, embedding: Seq[Float])

class AnnServeStreamSpec extends SparkSpec {

  test("stream-served hits == batch lookup for the same queries, batch-stamped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    def vec(id: Long): Seq[Float] =
      emb.where(col("vec_id") === id).select("embedding")
        .collect()(0).getSeq[Float](0)
    val batch1 = Seq(AnnQuery(0L, vec(0L)), AnnQuery(100L, vec(100L)))
    val batch2 = Seq(AnnQuery(200L, vec(200L)))

    val outDir = java.nio.file.Files.createTempDirectory("graft_annserve").toString
    val input = MemoryStream[AnnQuery]
    val q = StreamingOps.annServeStream(input.toDF(), sf(), s"$outDir/hits").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val served = spark.read.parquet(s"$outDir/hits")
    // batch stamps partition the answers by arrival batch
    assert(served.select("batch_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L))
    assert(served.where(col("batch_id") === 0L)
      .select("query_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(0L, 100L))
    // parity: the union of served hits == one batch lookup over all
    // three queries
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.select("query_id", "vec_id", "score")
        .collect().toSeq.map(_.toSeq)
        .sortBy(r => (r(0).toString.toLong, r(1).toString.toLong))
    val expected = SimilarityQueries.annBatchLookup(spark, sf(),
      (batch1 ++ batch2).toDF())
    assert(rows(served) === rows(expected))
    assert(rows(served).nonEmpty)
  }
}
