package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The federated serve composition ([[TextQueries.federatedSearch]],
  * registered as `q_federated_search` with a DuckDB oracle): shard
  * sub-corpora with their OWN indexes and LOCAL BM25 stats answer
  * local top-ks, a merger re-sorts ≤ N·k rows. What the oracle can't
  * pin, this does: the shard assignment is honest (every served row's
  * doc_id parity equals its shard tag), and the WHOLE chain — shard
  * split AND the per-shard indexes behind it — follows the corpus
  * stamp, so a regenerated corpus re-splits and re-indexes instead of
  * serving a stale shard of the old corpus.
  */
class FederatedSearchSpec extends SparkSpec {

  test("shard tags are honest; split + indexes follow the corpus stamp") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fsearch").toString
    val docs = graft.GraftSession.table(spark, sf(), "documents")
    docs.where(col("doc_id") < 300)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r1 = TextQueries.federatedSearch(spark, dir).collect()
    assert(r1.nonEmpty, "the synthetic corpus must score the query terms")
    // the shard tag is the routing truth, not a label: parity match
    r1.foreach(r => assert((r.getLong(0) % 2).toInt === r.getAs[Int]("shard"),
      s"doc ${r.getLong(0)} served under shard ${r.getAs[Int]("shard")}"))
    assert(r1.exists(_.getLong(0) >= 100L),
      "fixture too small for the staleness leg: widen the first filter")

    // the corpus REGENERATES smaller — both the parity split and each
    // shard's inverted index must re-derive (stamp chain), so no doc
    // outside the new corpus may be served
    docs.where(col("doc_id") < 100)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r2 = TextQueries.federatedSearch(spark, dir).collect()
    assert(r2.forall(_.getLong(0) < 100L),
      s"stale shard served after a corpus change: ${r2.map(_.getLong(0)).toSeq}")
    r2.foreach(r => assert((r.getLong(0) % 2).toInt === r.getAs[Int]("shard")))
  }
}
