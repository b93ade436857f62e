package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The federated serve composition ([[TextQueries.federatedSearch]],
  * registered as `q_federated_search` with a DuckDB oracle): shard
  * sub-corpora with their OWN indexes and LOCAL BM25 stats answer
  * local top-ks, a merger re-sorts ≤ N·k rows. What the oracle can't
  * pin, this does: the shard assignment is honest (every served row's
  * doc_id residue equals its shard tag) at MORE THAN ONE shard count
  * (the coordinator is N-generic, not a two-shard special case), and
  * the WHOLE chain — shard split AND the per-shard indexes behind
  * it — follows the corpus stamp, so a regenerated corpus re-splits
  * and re-indexes instead of serving a stale shard of the old corpus.
  */
class FederatedSearchSpec extends SparkSpec {

  test("shard tags are honest at two shard counts; split + indexes follow the corpus stamp") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fsearch").toString
    val docs = graft.GraftSession.table(spark, sf(), "documents")
    docs.where(col("doc_id") < 300)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (n <- Seq(2, TextQueries.FederatedShards)) {
      val r = TextQueries.federatedSearchAt(spark, dir, n).collect()
      assert(r.nonEmpty, s"the synthetic corpus must score the query terms (n=$n)")
      // the shard tag is the routing truth, not a label: residue match
      r.foreach(x => assert((x.getLong(0) % n).toInt === x.getAs[Int]("shard"),
        s"doc ${x.getLong(0)} served under shard ${x.getAs[Int]("shard")} of $n"))
      assert(r.exists(_.getLong(0) >= 100L),
        "fixture too small for the staleness leg: widen the first filter")
    }
    // a different N is a DIFFERENT federation: its split may not reuse
    // the other's shard dirs (fed_shards_n2 and _n4 stand side by side)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
      graft.GraftSession.fixtureRoot(dir), "fed_shards_n2", "s1")))
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
      graft.GraftSession.fixtureRoot(dir),
      s"fed_shards_n${TextQueries.FederatedShards}",
      s"s${TextQueries.FederatedShards - 1}")))

    // the corpus REGENERATES smaller — both the residue split and each
    // shard's inverted index must re-derive (stamp chain), so no doc
    // outside the new corpus may be served, at either shard count
    docs.where(col("doc_id") < 100)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (n <- Seq(2, TextQueries.FederatedShards)) {
      val r2 = TextQueries.federatedSearchAt(spark, dir, n).collect()
      assert(r2.forall(_.getLong(0) < 100L),
        s"stale shard served after a corpus change (n=$n): ${r2.map(_.getLong(0)).toSeq}")
      r2.foreach(x => assert((x.getLong(0) % n).toInt === x.getAs[Int]("shard")))
    }
  }
}
