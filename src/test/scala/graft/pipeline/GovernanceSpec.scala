package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupQueries, SimilarityQueries, TextQueries}

/** The governance dispatch over a corpus where ALL FOUR per-document
  * layouts stand: one `applyForget` call reports per-layout counts in
  * a fixed order, `pendingForgets` shows every layout's tombstones,
  * and the compaction verbs drain them to zero — the full-surface
  * twin of the doc-layouts-only HTTP round trip.
  */
class GovernanceSpec extends SparkSpec {

  test("applyForget and pendingForgets cover all four standing layouts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gov").toString
    graft.GraftSession.table(spark, sf(), "documents")
      .where(col("doc_id") < 300)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 300)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // stand all four layouts up
    assert(TextQueries.bm25Topk(spark, dir).count() > 0)
    assert(DedupQueries.dedupSimhashPairs(spark, dir).count() >= 0)
    assert(SimilarityQueries.annIvfPq(spark, dir).count() > 0)
    assert(SimilarityQueries.knnGraphIndexed(spark, dir).count() > 0)

    val ids = Seq(3L, 7L) // present in both id spaces
    val applied = Governance.applyForget(spark, dir, ids)
    assert(applied.map(_._1) === Seq("invindex", "simhash", "ivfpq", "knn"),
      s"dispatch order/coverage changed: $applied")
    assert(applied.toMap.apply("simhash") === """{"docs":2}""")
    assert(applied.toMap.apply("ivfpq") === """{"vectors":2}""")
    assert(applied.toMap.apply("knn") === """{"vectors":2}""")

    val pending = Governance.pendingForgets(spark, dir).toMap
    assert(pending === Map("invindex" -> 2L, "simhash" -> 2L,
      "ivfpq" -> 2L, "knn" -> 2L), s"pending: $pending")

    // a retry is absorbed everywhere
    val again = Governance.applyForget(spark, dir, ids).toMap
    assert(again("invindex") === """{"docs":0,"tokens":0}""")
    assert(again("knn") === """{"vectors":0}""")

    // the physical deletes drain the counters
    TextQueries.invIndexCompact(spark, dir)
    DedupQueries.simhashCompact(spark, dir)
    SimilarityQueries.ivfPqCompact(spark, dir)
    SimilarityQueries.knnCompact(spark, dir)
    val drained = Governance.pendingForgets(spark, dir).toMap
    assert(drained === Map("invindex" -> 0L, "simhash" -> 0L,
      "ivfpq" -> 0L, "knn" -> 0L), s"after compact: $drained")
  }
}
