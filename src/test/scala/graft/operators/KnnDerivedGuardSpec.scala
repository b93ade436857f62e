package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reader-side concurrency guard on the derived mutual/ranks
  * relations (`knnDerivedReady`): derivation is consumer-triggered,
  * so without a claim two consumers that both saw `_DERIVED_OK`
  * absent would both derive and race the non-atomic dir swap. Pinned
  * deterministically (a held claim diverts the consumer to the
  * in-memory parity twin WITHOUT touching disk; a released claim lets
  * it derive once) and as a true two-consumer race (concurrent
  * Futures, both correct, exactly one standing derivation).
  */
class KnnDerivedGuardSpec extends SparkSpec {

  test("held claim → parity twin, no disk writes; released claim → one derivation; racing consumers both correct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dguard").toString
    val all = graft.GraftSession.table(spark, sf(), "embeddings")
      .select("vec_id", "embedding")
    // duplicates guarantee mutual pairs / clusters exist
    val dup = all.where(col("vec_id") < 25)
      .select((col("vec_id") + 700000L).as("vec_id"), col("embedding"))
    all.where(col("vec_id") < 200).unionByName(dup)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // stand the layout WITHOUT letting a consumer derive yet
    assert(SimilarityQueries.knnGraphIndexed(spark, dir).count() > 0)
    val layout = SimilarityQueries.knnLayoutPath(dir)
    val ok = java.nio.file.Paths.get(layout, "_DERIVED_OK")
    val claim = java.nio.file.Paths.get(layout, ".derive_stage")
    assert(!java.nio.file.Files.exists(ok))

    // another consumer "holds" the claim: this consumer must serve
    // the parity twin and leave the disk untouched
    java.nio.file.Files.createDirectory(claim)
    val twinClusters =
      try SimilarityQueries.knnClusters(spark, dir).collect().map(_.toSeq).toSeq
      finally graft.GraftSession.deleteRec(claim)
    assert(twinClusters.nonEmpty)
    assert(!java.nio.file.Files.exists(ok),
      "a diverted consumer must not write the marker")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(layout, "mutual")),
      "a diverted consumer must not materialize derived dirs")

    // claim released: the next consumer derives exactly once, and the
    // standing result equals the twin
    val derived = SimilarityQueries.knnClusters(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(java.nio.file.Files.exists(ok))
    assert(!java.nio.file.Files.exists(claim), "claim must clear after derivation")
    assert(derived === twinClusters,
      "standing derivation diverged from the parity twin")

    // true race: invalidate, then two consumers concurrently — both
    // correct, exactly one derivation stands, no mid-swap read crash
    java.nio.file.Files.deleteIfExists(ok)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val fc = Future(SimilarityQueries.knnClusters(spark, dir)
      .collect().map(_.toSeq).toSeq)
    val fr = Future(SimilarityQueries.knnCentrality(spark, dir)
      .collect().map(_.toSeq).toSeq)
    val rc = Await.result(fc, 5.minutes)
    val rr = Await.result(fr, 5.minutes)
    assert(rc === derived, "racing clusters consumer diverged")
    val centAgain = SimilarityQueries.knnCentrality(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(rr === centAgain, "racing centrality consumer diverged")
    assert(java.nio.file.Files.exists(ok) &&
      !java.nio.file.Files.exists(claim))
  }
}
