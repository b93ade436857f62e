package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion propagation into the standing IVF-PQ index
  * (`ivfPqForget`): a tombstoned vector stops being retrievable —
  * excluded BEFORE the ADC ranking, so it does not even occupy a
  * rerank slot — the books/centroids stay frozen (trained aggregates,
  * not per-vector rows), a retried request never re-counts, and
  * compaction applies the delete physically with served rows
  * invariant.
  */
class IvfPqForgetSpec extends SparkSpec {

  test("forget hides victims pre-ADC; idempotent; compaction physical") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqforget").toString
    graft.GraftSession.table(spark, sf(), "embeddings")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val before = SimilarityQueries.annIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(before.nonEmpty)
    // vec 0 is the fixture's query vector: rank 1 by self-similarity.
    // Forgetting it is the sharp case — the QUERY keeps working (an
    // external input), the vector itself must leave the results.
    assert(before.head._1 === 0L)
    val victims = before.take(2).map(_._1)

    val dn = SimilarityQueries.ivfPqForget(spark, dir, victims)
    assert(dn === 2L)

    val after = SimilarityQueries.annIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after.size === before.size, "top-k no longer fills")
    assert(!after.exists(r => victims.contains(r._1)),
      "a forgotten vector is still retrievable")
    // every old survivor stays served (only 2 slots freed, so even if
    // 2 fresh ADC candidates enter the rerank pool and outscore them,
    // 8 + 2 = 10 all fit) and their relative order is untouched (the
    // books are frozen — only candidate membership moved)
    val survivors = before.drop(2)
    assert(survivors.forall(after.contains),
      "an old survivor fell out of the top-k")
    assert(after.filter(survivors.contains) === survivors,
      "survivor relative order changed — the filter leaked past membership")

    // idempotent
    assert(SimilarityQueries.ivfPqForget(spark, dir, victims) === 0L)

    // compaction: physical, tombstones retired, serve invariant
    val layout = SimilarityQueries.ivfPqCompact(spark, dir)
    val remaining = spark.read.parquet(s"$layout/codes")
      .where(col("vec_id").isin(victims: _*)).count()
    assert(remaining === 0L, "compaction left physical victim rows")
    // consumed tombstones retired; the dir may stand EMPTY (deleting
    // it raced a concurrent forget's staged move — see
    // retireTombstones) and reads as no-tombstones everywhere
    assert(!graft.GraftSession.hasVisibleData(
      java.nio.file.Paths.get(s"$layout/tombstones")))
    val served = SimilarityQueries.annIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served === after, "compaction changed served rows")
  }
}
