package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion propagation into the standing simhash fingerprint index
  * (`simhashForget`): tombstoned documents vanish from near-dup
  * pairing exactly as a rebuild over the remaining corpus would
  * (fingerprints are per-document, so hiding rows IS the rebuild),
  * the ADMISSION GATE stops treating them as held corpus (a re-upload
  * of a forgotten document is new data again), a retried request
  * never re-counts, and compaction applies the delete physically.
  */
class SimhashForgetSpec extends SparkSpec {

  test("forget == rebuild-over-remaining; gate re-admits; compaction physical") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sforget").toString
    val docs = graft.GraftSession.table(spark, sf(), "documents")
      .where(col("doc_id") < 400)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val before = DedupQueries.dedupSimhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(before.nonEmpty, "fixture slice produced no near-dup pairs")
    // victims: one endpoint of the first pair, plus a NEVER-paired doc
    // (pairs are exact at hamming ≤ 3, so never-paired means nothing
    // else stands within the gate's threshold — the clean re-admission
    // case below)
    val paired = before.flatMap(p => Seq(p._1, p._2)).toSet
    val unpaired = docs.select("doc_id").collect().map(_.getLong(0))
      .filterNot(paired).sorted
    assert(unpaired.length >= 2, "fixture slice has no never-paired docs")
    val victims = Seq(before.head._1, unpaired.head)

    val dn = DedupQueries.simhashForget(spark, dir, victims)
    assert(dn === victims.size.toLong)

    // ground truth: a fresh fingerprint index over the remaining docs
    val truth = java.nio.file.Files
      .createTempDirectory("graft_sforget_truth").toString
    docs.where(!col("doc_id").isin(victims: _*))
      .write.mode("overwrite").parquet(s"$truth/documents.parquet")
    def pairs(d: String) = DedupQueries.dedupSimhashPairs(spark, d)
      .collect().map(_.toSeq).toSeq
    val served = pairs(dir)
    assert(!served.exists(r =>
      victims.contains(r.head) || victims.contains(r(1))))
    assert(served === pairs(truth),
      "tombstoned pairing diverged from the rebuild-over-remaining")

    // the admission gate: an EXACT COPY of the forgotten NEVER-PAIRED
    // document (new id) must now be ADMITTED — we no longer hold the
    // original and nothing else is within the gate's threshold —
    // while a copy of a retained document stays rejected (distance 0
    // to its standing original)
    val retained = unpaired(1)
    val incoming = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").isin(unpaired.head, retained))
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val admitted = DedupQueries.nearDupAdmitFor(spark, dir, incoming)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.contains(unpaired.head + 5000000L),
      "gate still rejects a copy of a FORGOTTEN document")
    assert(!admitted.contains(retained + 5000000L),
      "gate admitted a copy of a retained document")

    // idempotent: re-forgetting the same cohort changes nothing
    assert(DedupQueries.simhashForget(spark, dir, victims) === 0L)
    assert(pairs(dir) === served)

    // compaction: deletes go physical, tombstones retire, pairs
    // invariant
    val fp = DedupQueries.simhashCompact(spark, dir)
    val remaining = spark.read.parquet(fp)
      .where(col("doc_id").isin(victims: _*)).count()
    assert(remaining === 0L, "compaction left physical victim rows")
    // consumed tombstones retired; the dir may stand EMPTY (deleting
    // it raced a concurrent forget's staged move — see
    // retireTombstones) and reads as no-tombstones everywhere
    assert(!graft.GraftSession.hasVisibleData(
      java.nio.file.Paths.get(fp).getParent.resolve("tombstones")))
    assert(pairs(dir) === served, "compaction changed served pairs")
  }
}
