package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental IVF-PQ maintenance: appended codes must be
  * bit-identical to a from-scratch encode of the union with the same
  * frozen codebooks, and the probe over the appended index must
  * surface the appended vectors.
  */
class IvfPqAppendSpec extends SparkSpec {

  test("append equals from-scratch encode with frozen books; probe sees appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_append").toString
    SimilarityQueries.buildIvfPq(spark, sf(), dir)
    val baseCodes = spark.read.parquet(s"$dir/codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getAs[Number](r.fieldIndex("cell")).longValue)).toSet

    // append shifted copies of the 50 best-known vectors
    val newVecs = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    SimilarityQueries.ivfPqAppend(spark, sf(), dir, newVecs)

    val afterCodes = spark.read.parquet(s"$dir/codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getAs[Number](r.fieldIndex("cell")).longValue)).toSet
    // standing codes untouched, appended rows present
    assert(baseCodes.subsetOf(afterCodes))
    assert(afterCodes.size === baseCodes.size + 50)
    // equivalence: an exact copy of vec v carries exactly v's codes and
    // cell (pqEncode is deterministic and books are frozen), so the
    // appended rows are the base rows of ids 0..49 with shifted ids
    val shifted = baseCodes.filter(_._1 < 50)
      .map { case (id, c0, c1, c2, c3, cell) => (id + 100000, c0, c1, c2, c3, cell) }
    assert(afterCodes -- baseCodes === shifted)

    // the probe over the appended index + grown corpus returns the
    // copy of the query vector (vec_id 0's copy scores identically to
    // vec_id 0 itself)
    val grown = graft.GraftSession.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
      .unionByName(newVecs)
    val top = SimilarityQueries.annIvfPqAt(spark, sf(), dir, grown).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top.contains(100000L), s"appended copy missing from ${top.keySet}")
    assert(top(100000L) === top(0L))
  }
}
