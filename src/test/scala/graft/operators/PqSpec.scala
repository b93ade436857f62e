package graft.operators

import graft.SparkSpec

/** PQ-compressed ANN: determinism, candidate bounds, and recall
  * against the exact scan. The driver's DuckDB oracle replays the full
  * pipeline (annIvfPqSql) — these pins guard the properties a hash
  * compare can't express (plan shape, recall floor).
  */
class PqSpec extends SparkSpec {

  test("annIvfPq is deterministic across runs") {
    val a = SimilarityQueries.annIvfPq(spark, sf("sf0.01")).collect().toSeq
    val b = SimilarityQueries.annIvfPq(spark, sf("sf0.01")).collect().toSeq
    assert(a === b)
    assert(a.length === 10)
  }

  test("annIvfPq prunes coarse cells and scans only the code columns") {
    val df = SimilarityQueries.annIvfPq(spark, sf("sf0.01"))
    // the probe's candidate stage ran eagerly (localCheckpoint); pin
    // the plan shape on a fresh probe plan over the same layout
    val layout = SimilarityQueries.ivfPqLayout(spark, sf("sf0.01"))
    val codes = spark.read.parquet(s"$layout/codes")
    import org.apache.spark.sql.functions._
    val probe = codes.where(col("cell").isin(0L, 1L))
      .select(col("vec_id"), col("c0"))
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // a NON-EMPTY partition filter on cell — 'PartitionFilters: []'
    // prints for any partitioned scan, so substring presence alone
    // would pin nothing
    val pf = "PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r
    assert(pf.findFirstIn(plan).isDefined, plan)
    // codes relation carries no float vectors at all — the scan can't
    // touch them even by accident
    assert(!codes.columns.contains("embedding"), codes.columns.mkString(","))
    assert(df.collect().length === 10)
  }

  test("annIvfPq recalls most of the exact top-10 and scores exactly") {
    val exact = SimilarityQueries.annBruteForce(spark, sf("sf0.01")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pq = SimilarityQueries.annIvfPq(spark, sf("sf0.01")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // re-ranked scores are the EXACT quantized dot — any vector the PQ
    // path returns must carry the same score the exact scan gives it
    pq.foreach { case (id, s) => exact.get(id).foreach(es => assert(es === s)) }
    val recall = pq.keySet.intersect(exact.keySet).size / 10.0
    assert(recall >= 0.6, s"recall@10 = $recall")
  }
}
