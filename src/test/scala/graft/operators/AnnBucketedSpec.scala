package graft.operators

import graft.SparkSpec

class AnnBucketedSpec extends SparkSpec {

  test("bucketed ANN prunes partitions and matches the filter-based LSH") {
    val bucketed = SimilarityQueries.annLshBucketed(spark, sf())
    val plan = bucketed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the probe reaches the scan as a partition filter — one bucket
    // directory read, not a full scan + filter
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("bucket"), plan)
    val viaFilter = SimilarityQueries.annLsh(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaLayout = bucketed
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaLayout === viaFilter)
  }
}
