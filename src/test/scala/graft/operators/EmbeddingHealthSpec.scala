package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The embedding preflight audit (`q_embedding_health`): every
  * pathology class planted once, every counter catches exactly its
  * case — a NULL vector, a NULL element, a NaN, an infinity, a
  * zero-norm vector and a wrong-dimension vector over a healthy base.
  */
class EmbeddingHealthSpec extends SparkSpec {

  test("each planted pathology increments exactly its counter") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_emb_health").toString
    val good = (0L until 10L).map(i =>
      (i, Some(Seq.tabulate(4)(j => 0.1f * (j + 1) + i))))
    val bad: Seq[(Long, Option[Seq[Float]])] = Seq(
      (100L, None),                                       // null vector
      (101L, Some(Seq(1f, 2f, 3f, Float.NaN))),           // NaN element
      (102L, Some(Seq(1f, 2f, 3f, Float.PositiveInfinity))), // +inf
      (103L, Some(Seq(0f, 0f, 0f, 0f))),                  // zero norm
      (104L, Some(Seq(1f, 2f))))                          // wrong dim
    (good ++ bad).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // a null ELEMENT can't ride a Seq[Float] encoder; append it raw
    spark.sql("SELECT CAST(105 AS BIGINT) AS vec_id, " +
      "array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT), " +
      "CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS embedding")
      .write.mode("append").parquet(s"$dir/embeddings.parquet")

    val r = SimilarityQueries.embeddingHealth(spark, dir).collect()(0)
    val byName = r.schema.fieldNames.zipWithIndex
      .map { case (f, i) => f -> r.getLong(i) }.toMap
    assert(byName("n_vectors") === 16)
    assert(byName("n_null_vec") === 1)
    assert(byName("n_null_elem") === 1)
    assert(byName("n_nonfinite") === 2, "NaN and inf both count")
    assert(byName("n_zero_norm") >= 1, "the planted zero vector counts")
    assert(byName("dim_min") === 2 && byName("dim_max") === 4)
  }
}
