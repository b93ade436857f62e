package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic decontamination (`q_decontaminate_semantic`): the planted
  * case the operator exists for — an eval-fold vector that is an exact
  * copy of a retained-corpus vector (the paraphrase-leakage stand-in:
  * cosine ≈ 1, guaranteed same LSH bucket) must surface that vector as
  * its top-1 match, while unplanted eval items on this near-random
  * corpus stay far below any plausible contamination threshold. Also
  * pins the sentinel contract: an eval item whose probe ring holds no
  * retained candidate reports (-1, -2.0), not a dropped row.
  */
class DecontaminateSemanticSpec extends SparkSpec {

  private def corpusDir(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_corpus").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The evalSplit fold convention (md5 bucket over the decimal id). */
  private def fold(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(2).map(b => f"$b%02x").mkString
    Integer.parseInt(hex, 16) % 10
  }

  test("planted eval copy of a retained vector is flagged at cosine ~1") {
    val ids = (0L until 300L)
    val evalId = ids.find(fold(_) == 9).get
    val srcId = ids.find(i => fold(i) != 9 && i != evalId).get
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 300)
    val srcEmb = base.where(col("vec_id") === srcId)
      .select("embedding").collect()(0).getSeq[Float](0)
    // replace the eval vector's embedding with the retained source's
    val planted = base.where(col("vec_id") =!= evalId)
      .select("vec_id", "embedding")
      .unionByName(base.where(col("vec_id") === srcId)
        .select(lit(evalId).as("vec_id"), col("embedding")))
    val dir = corpusDir(planted)
    val out = SimilarityQueries.decontaminateSemanticScan(spark, dir, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nEval = (0L until 300L).count(fold(_) == 9)
    assert(out.length === nEval, "one audit row per eval-fold vector")
    val hit = out.find(_._1 == evalId).get
    assert(hit._2 === srcId, s"planted copy should match its source: $hit")
    assert(hit._3 > 0.9999, s"exact copy should score cosine ~1: $hit")
    // every unplanted eval item stays far below a contamination
    // threshold on this near-random corpus
    val others = out.filter(_._1 != evalId)
    assert(others.forall(_._3 < 0.9), s"unplanted items should stay low")
  }

  test("an eval item with no retained ring candidate takes the sentinel") {
    val evalId = (0L until 300L).find(fold(_) == 9).get
    val only = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") === evalId).select("vec_id", "embedding")
    val dir = corpusDir(only)
    val out = SimilarityQueries.decontaminateSemanticScan(spark, dir, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((evalId, -1L, -2.0)))
  }
}
