package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.md5LongLocal

/** Specs for the model-based quality operators: the hashing-trick
  * linear classifier, the stupid-backoff bigram LM scorer, and the
  * random-projection ANN. Expected values come from independent
  * driver-side re-derivations of the shared md5/integer recipes, not
  * from golden copies of the operators' own output.
  */
class QualityModelSpec extends SparkSpec {

  private def docsFixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_qm").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Driver-side twin of the classifier's bucket-weight recipe. */
  private def weightOf(tok: String): Long =
    md5LongLocal("w:" + (md5LongLocal(tok) % 1024)) % 2001 - 1000

  test("qualityClassifier scores the md5-bucket weight sum, length-normalized") {
    val dir = docsFixture(Seq(
      (1L, "alpha beta alpha"),
      (2L, "gamma"),
      (3L, "   "),   // whitespace-only: 0 tokens, score 0, keep 0
      (4L, null)))   // NULL text folds to empty — same verdict as doc 3
    val out = QualityRef.rows(TextQueries.qualityClassifier(spark, dir))
    val s1 = 2 * weightOf("alpha") + weightOf("beta")
    val s2 = weightOf("gamma")
    assert(out(1L) === ((3L, s1, math.floor(s1 / 3.0).toLong)))
    assert(out(2L) === ((1L, s2, math.floor(s2 / 1.0).toLong)))
    assert(out(3L) === ((0L, 0L, 0L)))
    assert(out(4L) === ((0L, 0L, 0L)))
    // the keep gate is exactly score_avg > 0
    val keeps = TextQueries.qualityClassifier(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(keeps(1L) === (if (math.floor(s1 / 3.0) > 0) 1L else 0L))
    assert(keeps(3L) === 0L)
  }

  test("qualityClassifier plan is join-free and shuffle-free up to the final sort") {
    val plan = TextQueries.qualityClassifier(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // no aggregation shuffle anywhere: scoring never hash-partitions
    // (the hashing trick has no vocabulary relation). The only
    // exchanges allowed are the presentation orderBy's range partition
    // and table()'s round-robin read fan-out.
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("lmScore applies bigram score, stupid backoff, and OOV zero") {
    // training half = even doc_ids. Model from docs 2 and 4:
    //   tokens: a b | a b c  -> uni: a:2 b:2 c:1, N=5
    //   bigrams: (a,b) | (a,b)(b,c) -> big: (a,b):2 (b,c):1
    val dir = docsFixture(Seq(
      (2L, "a b"),
      (4L, "a b c"),
      (1L, "a b x"),   // (a,b) seen; (b,x): x OOV -> 0
      (3L, "c a")))    // (c,a) unseen but a in uni -> backoff
    val out = TextQueries.lmScore(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val sAB = math.floor(1000000d * 2 / 2).toLong           // 1000000
    val sBC = math.floor(1000000d * 1 / 2).toLong           // 500000
    val sBackA = math.floor(400000d * 2 / 5).toLong         // 160000
    assert(out(2L) === ((1L, sAB)))
    assert(out(4L) === ((2L, math.floor((sAB + sBC) / 2.0).toLong)))
    assert(out(1L) === ((2L, math.floor((sAB + 0L) / 2.0).toLong)))
    assert(out(3L) === ((1L, sBackA)))
  }

  test("lmScore repeated bigrams weight by occurrence count") {
    val dir = docsFixture(Seq(
      (2L, "a b a b"),   // training: uni a:2 b:2 N=4; big (a,b):2 (b,a):1
      (1L, "a b a b a b")))
    val out = TextQueries.lmScore(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val sAB = math.floor(1000000d * 2 / 2).toLong
    val sBA = math.floor(1000000d * 1 / 2).toLong
    // doc 1: bigrams (a,b)x3, (b,a)x2 -> floor((3*sAB + 2*sBA)/5)
    assert(out(1L) === ((5L, math.floor((3 * sAB + 2 * sBA) / 5.0).toLong)))
  }

  test("annRp ranks the query vector itself first at distance 0, deterministically") {
    val out = SimilarityQueries.annRp(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 10)
    assert(out.head === ((0L, 0L)))
    assert(out.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    val re = SimilarityQueries.annRp(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(re.toSeq === out.toSeq)
  }
}

/** Row-shape helper shared by the classifier assertions. */
private object QualityRef {
  def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
}
