package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.SimilarityQueries

/** The eval-set firewall stream: an incoming exact copy of an eval
  * vector is diverted to `contaminated` WITH its evidence (matched
  * eval id, cosine ~1), ordinary traffic lands in `clean`, and —
  * the contract that distinguishes this gate from the near-dup
  * admission gate — verdicts are FROZEN against the fixed reference:
  * a copy of a previously-admitted clean row still passes in a later
  * batch (nothing admitted ever joins the reference). Stream verdicts
  * must equal the batch form's for the same rows.
  */
case class GuardVec(vec_id: Long, embedding: Seq[Float])

class EvalGuardStreamSpec extends SparkSpec {

  private def fold(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    Integer.parseInt(d.take(2).map(b => f"$b%02x").mkString, 16) % 10
  }

  test("eval copy diverted with evidence; clean passes; verdicts frozen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.GraftSession.table(spark, sf(), "embeddings")
      .select("vec_id", "embedding").collect()
    val evalSrc = emb.find(r => fold(r.getLong(0)) == 9).get
    val cleanSrc = emb.find(r => fold(r.getLong(0)) != 9).get
    val leak = GuardVec(5000001L, evalSrc.getSeq[Float](1))
    val ok = GuardVec(5000002L, cleanSrc.getSeq[Float](1))
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_evalguard_out").toString

    val input = MemoryStream[GuardVec]
    val q = StreamingOps.evalGuardStream(input.toDF(), sf(), outDir).start()
    try {
      input.addData(leak, ok)
      q.processAllAvailable()
      // batch 1: an exact copy of the row batch 0 admitted — must
      // STILL pass (the reference is fixed; admissions never join it)
      input.addData(GuardVec(5000003L, cleanSrc.getSeq[Float](1)))
      q.processAllAvailable()
    } finally q.stop()

    val cont = spark.read.parquet(s"$outDir/contaminated")
      .select("vec_id", "match_vec_id", "cosine", "batch_id").collect()
    assert(cont.length === 1)
    assert(cont(0).getLong(0) === 5000001L)
    assert(cont(0).getLong(1) === evalSrc.getLong(0),
      "evidence must name the matched eval vector")
    assert(cont(0).getDouble(2) > 0.9999)
    assert(cont(0).getLong(3) === 0L)
    val clean = spark.read.parquet(s"$outDir/clean")
      .select("vec_id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(clean === Seq((5000002L, 0L), (5000003L, 1L)))

    // stream verdicts == batch form over the same rows
    val batchV = SimilarityQueries
      .evalGuardFor(spark, sf(), Seq(leak, ok).toDF())
      .select("vec_id", "contaminated").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    assert(batchV === Seq((5000001L, true), (5000002L, false)))
  }

  test("a corpus restamp rebuilds the eval reference (staleness contract)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_evalref_stale").toString
    val emb = graft.GraftSession.table(spark, sf(), "embeddings")
      .select("vec_id", "embedding")
    val evalId = graft.GraftSession.table(spark, sf(), "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).find(fold(_) == 9).get
    // v1 corpus WITHOUT that eval vector: a copy of it must pass
    emb.where(col("vec_id") =!= evalId)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val probe = emb.where(col("vec_id") === evalId)
      .select(lit(8000001L).as("vec_id"), col("embedding"))
    val v1 = SimilarityQueries.evalGuardFor(spark, dir, probe)
      .select("contaminated").collect()(0).getBoolean(0)
    assert(!v1, "vector absent from the reference must pass")
    // v2 corpus WITH it: the layout must rebuild at the new stamp and
    // the same probe must now be diverted
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val v2 = SimilarityQueries.evalGuardFor(spark, dir, probe)
      .select("contaminated").collect()(0).getBoolean(0)
    assert(v2, "a stale reference served after the corpus restamp")
  }
}
