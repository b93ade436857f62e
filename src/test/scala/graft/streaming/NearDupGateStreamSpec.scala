package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupQueries

/** Live near-dup admission parity: documents fed through the streaming
  * gate must admit exactly the set the batch gate admits for the same
  * docs — near-copies of standing-corpus documents are rejected,
  * genuinely fresh text passes.
  */
case class GateDoc(doc_id: Long, text: String)

class NearDupGateStreamSpec extends SparkSpec {

  test("stream-gated admissions == batch gate; near-copies rejected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a standing corpus with one long document (whose near-copy must
    // be rejected) and some unrelated text
    val longText = (1 to 120).map(i => s"tok$i").mkString(" ")
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_gate").toString
    Seq((1L, longText), (2L, "completely different content here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    DedupQueries.warmLayouts(spark, corpusDir)

    // incoming: a near-copy of doc 1 (one token appended to 120 — well
    // within hamming 3) and a fresh document
    val nearCopy = GateDoc(100L, longText + " extra")
    val fresh = GateDoc(101L,
      "entirely novel words nowhere in the standing corpus at all")
    val outDir = java.nio.file.Files.createTempDirectory("graft_gate_out").toString

    val input = MemoryStream[GateDoc]
    // maintainIndex = false: this test pins PURE gate parity, so the
    // stream must not mutate the index the post-stream batch gate
    // re-reads (with maintain on, the admitted doc's own fingerprint
    // would — correctly — reject it on a second pass; that contract
    // is the next test's)
    val q = StreamingOps.nearDupGateStream(
      input.toDF(), corpusDir, s"$outDir/admitted",
      maintainIndex = false).start()
    try {
      input.addData(nearCopy, fresh)
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(s"$outDir/admitted")
    assert(admitted.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(101L), "near-copy rejected, fresh admitted")
    assert(admitted.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(0L))
    // parity with the batch gate over the same incoming relation
    val batchAdmitted = DedupQueries.nearDupAdmitFor(spark, corpusDir,
      Seq(nearCopy, fresh).toDF())
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(batchAdmitted === Seq(101L))
  }

  test("maintainIndex: batch N+1 is gated against what batch N admitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_gate2").toString
    Seq((1L, "seed corpus document"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    DedupQueries.warmLayouts(spark, corpusDir)

    val longText = (1 to 120).map(i => s"word$i").mkString(" ")
    val original = GateDoc(200L, longText)            // batch 0: fresh
    val nearCopy = GateDoc(201L, longText + " tail")  // batch 1: near-copy of 200
    val outDir = java.nio.file.Files.createTempDirectory("graft_gate2_out").toString

    val input = MemoryStream[GateDoc]
    val q = StreamingOps.nearDupGateStream(
      input.toDF(), corpusDir, s"$outDir/admitted").start()
    try {
      input.addData(original)
      q.processAllAvailable()
      input.addData(nearCopy)
      q.processAllAvailable()
    } finally q.stop()

    // the gate appended 200's fingerprint inside batch 0, so batch 1's
    // near-copy is rejected even though the CORPUS never contained 200
    val admitted = spark.read.parquet(s"$outDir/admitted")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(admitted === Seq(200L),
      "batch-1 near-copy of a batch-0 admission must be rejected")
  }
}
