package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingOps

/** The COMPOSED live-ingest story, end to end on one session — every
  * piece is individually parity-pinned in its own spec, this pins that
  * they compose: a stream of incoming documents flows through
  *
  *   0. the distribution-drift DOOR ([[StreamingOps.driftRouteStream]]
  *      in its production shape — BOTH axes on, language mix OR script
  *      mix, self-maintaining references: a batch that doesn't look
  *      like the corpus is quarantined whole — it never costs a
  *      fingerprint pass),
  *   1. near-dup ADMISSION ([[StreamingOps.nearDupGateStream]] tailing
  *      the door's `passed` directory; the gate also maintains the
  *      simhash index with what it admits, so batch N+1 is gated
  *      through batch N),
  *   2. inverted-index MAINTENANCE ([[StreamingOps.indexMaintainStream]]
  *      tailing the admitted directory — the index tracks exactly what
  *      the gates let in),
  *   3. a SERVING probe (BM25 from the maintained index),
  *
  * and the end state must equal the batch pipeline over the admitted
  * union: the standing simhash relation matches a from-scratch
  * fingerprint build over (seed ∪ admitted), and the index-served BM25
  * scores match the scan-path twin over the same union corpus.
  * (Lives in the operators package for the twins' test-only
  * visibility.)
  */
case class E2eDoc(doc_id: Long, text: String, lang: String)

class StreamingE2eSpec extends SparkSpec {

  test("drift door → near-dup gate → index maintenance → serving == batch pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def corpusify(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    // standing corpus: one long doc (near-copy bait) + one with the
    // BM25 query terms, layouts warm before the streams start
    val longSeed = (1 to 120).map(i => s"seed$i").mkString(" ")
    val seed = Seq(1L -> longSeed, 2L -> "spark merge data spark corpus")
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    corpusify(seed).write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    DedupQueries.warmLayouts(spark, corpusDir)
    TextQueries.warmLayouts(spark, corpusDir)

    val longNew = (1 to 120).map(i => s"tok$i").mkString(" ")
    val batch0 = Seq(
      E2eDoc(300L, longNew, "en"), // fresh long doc
      E2eDoc(301L, "spark data merge fresh analytics words", "en"))
    val batch1 = Seq(
      E2eDoc(310L, longNew, "en"), // copy of batch-0's 300 (hamming 0) — REJECT
      E2eDoc(311L, longSeed + " coda", "en"), // near-copy of corpus 1 — REJECT
      E2eDoc(312L, "merge spark entirely novel document body", "en"))
    // a wrong-language scrape: the DOOR quarantines the whole batch,
    // so its (otherwise fresh) documents never reach the index
    val batch2 = Seq(
      E2eDoc(320L, "totally fresh words that would pass the dup gate", "zz"),
      E2eDoc(321L, "more fresh words in the wrong language", "zz"))

    val outRoot = java.nio.file.Files.createTempDirectory("graft_e2e_out")
    val doorDir = outRoot.resolve("door").toString
    val admittedDir = outRoot.resolve("admitted").toString
    // no manual mkdir: each stream builder creates its own sink dirs,
    // so the tailing composition needs no out-of-band setup

    val routedSchema = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "text", "lang", "batch_id").schema

    val input = MemoryStream[E2eDoc]
    // the production door shape: BOTH drift axes on (language mix +
    // script mix, OR of verdicts) and both references self-maintaining
    val door = StreamingOps.driftRouteStream(
      input.toDF(), corpusDir, doorDir, scriptAxis = true).start()
    val gate = StreamingOps.nearDupGateStream(
      spark.readStream.schema(routedSchema).parquet(s"$doorDir/passed"),
      corpusDir, admittedDir).start()
    val maintain = StreamingOps.indexMaintainStream(
      spark.readStream.schema(routedSchema).parquet(admittedDir),
      corpusDir).start()
    def drain(): Unit = {
      door.processAllAvailable()
      gate.processAllAvailable()
      maintain.processAllAvailable()
    }
    try {
      input.addData(batch0: _*); drain()
      input.addData(batch1: _*); drain()
      input.addData(batch2: _*); drain()
    } finally { door.stop(); gate.stop(); maintain.stop() }

    // 0. the door: two batches passed, the wrong-language one
    // quarantined whole; the audit trail records all three verdicts
    def axisDrifted(r: org.apache.spark.sql.Row, name: String): Boolean =
      r.getAs[Map[String, org.apache.spark.sql.Row]]("axes")(name)
        .getAs[Boolean]("drifted")
    val audit = spark.read.parquet(s"$doorDir/audit")
      .orderBy("batch_id").collect()
      .map(r => (r.getAs[Long]("batch_id"), axisDrifted(r, "lang"),
        axisDrifted(r, "script"), r.getAs[Boolean]("drifted")))
    // fresh en batches pass BOTH axes (their digit-bearing token shape
    // mirrors the seed corpus); the zz scrape flags on language AND on
    // script (its all-letter bodies lack the corpus's digit mass)
    assert(audit.toSeq === Seq(
      (0L, false, false, false),
      (1L, false, false, false),
      (2L, true, true, true)), audit.mkString(", "))
    assert(spark.read.parquet(s"$doorDir/quarantined")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(320L, 321L))

    // 1. admissions: near-copies of the corpus AND of an earlier
    // admission rejected; quarantined docs never reached this gate
    val admitted = spark.read.parquet(admittedDir)
    assert(admitted.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(300L, 301L, 312L))

    // the batch pipeline's view: the union corpus in its own dir
    val unionDir = outRoot.resolve("union").toString
    corpusify(seed ++ Seq(
      300L -> longNew,
      301L -> "spark data merge fresh analytics words",
      312L -> "merge spark entirely novel document body"))
      .write.mode("overwrite").parquet(s"$unionDir/documents.parquet")

    // 2. standing simhash relation == from-scratch build over the union
    def fps(dir: String): Seq[(Long, Long)] =
      DedupQueries.dedupSimhash(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fps(corpusDir) === fps(unionDir),
      "gate-maintained fingerprints must equal a rebuild over seed ∪ admitted")

    // 3. serving probe: BM25 from the maintained index == the scan
    // twin over the union corpus (one scorer, two paths)
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scores(TextQueries.bm25Scored(spark, corpusDir)) ===
      scores(TextQueries.bm25ScoredScan(spark, unionDir)),
      "index-served BM25 must equal the batch scan over seed ∪ admitted")
  }
}
