package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DedupQueries, TextQueries}

/** The forget stream RUNNING BESIDE the door chain — the production
  * governance story: deletion requests land while ingest keeps
  * flowing (the staged tombstone writes share no committer tree with
  * the chain's maintenance appends), a re-upload of a FORGOTTEN
  * document clears the admission gate as new data, a re-upload of a
  * retained one stays rejected, and the final index — compacted, so
  * the deletes are physical — equals a from-scratch build over
  * exactly ((seed ∪ admitted) minus forgotten).
  */
case class FcDoc(doc_id: Long, text: String, lang: String)

class ForgetBesideChainSpec extends SparkSpec {

  test("deletion requests land mid-ingest; forgotten docs re-admit; index exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fchain")
    val corpusDir = root.resolve("corpus").toString
    val incoming = root.resolve("incoming").toString
    val doorDir = root.resolve("door").toString
    val admitted = root.resolve("admitted").toString
    val requests = root.resolve("requests").toString
    // isolated vocabularies (every token unique to its doc), so the
    // only near-dup structure is what the test plants — a forgotten
    // doc has no remaining neighbor to block its re-admission; ids
    // encode as LETTERS so the script-drift axis sees a batch shaped
    // exactly like the corpus
    def body(i: Long) = {
      val tag = i.toString.map(c => ('a' + (c - '0')).toChar).mkString
      s"w${tag}a w${tag}b w${tag}c w${tag}d w${tag}e w${tag}f"
    }
    val seed = (1 to 40).map(i =>
      FcDoc(i.toLong, body(i.toLong), if (i % 2 == 0) "en" else "de"))
    seed.toDF().write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")

    def feed(rows: Seq[FcDoc]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(incoming)
    def drain(qs: Seq[org.apache.spark.sql.streaming.StreamingQuery]): Unit = {
      var again = true
      while (again) {
        val before = qs.map(q =>
          Option(q.lastProgress).map(_.batchId).getOrElse(-1L))
        qs.foreach(_.processAllAvailable())
        again = before != qs.map(q =>
          Option(q.lastProgress).map(_.batchId).getOrElse(-1L))
      }
    }

    val chain = StreamingOps.doorChain(spark, corpusDir, incoming, doorDir,
      admitted, scriptAxis = true)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(requests))
    val reqSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    val forgetQ = StreamingOps.indexForgetStream(
        spark.readStream.schema(reqSchema).parquet(requests), corpusDir)
      .option("checkpointLocation", root.resolve("fckpt").toString)
      .start()
    val victims = Seq(3L, 7L)
    try {
      // batch A flows while the forget stream idles beside the chain
      feed((100 to 103).map(i => FcDoc(i.toLong, body(i.toLong),
        if (i % 2 == 0) "en" else "de")))
      drain(chain)
      // the deletion request lands WITHOUT stopping the chain
      victims.toDF("doc_id").coalesce(1).write.mode("append").parquet(requests)
      forgetQ.processAllAvailable()
      // batch B: an exact copy of forgotten doc 3 (new id 500 — must
      // ADMIT: we no longer hold the original) and of retained doc 5
      // (id 501 — must stay REJECTED)
      feed(Seq(FcDoc(500L, body(3L), "en"), FcDoc(501L, body(5L), "de")))
      drain(chain)
    } finally { chain.foreach(_.stop()); forgetQ.stop() }

    val admittedIds = spark.read.parquet(admitted)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(admittedIds === Seq(100L, 101L, 102L, 103L, 500L),
      "the gate should re-admit a copy of a FORGOTTEN doc and keep " +
        s"rejecting a retained one's copy; got $admittedIds")

    // the compacted index == a from-scratch build over exactly
    // ((seed ∪ admitted) minus forgotten)
    val layout = TextQueries.invIndexCompact(spark, corpusDir)
    DedupQueries.simhashCompact(spark, corpusDir)
    val tDir = java.nio.file.Files.createTempDirectory("graft_fchain_t").toString
    (seed.filterNot(d => victims.contains(d.doc_id)) ++
      (100 to 103).map(i => FcDoc(i.toLong, body(i.toLong),
        if (i % 2 == 0) "en" else "de")) :+ FcDoc(500L, body(3L), "en"))
      .toDF().write.mode("overwrite").parquet(s"$tDir/documents.parquet")
    // compact is also the public ensure-the-layout entry (a fresh
    // build then a no-op repack), and returns the layout path
    val tLayout = TextQueries.invIndexCompact(spark, tDir)
    def postings(l: String) = spark.read.parquet(s"$l/postings")
      .select("tok", "doc_id", "dl", "tf", "tb")
      .collect().map(_.toSeq).toSeq
      .sortBy(r => (r.head.toString, r(1).toString.toLong))
    assert(postings(layout) === postings(tLayout),
      "the chain+forget index diverged from the sequential truth")
    def stats(l: String) = spark.read.parquet(s"$l/stats")
      .agg(sum(col("n_docs")), sum(col("t_tokens"))).head.toSeq
    assert(stats(layout) === stats(tLayout), "stats skewed (idf/avgdl)")
  }
}
