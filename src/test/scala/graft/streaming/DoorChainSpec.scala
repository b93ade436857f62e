package graft.streaming

import graft.SparkSpec

/** The launchable production composition (`Ctl door-run` →
  * [[StreamingOps.doorChain]]): real file sources end to end, the
  * checkpointed restart picking up exactly where the chain stopped.
  */
case class ChainDoc(doc_id: Long, text: String, lang: String)

class DoorChainSpec extends SparkSpec {

  test("doorChain routes, admits and maintains over file sources; restart resumes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_chain")
    val corpusDir = root.resolve("corpus").toString
    val incoming = root.resolve("incoming").toString
    val doorDir = root.resolve("door").toString
    val admitted = root.resolve("admitted").toString
    val seed = (1 to 40).map(i =>
      ChainDoc(i.toLong, s"corpus document number $i with body text",
        if (i % 2 == 0) "en" else "de"))
    seed.toDF().write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")

    def drain(qs: Seq[org.apache.spark.sql.streaming.StreamingQuery]): Unit =
      qs.foreach(_.processAllAvailable())

    val chain = StreamingOps.doorChain(spark, corpusDir, incoming, doorDir,
      admitted, scriptAxis = true)
    try {
      // batch A: representative mix, novel bodies → passes the door,
      // clears the admission gate, lands in the serving path
      (100 to 103).map(i => ChainDoc(i.toLong,
        s"fresh novel wording item $i entirely different phrasing",
        if (i % 2 == 0) "en" else "de"))
        .toDF().write.mode("append").parquet(incoming)
      drain(chain)
      // batch B: perfect language mix, all-digit junk — the script
      // axis quarantines the whole batch; it never reaches the gate
      (200 to 203).map(i => ChainDoc(i.toLong, "0123 4567 8901",
        if (i % 2 == 0) "en" else "de"))
        .toDF().write.mode("append").parquet(incoming)
      drain(chain)
    } finally chain.foreach(_.stop())

    assert(spark.read.parquet(s"$doorDir/passed")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === (100L to 103L))
    assert(spark.read.parquet(s"$doorDir/quarantined")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === (200L to 203L))
    assert(spark.read.parquet(admitted)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === (100L to 103L))

    // restart from the same checkpoints: nothing reprocesses (the
    // marker/batchId state survives), and a NEW batch flows through
    val chain2 = StreamingOps.doorChain(spark, corpusDir, incoming, doorDir,
      admitted, scriptAxis = true)
    try {
      drain(chain2)
      assert(spark.read.parquet(admitted).count() === 4,
        "a restart must not re-admit what already landed")
      (300 to 301).map(i => ChainDoc(i.toLong,
        s"second wave completely new material $i unrelated words",
        if (i % 2 == 0) "en" else "de"))
        .toDF().write.mode("append").parquet(incoming)
      drain(chain2)
    } finally chain2.foreach(_.stop())
    assert(spark.read.parquet(admitted)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(100L, 101L, 102L, 103L, 300L, 301L))
  }
}
