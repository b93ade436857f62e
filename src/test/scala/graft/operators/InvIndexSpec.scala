package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The standing inverted index behind the retrieval stack: every
  * indexed query must equal its corpus-scan twin row for row, the
  * probe must prune posting buckets at the file listing, and a
  * rewritten corpus must invalidate the layout (staleness).
  */
class InvIndexSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Stats as the summed relation — on disk it is a base row plus one
    * delta partial per append (what makes concurrent appends legal).
    */
  private def statsOf(layout: String): (Long, Long) = {
    val r = spark.read.parquet(s"$layout/stats")
      .agg(sum(col("n_docs")), sum(col("t_tokens"))).head
    (r.getLong(0), r.getLong(1))
  }

  test("bm25: index path == scan path") {
    val idx = rows(TextQueries.bm25Topk(spark, sf()))
    val scan = rows(TextQueries.bm25ScoredScan(spark, sf())
      .orderBy(col("bm25_ppm").desc, col("doc_id")).limit(20))
    assert(idx === scan)
    assert(idx.nonEmpty)
  }

  test("phrase: positional index path == token-stream scan path") {
    val idx = rows(TextQueries.phraseSearch(spark, sf()))
    val scan = rows(TextQueries.phraseSearchScan(spark, sf()))
    assert(idx === scan)
    assert(idx.nonEmpty)
  }

  test("proximity: indexed NEAR/W == token-stream scan path") {
    val idx = rows(TextQueries.proximitySearch(spark, sf()))
    val scan = rows(TextQueries.proximitySearchScan(spark, sf()))
    assert(idx === scan)
    assert(idx.nonEmpty)
  }

  test("highlight: indexed snippets == token-stream scan path") {
    val idx = rows(TextQueries.searchHighlight(spark, sf()))
    val scan = rows(TextQueries.searchHighlightScan(spark, sf()))
    assert(idx === scan)
    assert(idx.nonEmpty)
  }

  test("rrf: both fused arms match the scan twins") {
    val idx = rows(TextQueries.rrfFusion(spark, sf()))
    val scan = rows(TextQueries.rrfFusionScan(spark, sf()))
    assert(idx === scan)
    assert(idx.nonEmpty)
  }

  test("the probe prunes posting buckets at the file listing") {
    val plan = TextQueries.bm25Topk(spark, sf()).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("tb"), plan)
    // and no scan of the documents table survives in the indexed plan
    assert(!plan.contains("documents.parquet"), plan)
  }

  test("termBucket matches Spark's crc32 for every query term") {
    val terms = (TextQueries.Bm25Terms ++ TextQueries.PhraseQuery).distinct
    import spark.implicits._
    val viaSpark = terms.toDF("t")
      .select(pmod(crc32(col("t")), lit(64)).cast("int")).as[Int].collect()
    assert(viaSpark.toSeq === terms.map(TextQueries.termBucket))
  }

  test("incremental append == from-scratch rebuild of the union corpus") {
    import spark.implicits._
    def docsDF(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    def write(dir: String, rows: Seq[(Long, String)]): Unit =
      docsDF(rows).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val a = Seq(1L -> "spark merge data", 2L -> "data data spark", 3L -> "   ")
    val b = Seq(10L -> "merge spark merge spark", 11L -> "fresh words here")
    // standing index over A, then append B
    val incDir = java.nio.file.Files.createTempDirectory("graft_inv_inc").toString
    write(incDir, a)
    TextQueries.invIndexAppend(spark, incDir, docsDF(b))
    // from-scratch rebuild over A ∪ B
    val fullDir = java.nio.file.Files.createTempDirectory("graft_inv_full").toString
    write(fullDir, a ++ b)
    val fullLayout = TextQueries.invIndexLayout(spark, fullDir)
    def postings(layout: String): Seq[Seq[Any]] =
      spark.read.parquet(s"$layout/postings")
        .select("tok", "doc_id", "dl", "tf", "positions", "tb")
        .collect().toSeq.map(_.toSeq)
        .sortBy(r => (r(0).toString, r(1).toString.toLong))
    val incLayout = s"${graft.GraftSession.fixtureRoot(incDir)}/invindex_v2"
    assert(postings(incLayout) === postings(fullLayout))
    assert(statsOf(incLayout) === statsOf(fullLayout))
    // and the probe READS the appended entries (doc 10 outranks on tf)
    val hits = spark.read.parquet(s"$incLayout/postings")
      .where(col("tok") === "spark").select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(hits.toSeq === Seq(1L, 2L, 10L))
  }

  test("an all-blank append batch is a clean no-op, not an NPE") {
    import spark.implicits._
    def docsDF(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_blank").toString
    docsDF(Seq(1L -> "spark merge data"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val layout = TextQueries.invIndexAppend(spark, dir,
      docsDF(Seq(20L -> "   ", 21L -> ""))) // sum(dl) over zero rows is NULL
    assert(statsOf(layout) === ((1L, 3L)), "stats unchanged")
  }

  test("invIndexAppendOnce skips a replayed batchId (foreachBatch idempotence)") {
    import spark.implicits._
    def docsDF(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_once").toString
    docsDF(Seq(1L -> "spark merge data"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = docsDF(Seq(10L -> "merge spark merge"))
    assert(TextQueries.invIndexAppendOnce(spark, dir, batch, batchId = 0L))
    val layout = s"${graft.GraftSession.fixtureRoot(dir)}/invindex_v2"
    def snapshot(): (Seq[Seq[Any]], Seq[Any]) = (
      spark.read.parquet(s"$layout/postings")
        .select("tok", "doc_id", "dl", "tf", "positions", "tb")
        .collect().toSeq.map(_.toSeq)
        .sortBy(r => (r(0).toString, r(1).toString.toLong)),
      statsOf(layout).productIterator.toSeq)
    val afterFirst = snapshot()
    // at-least-once replay of the SAME batch: no doubled postings/stats
    assert(!TextQueries.invIndexAppendOnce(spark, dir, batch, batchId = 0L))
    assert(snapshot() === afterFirst)
    // the next batch still applies
    assert(TextQueries.invIndexAppendOnce(spark, dir,
      docsDF(Seq(11L -> "fresh words")), batchId = 1L))
    assert(snapshot() !== afterFirst)
  }

  test("staleness: a rewritten corpus invalidates the standing layout") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_inv").toString
    def write(text: String): Unit = {
      Seq((1L, text)).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    }
    write("spark merge spark merge")
    val first = rows(TextQueries.phraseSearch(spark, tmp))
    assert(first === Seq(Seq(1L, 2L)))
    // rewrite with one fewer phrase occurrence; lastModified advances
    Thread.sleep(1100) // FS mtime granularity
    write("spark merge data")
    val second = rows(TextQueries.phraseSearch(spark, tmp))
    assert(second === Seq(Seq(1L, 1L)), "index rebuilt from the new corpus")
  }
}
