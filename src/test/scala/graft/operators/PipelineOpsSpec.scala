package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the corpus-pipeline operators added on top of the dedup
  * pair detectors: duplicate clustering, stratified sampling, vocab
  * induction.
  */
class PipelineOpsSpec extends SparkSpec {

  test("dedupClusters collapses transitive near-dup chains to min-id components") {
    import spark.implicits._
    // Verify the propagation loop itself on a synthetic edge set with a
    // chain (1-2-3-4), a separate pair (10-11) and an isolated node...
    // isolated nodes never enter (they have no pair), matching the SQL.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (10L, "one two three four five six seven"),
      (11L, "one two three four five six seven"),
      (20L, "completely different text with unique words here")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("spec_docs")
    // exact copies share a simhash → chain 1-2, 1-3, 2-3 and 10-11
    val tmp = java.nio.file.Files.createTempDirectory("graft_cc").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = DedupQueries.dedupClusters(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("driver union-find and distributed propagation agree on the same edge set") {
    import spark.implicits._
    // chain 1-2-3-4 built from non-adjacent pairs, two extra components,
    // duplicate edges — both paths must produce identical labelings
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (1L, 2L),
      (10L, 11L),
      (20L, 22L), (21L, 22L)
    ).toDF("doc_a", "doc_b")
    val uf = DedupQueries.unionFindClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = DedupQueries.distributedClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(uf === dist)
    assert(uf.toMap === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("union-find ceiling derives from spark.driver.maxResultSize") {
    // default driver (1g result limit) keeps the full 1M-edge cap; the
    // derivation (limit/800 ≈ a quarter of the collected-row bytes)
    // would shrink it on a small driver instead of OOMing the
    // "bounded" path
    assert(DedupQueries.unionFindMaxEdges(spark) === 1000000L)
    val limit = spark.sparkContext.getConf
      .getSizeAsBytes("spark.driver.maxResultSize", "1g")
    assert(limit <= 0 || 1000000L <= limit / 800 ||
      DedupQueries.unionFindMaxEdges(spark) === limit / 800)
  }

  test("sampleStrata is deterministic and only keeps hash-selected rows") {
    val a = TextQueries.sampleStrata(spark, sf("sf0.01")).collect()
    val b = TextQueries.sampleStrata(spark, sf("sf0.01")).collect()
    assert(a.toSeq === b.toSeq)
    // en is downsampled to ~10%: kept count must be well under the total
    val total = graft.GraftSession.table(spark, sf("sf0.01"), "documents")
      .where(col("lang") === "en").count()
    val keptEn = a.find(_.getString(0) == "en").map(_.getLong(1)).getOrElse(0L)
    assert(keptEn > 0 && keptEn < total / 2)
  }

  test("bestPerLang keeps 5 per language via a WindowGroupLimit plan") {
    val df = TextQueries.bestPerLang(spark, sf("sf0.01"))
    val plan = df.queryExecution.executedPlan.toString
    // the rank filter must push into the window as a group-limit, so
    // each group keeps 5 rows before the shuffle instead of sorting all
    assert(plan.contains("WindowGroupLimit"), plan)
    val rows = df.collect()
    val perLang = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ == 5))
    assert(rows.map(_.getLong(3)).forall(rn => rn >= 1 && rn <= 5))
  }

  test("vocabTopk returns 20 rows ordered by df desc then token") {
    val rows = TextQueries.vocabTopk(spark, sf("sf0.01")).collect()
    assert(rows.length === 20)
    val dfs = rows.map(_.getLong(1))
    assert(dfs.sameElements(dfs.sortBy(-_)))
    // deterministic tie-break inside equal-df runs
    rows.sliding(2).foreach { case Array(x, y) =>
      if (x.getLong(1) == y.getLong(1)) assert(x.getString(0) < y.getString(0))
    }
  }
}
