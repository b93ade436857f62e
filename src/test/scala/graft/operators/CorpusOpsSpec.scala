package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the corpus-maintenance operators: version diff,
  * cross-corpus line dedup, conjunctive search.
  */
class CorpusOpsSpec extends SparkSpec {

  private def docsFixture(rows: Seq[(Long, String)], source: String = "s"): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit(source))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("corpusDiff classifies added/removed/changed/unchanged exactly") {
    val dir = docsFixture((0L to 20L).map(i => (i, s"text of doc $i")))
    val out = TextQueries.corpusDiff(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // removed: %10==0 → {0,10,20}; changed: %7==0 minus removed → {7,14};
    // added: the 5 synthesized ids; unchanged: the other 16
    assert(out("removed") === ((3L, 30L)))
    assert(out("changed") === ((2L, 21L)))
    assert(out("added")._1 === 5L)
    assert(out("unchanged")._1 === 16L)
  }

  test("lineDedup drops lines at df>=3, keeps df<3 and unique lines") {
    // header (injected by the operator) hits all 4 docs → dropped.
    // 'three doc shared line' in 3 docs → dropped; 'two doc shared
    // line' in 2 → kept; bodies unique → kept. Odd ids get no footer.
    val dir = docsFixture(Seq(
      (1L, "three doc shared line\nunique body one"),
      (3L, "three doc shared line\nunique body two"),
      (5L, "three doc shared line\ntwo doc shared line"),
      (7L, "two doc shared line\nunique body three")))
    val out = TextQueries.lineDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // per doc: header + 2 body lines = 3 lines, no footers (odd ids)
    assert(out(1L) === ((3L, 1L, 2L))) // header + shared3 dropped
    assert(out(3L) === ((3L, 1L, 2L)))
    assert(out(5L) === ((3L, 1L, 2L))) // two-doc line survives
    assert(out(7L) === ((3L, 2L, 1L))) // only the header dropped
  }

  test("searchTopk requires every term and ranks by exact total tf") {
    val dir = docsFixture(Seq(
      (1L, "spark merge spark merge spark"), // both terms, tf 5
      (2L, "spark spark spark spark"),       // missing 'merge' → excluded
      (3L, "merge spark"),                   // both, tf 2
      (4L, "Spark MERGE"),                   // case-folded, tf 2 — ties with 3 → id order
      (5L, "nothing relevant")))
    val out = TextQueries.searchTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 5L), (3L, 2L), (4L, 2L)))
  }
}
