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

  test("evalSplit is a function of the id alone — stable when the corpus grows") {
    val small = docsFixture((1L to 40L).map(i => (i, s"doc $i")))
    val grown = docsFixture((1L to 80L).map(i => (i, s"doc $i")))
    // aggregate-level check: the first 40 ids' (split → n, sum_ids)
    // contribution is unchanged after growth, computed by filtering the
    // grown corpus to the original ids under the same hash rule.
    import org.apache.spark.sql.functions._
    val a = TextQueries.evalSplit(spark, small).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val bucket = (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4),
      16, 10).cast("long") % 10)
    val splitCol = when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
    val b = spark.read.parquet(s"$grown/documents.parquet")
      .where(col("doc_id") <= 40L)
      .select(col("lang"), splitCol.as("split"), col("doc_id"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("s")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(a === b, "existing docs must keep their split when the corpus grows")
    // rough 80/10/10 shape: train strictly largest
    val byCat = a.groupBy(_._1._2).view.mapValues(_.values.map(_._1).sum).toMap
    assert(byCat.getOrElse("train", 0L) > byCat.getOrElse("val", 0L))
    assert(byCat.getOrElse("train", 0L) > byCat.getOrElse("test", 0L))
  }

  test("tokenBudgetTrim caps at 64 tokens and hashes exactly the kept prefix") {
    val longText = (1 to 100).map(i => s"w$i").mkString(" ")
    val dir = docsFixture(Seq((1L, longText), (2L, "short doc")))
    val out = TextQueries.tokenBudgetTrim(spark, dir).collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) === 100L && r1.getLong(2) === 64L && r1.getLong(3) === 36L)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 64).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.getString(4) === expected)
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getLong(1) === 2L && r2.getLong(3) === 0L)
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
