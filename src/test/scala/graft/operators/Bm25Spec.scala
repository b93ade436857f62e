package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 ranked retrieval: pins the integer-exact scoring against an
  * independent plain-Scala replay of the same formula, the classic
  * BM25 monotonicities, and the top-k plan shape (per-partition heaps,
  * no global sort).
  */
class Bm25Spec extends SparkSpec {

  private def docsFixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Independent replay of bm25Topk's integer formula (plain Scala
    * collections, no Spark) — a second implementation path, so a bug
    * in the column-expression plumbing can't self-confirm.
    */
  private def replay(rows: Seq[(Long, String)], terms: Seq[String]): Seq[(Long, Long, Long)] = {
    val toks = rows.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Array.empty[String] else t.trim.toLowerCase.split("\\s+"))
    }.filter(_._2.nonEmpty)
    val nDocs = toks.size.toLong
    val tTok = toks.map(_._2.length.toLong).sum
    val avgdl = tTok / nDocs
    val tf = toks.flatMap { case (id, ts) =>
      val dl = ts.length.toLong
      ts.filter(terms.contains).groupBy(identity).map { case (tok, xs) =>
        (id, dl, tok, xs.length.toLong)
      }
    }
    val dfreq = tf.groupBy(_._3).map { case (tok, xs) => tok -> xs.size.toLong }
    val contribs = tf.map { case (id, dl, tok, f) =>
      val df = dfreq(tok)
      val idfMil = (1000L * (2 * nDocs - 2 * df + 1)) / (2 * df + 1)
      val bpPpm = 250000L + (750000L * dl) / avgdl
      val denPpm = 1000000L * f + (6 * bpPpm) / 5
      val tfnPpm = (2200000L * f * 1000000L) / denPpm
      id -> (idfMil * tfnPpm) / 1000
    }
    contribs.groupBy(_._1).toSeq
      .map { case (id, xs) => (id, xs.map(_._2).sum, xs.size.toLong) }
      .sortBy { case (id, s, _) => (-s, id) }
      .take(20)
  }

  private val vocab = Array("spark", "merge", "data", "scan", "agg", "row", "x", "y")

  test("bm25Topk matches an independent integer replay on a mixed fixture") {
    // deterministic mixed corpus: varying lengths, tf patterns, and a
    // tokenless doc that must drop out of the stats
    val rows: Seq[(Long, String)] = (0L until 40L).map { i =>
      val words = (0 until (5 + (i % 13).toInt * 3)).map { j =>
        vocab(((i * 7 + j * 5) % vocab.length).toInt)
      }
      i -> words.mkString(" ")
    } :+ (99L -> "   ")
    val dir = docsFixture(rows)
    val got = TextQueries.bm25Topk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === replay(rows, TextQueries.Bm25Terms))
  }

  test("bm25 monotonicities: tf saturates up, dl penalizes, rarity boosts") {
    val filler = "pad "
    val rows = Seq(
      1L -> ("spark spark spark " + filler * 7),   // tf=3, dl=10
      2L -> ("spark " + filler * 9),               // tf=1, dl=10
      3L -> ("spark spark spark " + filler * 37),  // tf=3, dl=40
      4L -> ("merge " + filler * 9),               // rare term, tf=1, dl=10
      5L -> (filler * 10).trim,                    // no query terms
      6L -> ("spark " + filler * 9))               // duplicate of 2 to raise df(spark)
    val dir = docsFixture(rows)
    val scores = TextQueries.bm25Topk(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!scores.contains(5L), "doc without query terms must not score")
    assert(scores(1L) > scores(2L), "higher tf must outrank at equal dl")
    assert(scores(1L) > scores(3L), "longer doc must be penalized at equal tf")
    // df(merge)=1 < df(spark)=4 → the rare term outscores at equal tf/dl
    assert(scores(4L) > scores(2L), "rarer term must contribute more idf")
  }

  test("rrfFusion fuses both arms with the paper's 1/(60+rank) weights") {
    val filler = "pad "
    // BM25 and raw-tf disagree on purpose: doc 1 has tf=2 of the rare
    // term (idf-heavy, low raw tf), doc 2 has tf=6 of the common term
    val rows = Seq(
      1L -> ("merge merge " + filler * 8),
      2L -> ("spark spark spark spark spark spark " + filler * 4),
      3L -> ("spark " + filler * 9),
      4L -> ("spark " + filler * 9),
      5L -> (filler * 10).trim)
    val dir = docsFixture(rows)
    val out = TextQueries.rrfFusion(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3)))).toMap
    assert(!out.contains(5L), "doc without query terms must not appear")
    // every present doc carries contributions from exactly its arms
    out.foreach { case (_, (bmR, tfR, rrf)) =>
      val expected = bmR.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        tfR.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf === expected)
    }
    // both arms rank doc 1 and doc 2 first in some order; fusion keeps
    // them above the tf=1 pair
    val top2 = TextQueries.rrfFusion(spark, dir).collect().take(2).map(_.getLong(0)).toSet
    assert(top2 === Set(1L, 2L))
  }

  test("queryExpand surfaces co-occurring terms from the feedback set only") {
    val rows = Seq(
      // feedback docs: carry query terms plus the expansion signal
      1L -> "spark merge alpha alpha beta",
      2L -> "spark data alpha beta beta",
      3L -> "merge data alpha gamma",
      // no query terms → outside the feedback set; its exclusive token
      // must never surface
      4L -> "omega omega omega omega")
    val dir = docsFixture(rows)
    val out = TextQueries.queryExpand(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.keySet.exists(TextQueries.Bm25Terms.contains),
      "query terms must be excluded from expansion")
    assert(!out.contains("omega"), "non-feedback docs must not contribute")
    assert(out("alpha") === ((3L, 4L)), "df=3 docs, tf=4")
    assert(out("beta") === ((2L, 3L)))
    assert(out("gamma") === ((1L, 1L)))
  }

  test("phraseSearch counts exact adjacent occurrences, not bags") {
    val rows = Seq(
      1L -> "spark merge x spark merge",   // 2 occurrences
      2L -> "spark x merge",               // both words, never adjacent
      3L -> "merge spark",                 // wrong order
      4L -> "a spark merge b",             // 1 occurrence
      5L -> "spark spark merge")           // 1 occurrence (overlap probe)
    val dir = docsFixture(rows)
    val out = TextQueries.phraseSearch(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("bm25 plan: top-k heaps, broadcast df and stats, one wide shuffle") {
    val plan = TextQueries.bm25Topk(spark, sf()).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
    assert(!plan.contains("SortMergeJoin"), "df/stats joins must broadcast")
  }
}
