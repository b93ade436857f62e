package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.PolyHash

class WinnowSpec extends SparkSpec {

  private val K = 4
  private val W = 4

  /** Independent driver-side winnowing (same PolyHash convention). */
  private def ref(text: String): Set[(Long, Long)] = {
    val t = text.trim
    if (t.isEmpty) return Set.empty
    val toks = t.split("\\s+")
    val hs = toks.sliding(K).filter(_.length == K).map(g => PolyHash.gramLocal(g.toSeq)).toArray
    if (hs.isEmpty) return Set.empty
    (0 to math.max(hs.length - W, 0)).map { i =>
      val hi = math.min(i + W, hs.length)
      val mn = hs.slice(i, hi).min
      val pos = (i until hi).filter(j => hs(j) == mn).max
      (pos.toLong, mn)
    }.toSet
  }

  test("winnow matches an independent driver-side implementation on the corpus") {
    val got = TextQueries.winnow(spark, sf()).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    val docs = graft.GraftSession.table(spark, sf(), "documents")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val expect = ref(Option(r.getString(1)).getOrElse(""))
      val actual = got.getOrElse(r.getLong(0), Set.empty)
      assert(actual === expect, s"doc ${r.getLong(0)}")
    }
  }

  test("winnow guarantee: docs sharing >= w+k-1 tokens share a fingerprint") {
    // two docs embedding the same 8-token run in different contexts
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val tmp = Files.createTempDirectory("graft_winnow").toString
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, s"unrelated prefix words here $shared and a suffix", "en", "a", 0L),
      (2L, s"$shared totally different tail content follows now", "en", "b", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fps = TextQueries.winnow(spark, tmp).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      s"no shared fingerprint: ${fps(1L)} vs ${fps(2L)}")
  }

  test("winnowPairs catches docs sharing a long run, counts each fp once") {
    val shared = (1 to 16).map(i => s"shard$i").mkString(" ")
    val tmp = Files.createTempDirectory("graft_winnow_pairs").toString
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, s"some leading context $shared trailing words one", "en", "a", 0L),
      (2L, s"$shared utterly different ending text here", "en", "b", 0L),
      (3L, "nothing in common with the others at all whatsoever today", "en", "c", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextQueries.winnowPairs(spark, tmp).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    val nShared = rows.head.getLong(2)
    // n_shared counts DISTINCT shared fingerprints — bounded by the
    // shared run's k-gram count even if one fp wins several windows
    assert(nShared >= 2 && nShared <= 13, s"n_shared=$nShared")
  }

  test("winnowAlign locates both positions of every shared fingerprint") {
    val shared = (1 to 16).map(i => s"al$i").mkString(" ")
    val tmp = Files.createTempDirectory("graft_winnow_align").toString
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, s"pre amble words here $shared post amble", "en", "a", 0L),
      (2L, s"$shared completely unrelated closing run text", "en", "b", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextQueries.winnowAlign(spark, tmp).collect()
    assert(rows.nonEmpty)
    // every alignment row names the one candidate pair, and the
    // positions differ by doc 1's 4-token prefix for fingerprints
    // inside the shared run
    val fps1 = TextQueries.winnow(spark, tmp).collect()
      .filter(_.getLong(0) == 1L).map(r => r.getLong(2) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
      assert(fps1(r.getLong(2)) === r.getLong(3)) // pos_a is doc 1's position
    }
    // at least one aligned fingerprint has pos_a = pos_b + 4 (the
    // prefix offset) — the signature of a located shared span
    assert(rows.exists(r => r.getLong(3) === r.getLong(4) + 4))
  }

  test("winnowPairs plan: pair generation is an equi-join, never a cartesian") {
    val plan = TextQueries.winnowPairs(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("winnow property sweep: seeded random/adversarial texts match the reference") {
    // hash ties from heavy repetition, doc lengths straddling k and w,
    // single-token and empty docs — the shapes that break off-by-ones
    val rnd = new scala.util.Random(20260813L)
    val vocab = Array("a", "b", "ab", "ba", "aa")  // tiny vocab → many equal k-grams
    val texts = (0 until 60).map { i =>
      val len = i % 12 // 0..11 tokens: below k, between k and w+k-1, above
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    } :+ "x " * 200 :+ "" :+ "solo"
    val tmp = Files.createTempDirectory("graft_winnow_sweep").toString
    val spark2 = spark
    import spark2.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.winnow(spark, tmp).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Set.empty) === ref(t), s"doc $i: '$t'")
    }
  }

  test("winnow plan is narrow: no data shuffle besides the presentation sort") {
    val plan = TextQueries.winnow(spark, sf()).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan)
    val nonFanout = "Exchange \\w+".r.findAllIn(plan)
      .filterNot(_.contains("RoundRobin")).size
    assert(nonFanout === 1, plan)
  }
}
