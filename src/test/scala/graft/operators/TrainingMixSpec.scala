package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the training-mix operators: span-level exact dedup,
  * temperature mixture weights, BPE pair counting.
  */
class TrainingMixSpec extends SparkSpec {

  private def docsFixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mix").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("spanDedup keeps the first corpus occurrence of a span and drops the rest") {
    val tenA = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10" // one exact 10-token span
    val tenB = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    val dir = docsFixture(Seq(
      (1L, s"$tenA $tenB"),      // doc 1: spans [tenA, tenB], both first
      (2L, s"$tenA c1 c2"),      // doc 2: copies doc 1's first span + a fresh tail
      (3L, "d1 d2 d3")           // doc 3: single short span, unique
    ))
    val out = DedupQueries.spanDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1 keeps both spans; doc 2 loses the copied span, keeps its
    // tail; doc 3 untouched
    assert(out === Map(1L -> ((2L, 2L)), 2L -> ((2L, 1L)), 3L -> ((1L, 1L))))
    // determinism: the min-(doc_id, pos) winner does not depend on
    // partitioning — rerun under a different layout
    val re = DedupQueries.spanDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(re === out)
  }

  test("spanDedup fingerprints surviving text in span order") {
    val dir = docsFixture(Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 y1 y2"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 z1 z2")
    ))
    val rows = DedupQueries.spanDedup(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getString(3)).toMap
    // doc 1 survives intact → fingerprint of its full text; doc 2's
    // surviving text is just the fresh tail
    def md5s(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(byId(1L) === md5s("x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 y1 y2"))
    assert(byId(2L) === md5s("z1 z2"))
  }

  test("spanDedup plan stays equi-join only (no cartesian product)") {
    val plan = DedupQueries.spanDedup(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("mixtureWeights upsamples low-token strata relative to raw share") {
    val rows = TextQueries.mixtureWeights(spark, sf("sf0.01")).collect()
    val tokens = rows.map(_.getLong(2))
    val weights = rows.map(_.getDouble(3))
    assert(weights.forall(w => w > 0 && w < 1))
    assert(math.abs(weights.sum - 1.0) < 1e-9)
    // α=0.5 flattening: the smallest stratum's weight exceeds its raw
    // token share, the largest stratum's weight is below its share
    val total = tokens.sum.toDouble
    val iMin = tokens.indexOf(tokens.min)
    val iMax = tokens.indexOf(tokens.max)
    assert(weights(iMin) > tokens(iMin) / total)
    assert(weights(iMax) < tokens(iMax) / total)
    // integer targets are consistent with the weights
    rows.foreach { r =>
      assert(r.getLong(4) === math.floor(r.getDouble(3) * 100000).toLong)
    }
  }

  test("mixSample keeps nothing from a zero-token source, keeps all when budget >> tokens") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mixsample").toString
    Seq((1L, "w1 w2 w3 w4", "live"), (2L, "w5 w6 w7 w8 w9", "live"),
        (3L, "", "empty"), (4L, "   ", "empty"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextQueries.mixSample(spark, tmp).collect()
    // zero-token source: rate 0 by EXPLICIT guard, no row emitted —
    // without it Spark's NaN→cast(0) and DuckDB's NULL-division +
    // least() (1000000) reach OPPOSITE verdicts (keep-none vs keep-all)
    assert(!out.exists(_.getString(0) == "empty"), out.mkString(","))
    // the live source holds the whole q mass and the budget exceeds
    // its token count, so its rate caps at 1e6 and every doc is kept
    val live = out.filter(_.getString(0) == "live")
    assert(live.length === 1 && live.head.getLong(1) === 1000000L &&
      live.head.getLong(2) === 2L && live.head.getLong(3) === 9L)
  }

  test("curateE2e composes quality gate, exact dedup and hash sample") {
    import graft.functions.TextFunctions.md5LongLocal
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val dir = docsFixture(Seq(
      (1L, good),              // accepted, first copy → kept by dedup
      (2L, good),              // exact duplicate → dropped by dedup
      (3L, "too short text"),  // rejected by the length gate
      (4L, good.replace("alpha", "omega")) // accepted, unique
    ))
    // fixture lang is "en" (rate 10) — compute the expected sample
    // keeps with the same hash the operator uses
    val expected = Seq(1L, 4L)
      .filter(id => math.floorMod(md5LongLocal(s"en:$id"), 100) < 10)
    val rows = TextQueries.curateE2e(spark, dir).collect()
    if (expected.isEmpty) assert(rows.isEmpty)
    else {
      assert(rows.length === 1)
      assert(rows.head.getLong(1) === expected.length.toLong)
      assert(rows.head.getLong(2) === expected.sum)
      assert(rows.head.getLong(3) === expected.length.toLong * 12)
    }
  }

  test("unimax closed form equals the sequential fair-share loop (both regimes + remainder)") {
    // per-source token masses 5, 10, 50, 60; cap 2, budget 121:
    // loop → fair 30: 10 | fair 37: 20 | fair 45: 45 (capped from here) | 46
    val tmp = java.nio.file.Files.createTempDirectory("graft_unimax").toString
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, (1 to 5).map(i => s"t$i").mkString(" "), "en", "sA", 0L),
      (2L, (1 to 10).map(i => s"t$i").mkString(" "), "en", "sB", 0L),
      (3L, (1 to 50).map(i => s"t$i").mkString(" "), "en", "sC", 0L),
      (4L, (1 to 60).map(i => s"t$i").mkString(" "), "en", "sD", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.unimax(spark, tmp, b = 121L, c = 2L).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("alloc_tokens")).toMap
    assert(got === Map("sA" -> 10L, "sB" -> 20L, "sC" -> 45L, "sD" -> 46L))

    // independent sequential reference on the same masses
    var (rem, m) = (121L, 4)
    val ref = Seq(("sA", 5L), ("sB", 10L), ("sC", 50L), ("sD", 60L)).map { case (s, t) =>
      val a = math.min(2L * t, rem / m); rem -= a; m -= 1; s -> a
    }.toMap
    assert(got === ref)
  }

  test("unimax on the corpus: allocations respect the cap and exhaust the budget at the breakpoint") {
    val rows = TextQueries.unimax(spark, sf()).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("alloc_tokens")).sum
    val anyBelowCap = rows.exists(r =>
      r.getAs[Long]("alloc_tokens") !== 2L * r.getAs[Long]("n_tokens"))
    // either every source fits under its cap (budget underspent by
    // design) or the equal-split tail exists and the budget is exact
    if (anyBelowCap) assert(total === 50000L) else assert(total <= 50000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= 2L * r.getAs[Long]("n_tokens") + 1)
    }
  }

  test("curriculum buckets are exact length quartiles, ~N/4 each modulo ties") {
    val rows = TextQueries.curriculum(spark, sf()).collect()
    val n = rows.length
    assert(n > 0)
    // buckets are ordered by length: every doc in bucket b is no longer
    // than any doc in bucket b+1
    val maxLenPerBucket = rows.groupBy(_.getAs[Int]("bucket"))
      .map { case (b, g) => b -> g.map(_.getAs[Long]("n_chars")).max }
    val minLenPerBucket = rows.groupBy(_.getAs[Int]("bucket"))
      .map { case (b, g) => b -> g.map(_.getAs[Long]("n_chars")).min }
    (0 to 2).foreach { b =>
      if (maxLenPerBucket.contains(b) && minLenPerBucket.contains(b + 1))
        assert(maxLenPerBucket(b) <= minLenPerBucket(b + 1))
    }
    // quartile balance: each cut point is the smallest length whose
    // cumulative count reaches q·N, so a bucket can exceed N/4 only by
    // the tie mass AT its cut — bounded by the largest length-tie group
    val maxTie = rows.groupBy(_.getAs[Long]("n_chars")).values.map(_.size).max
    val sizes = rows.groupBy(_.getAs[Int]("bucket")).view.mapValues(_.size)
    sizes.foreach { case (b, s) =>
      assert(s <= n / 4 + maxTie, s"bucket $b size $s vs N/4=${n / 4} + tie $maxTie")
    }
  }

  test("curriculum plan: corpus is never globally sorted — window only over the histogram") {
    val df = TextQueries.curriculum(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    // cut relation broadcasts back over the corpus
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    // exactly one one-reducer window, fed by the bounded histogram
    // aggregate (partial_count proves the groupBy combined map-side
    // BELOW the window — the corpus never reaches the single reducer)
    assert("Window ".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("unigramQuality scores mean corpus token frequency in ppm") {
    val dir = docsFixture(Seq((1L, "x x y"), (2L, "x z")))
    val out = TextQueries.unigramQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // corpus counts: x=3, y=1, z=1
    // doc 1: (3+3+1)/3 → 2333333 ppm; doc 2: (3+1)/2 → 2000000 ppm
    assert(out === Map(1L -> ((3L, 2333333L)), 2L -> ((2L, 2000000L))))
  }

  test("bpePairs counts adjacent character pairs weighted by occurrence") {
    val dir = docsFixture(Seq(
      (1L, "abab abab cd"), // ab:2×2, ba:1×2, cd:1
      (2L, "abab x")        // ab:2, ba:1; 1-char word contributes nothing
    ))
    val out = TextQueries.bpePairs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("ab" -> 6L, "ba" -> 3L, "cd" -> 1L))
  }
}
