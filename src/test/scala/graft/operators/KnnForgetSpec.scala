package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion propagation into the standing knn graph (`knnForget`):
  * the tombstone hides every victim row, the HEAL leg promotes each
  * affected survivor's (k+1)-th ring neighbor, and the two together
  * make the served graph — and the outlier/cosine partials — EXACTLY
  * equal a from-scratch rebuild over the remaining corpus at the same
  * frozen planes. Also pinned: replay idempotence of the heal (the
  * (vec_id, neighbor_id) anti-join, no marker needed), an append
  * after a forget never resurrects the victims as neighbors, and
  * compaction applies the delete physically with serve invariant.
  */
class KnnForgetSpec extends SparkSpec {

  private def corpusDir(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_knnforget").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def served(layout: String): Seq[Seq[Any]] =
    SimilarityQueries.knnGraphAt(spark, layout).collect().map(_.toSeq).toSeq

  private def outliers(layout: String): Seq[Seq[Any]] =
    SimilarityQueries.knnOutliersAt(spark, layout).collect().map(_.toSeq).toSeq

  test("forget+heal == rebuild over remaining; idempotent; append and compaction safe") {
    val all = graft.GraftSession.table(spark, sf(), "embeddings")
      .select("vec_id", "embedding")
    val base = all.where(col("vec_id") < 400)
    val dirA = corpusDir(base)
    val layoutA = s"$dirA/knn_layout"
    SimilarityQueries.buildKnn(spark, dirA, layoutA)

    // victims chosen FROM the served graph: vectors that appear as
    // someone's top-1 neighbor, so the heal leg provably has work
    val g0 = SimilarityQueries.knnGraphAt(spark, layoutA)
      .where(col("rank") === 1).select("neighbor_id")
      .limit(3).collect().map(_.getLong(0)).toSeq.distinct
    assert(g0.nonEmpty)
    val victims = g0

    val dn = SimilarityQueries.knnForgetAt(spark, layoutA, victims)
    assert(dn === victims.size.toLong)

    // ground truth: a fresh layout over the remaining corpus — same
    // derived plane count (the cohort is too small to move it), which
    // the meta rows prove
    val dirT = corpusDir(base.where(!col("vec_id").isin(victims: _*)))
    val layoutT = s"$dirT/knn_layout"
    SimilarityQueries.buildKnn(spark, dirT, layoutT)
    val pA = spark.read.parquet(s"$layoutA/meta").head.getInt(0)
    val pT = spark.read.parquet(s"$layoutT/meta").head.getInt(0)
    assert(pA === pT, s"plane count moved ($pA -> $pT); pick a smaller cohort")

    val sA = served(layoutA)
    assert(sA.nonEmpty)
    assert(!sA.exists(r => victims.contains(r.head) ||
      victims.contains(r(2))), "a victim row is still served")
    assert(sA === served(layoutT),
      "tombstoned+healed serve diverged from the rebuild-over-remaining " +
        "(a missing heal shows as short lists here)")
    assert(outliers(layoutA) === outliers(layoutT),
      "cosine partials diverged from the rebuild (cedges heal leg)")

    // heal replay: forgetting the same cohort again appends nothing —
    // the partial files are byte-stable, not just the served rows
    def edgeCount(l: String) = spark.read.parquet(s"$l/edges").count()
    val ec = edgeCount(layoutA)
    assert(SimilarityQueries.knnForgetAt(spark, layoutA, victims) === 0L)
    assert(edgeCount(layoutA) === ec, "a replayed heal appended rows")
    assert(served(layoutA) === sA)

    // an append AFTER the forget: the batch must not list victims as
    // neighbors, and the grown layout must equal a rebuild over
    // (remaining ∪ batch)
    val batch = all.where(col("vec_id") >= 400 && col("vec_id") < 430)
    SimilarityQueries.knnAppendAt(spark, layoutA, batch, (_, f) => f())
    val dirU = corpusDir(base.where(!col("vec_id").isin(victims: _*))
      .unionByName(batch))
    val layoutU = s"$dirU/knn_layout"
    SimilarityQueries.buildKnn(spark, dirU, layoutU)
    val pU = spark.read.parquet(s"$layoutU/meta").head.getInt(0)
    assert(pU === pA, "union rebuild moved the plane count; shrink the batch")
    val sGrown = served(layoutA)
    assert(!sGrown.exists(r => victims.contains(r.head) ||
      victims.contains(r(2))),
      "the append resurrected a forgotten vector")
    assert(sGrown === served(layoutU),
      "forget-then-append diverged from the rebuild over (remaining ∪ batch)")

    // the graph consumers' shared mutual relation derives tombstone-
    // filtered: equal to the derivation over the union rebuild
    def mutual(l: String) = SimilarityQueries.knnMutualEdgesAt(spark, l)
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.toSeq
    assert(mutual(layoutA) === mutual(layoutU),
      "mutual edges diverged from the rebuild (derived-tier inputs leak victims)")

    // the id-lookup under pending tombstones still prunes edge dirs at
    // the file listing — the kb filter pushes below the anti-join
    val survivor = sGrown.head.head.asInstanceOf[Long]
    val plan = SimilarityQueries.knnLookupAt(spark, layoutA, Seq(survivor))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*kb".r.findFirstIn(plan).isDefined,
      s"kb prune lost under the tombstone anti-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone filter is not a broadcast anti-join:\n$plan")

    // compaction: physical deletes everywhere, tombstones retired,
    // serve invariant
    SimilarityQueries.knnCompactAt(spark, layoutA)
    for (sub <- Seq("vecs", "edges", "cedges")) {
      val idCols = if (sub == "vecs") Seq("vec_id") else Seq("vec_id", "neighbor_id")
      val leaked = spark.read.parquet(s"$layoutA/$sub")
        .where(idCols.map(c => col(c).isin(victims: _*)).reduce(_ || _))
        .count()
      assert(leaked === 0L, s"compaction left physical victim rows in $sub")
    }
    // consumed tombstones retired; the dir may stand EMPTY (deleting
    // it raced a concurrent forget's staged move — see
    // retireTombstones) and reads as no-tombstones everywhere
    assert(!graft.GraftSession.hasVisibleData(
      java.nio.file.Paths.get(s"$layoutA/tombstones")))
    assert(served(layoutA) === sGrown, "compaction changed served rows")
    assert(outliers(layoutA) === outliers(layoutU),
      "compaction changed the outlier partials")
  }

  test("forget at radius 2: the heal reads the layout's stamped radius") {
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 250).select("vec_id", "embedding")
    val dirA = corpusDir(base)
    // build AT RADIUS 2 under an isolated child session (the shared
    // JVM session's conf is never mutated)
    val s2 = spark.newSession()
    s2.conf.set(SimilarityQueries.KnnProbeRadiusKey, "2")
    val layoutA = s"$dirA/knn_layout_r2"
    SimilarityQueries.buildKnn(s2, dirA, layoutA)
    val victims = SimilarityQueries.knnGraphAt(spark, layoutA)
      .where(col("rank") === 1).select("neighbor_id")
      .limit(2).collect().map(_.getLong(0)).toSeq.distinct
    // the forget is driven from the DEFAULT-conf session: the heal's
    // fresh ring pass must run at the LAYOUT's stamped radius 2 — a
    // radius-1 heal would under-promote (fewer candidates than the
    // rebuild sees) and fail the equality below
    val dn = SimilarityQueries.knnForgetAt(spark, layoutA, victims)
    assert(dn === victims.size.toLong)
    val dirT = corpusDir(base.where(!col("vec_id").isin(victims: _*)))
    val layoutT = s"$dirT/knn_layout_r2"
    SimilarityQueries.buildKnn(s2, dirT, layoutT)
    assert(spark.read.parquet(s"$layoutA/meta").head.getInt(0)
      === spark.read.parquet(s"$layoutT/meta").head.getInt(0))
    assert(served(layoutA).nonEmpty &&
      served(layoutA) === served(layoutT),
      "radius-2 forget+heal diverged from the radius-2 rebuild")
  }

  test("heal-skip stamp: idempotent retries skip the heal; a NEW forget re-heals in full") {
    val all = graft.GraftSession.table(spark, sf(), "embeddings")
      .select("vec_id", "embedding")
    val base = all.where(col("vec_id") < 300)
    val dir = corpusDir(base)
    val layout = s"$dir/knn_layout"
    SimilarityQueries.buildKnn(spark, dir, layout)
    val marker = java.nio.file.Paths.get(layout, "_HEAL_OK")

    // a victim with in-degree, so the heal provably works
    val victimA = SimilarityQueries.knnGraphAt(spark, layout)
      .where(col("rank") === 1).select("neighbor_id").head.getLong(0)
    assert(SimilarityQueries.knnForgetAt(spark, layout, Seq(victimA)) === 1L)
    assert(java.nio.file.Files.exists(marker),
      "a completed heal must stamp the tombstone-set signature")
    val sig1 = java.nio.file.Files.readString(marker)
    val afterA = served(layout)

    // the at-least-once retry: same cohort → dn=0, stamp untouched,
    // serve identical (the skip is the economics, this pins safety)
    assert(SimilarityQueries.knnForgetAt(spark, layout, Seq(victimA)) === 0L)
    assert(java.nio.file.Files.readString(marker) === sig1)
    assert(served(layout) === afterA)

    // a NEW forget changes the tombstone set → the stamp must move,
    // the heal must run, and the end state equals a rebuild over the
    // remaining corpus
    val victimB = afterA.map(_(2).asInstanceOf[Long])
      .find(v => v != victimA).get
    assert(SimilarityQueries.knnForgetAt(spark, layout, Seq(victimB)) === 1L)
    assert(java.nio.file.Files.readString(marker) !== sig1,
      "a new tombstone file must re-stamp the heal signature")
    val truthDir = corpusDir(
      base.where(!col("vec_id").isin(victimA, victimB)))
    val truthLayout = s"$truthDir/knn_layout"
    // frozen planes must match: same corpus-count regime
    SimilarityQueries.buildKnn(spark, truthDir, truthLayout)
    assert(spark.read.parquet(s"$layout/meta").head.getAs[Int]("p")
      === spark.read.parquet(s"$truthLayout/meta").head.getAs[Int]("p"))
    assert(served(layout) === served(truthLayout),
      "post-stamp second forget diverged from the rebuild-over-remaining")

    // a stale stamp never suppresses a CRASHED heal's rerun: simulate
    // the crash window (tombstones present, stamp absent) — the next
    // no-op forget must re-run the heal and re-stamp
    java.nio.file.Files.delete(marker)
    assert(SimilarityQueries.knnForgetAt(spark, layout,
      Seq(victimA, victimB)) === 0L)
    assert(java.nio.file.Files.exists(marker),
      "a marker-less (crashed-heal) state must re-heal and re-stamp")
    assert(served(layout) === served(truthLayout))
  }
}
