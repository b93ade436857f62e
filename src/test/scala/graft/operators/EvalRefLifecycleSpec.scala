package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The eval-RELEASE lifecycle (`evalRefRebuild` / `Ctl
  * evalref-rebuild`): the standing reference was fixed-by-design for
  * one release, but a NEW eval set must be installable without
  * out-of-band surgery — staged build + whole-tree swap, the plane
  * count restamped from the new eval size, staleness FOLLOWING the
  * release parquet afterwards (a content change in the release
  * re-derives on the next guard read), a return-to-default path, and
  * the refuse-loudly claim against concurrent rebuilds.
  */
class EvalRefLifecycleSpec extends SparkSpec {

  test("rebuild installs a release, guard diverts against it, staleness follows the release, default restores") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evalref").toString
    val emb = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 300).select("vec_id", "embedding")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // default reference: the held-out md5-fold
    val layout = SimilarityQueries.evalRefPath(dir)
    SimilarityQueries.evalRefRebuild(spark, dir) // default build via the verb
    val nDefault = spark.read.parquet(s"$layout/meta")
      .select("n_eval").head.getLong(0)
    assert(nDefault > 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(layout, "_EVAL_SOURCE")))

    // a NEW eval release: 40 corpus vectors under release-local ids
    val release = java.nio.file.Files
      .createTempDirectory("graft_evalrel").toString + "/eval.parquet"
    emb.where(col("vec_id") < 40)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(release)
    SimilarityQueries.evalRefRebuild(spark, dir, Some(release))
    assert(spark.read.parquet(s"$layout/meta")
      .select("n_eval").head.getLong(0) === 40L)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(layout, "_EVAL_SOURCE")).trim === release)

    // the guard now diverts an exact copy of a RELEASE vector (id 5
    // is in the release) and passes a definitively-far vector (the
    // negation: cosine −1 against its own source, nowhere near τ)
    val far = emb.where(col("vec_id") === 5)
      .select(lit(111L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val batch = emb.where(col("vec_id") === 5).unionByName(far)
    val verdicts = SimilarityQueries.evalGuardFor(spark, dir, batch)
      .select("vec_id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts(5L), "a release member's copy must divert")
    assert(!verdicts(111L), "a far vector must pass")

    // staleness follows the RELEASE file: shrink it to 10 vectors and
    // the next guard read re-derives (no verb needed)
    emb.where(col("vec_id") < 10)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(release)
    SimilarityQueries.evalGuardFor(spark, dir,
      emb.where(col("vec_id") === 5)).count()
    assert(spark.read.parquet(s"$layout/meta")
      .select("n_eval").head.getLong(0) === 10L,
      "an eval-release content change must re-derive the reference")

    // return to the held-out-fold default
    SimilarityQueries.evalRefRebuild(spark, dir)
    assert(spark.read.parquet(s"$layout/meta")
      .select("n_eval").head.getLong(0) === nDefault)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(layout, "_EVAL_SOURCE")))

    // a crashed rebuild's claim refuses loudly; sweep + retry works
    val stage = java.nio.file.Paths.get(
      s"${graft.GraftSession.fixtureRoot(dir)}/.evalref_rebuild_stage")
    java.nio.file.Files.createDirectory(stage)
    val refused = intercept[IllegalArgumentException] {
      SimilarityQueries.evalRefRebuild(spark, dir, Some(release))
    }
    assert(refused.getMessage.contains("delete"), refused.getMessage)
    // the GC reports it (never takes it)
    val (_, stages) = graft.pipeline.Governance.gcLayouts(dir)
    assert(stages.exists(_.endsWith(".evalref_rebuild_stage")),
      s"GC must report the crashed rebuild stage: $stages")
    graft.GraftSession.deleteRec(stage)
    SimilarityQueries.evalRefRebuild(spark, dir, Some(release))
    assert(spark.read.parquet(s"$layout/meta")
      .select("n_eval").head.getLong(0) === 10L)

    // CRASH-WINDOW self-heal follows the REGISTERED release, not the
    // default: a hard crash between the rebuild's deleteRec(live) and
    // move(staged, live) leaves no live tree — and the destroyed
    // tree's _EVAL_SOURCE with it. The swap-durable registration file
    // (written before the swap) must steer the next guard read's
    // re-derivation back to the release; the pre-fix behavior
    // silently rebuilt the held-out-fold default and computed
    // firewall verdicts against the wrong eval set with no error.
    graft.GraftSession.deleteRec(java.nio.file.Paths.get(layout))
    SimilarityQueries.evalGuardFor(spark, dir,
      emb.where(col("vec_id") === 5)).count()
    assert(spark.read.parquet(s"$layout/meta")
      .select("n_eval").head.getLong(0) === 10L,
      "crash-window re-derivation must follow the registered release")

    // ...and after a return-to-default, the same crash window heals
    // to the DEFAULT (the registration is gone, not stale)
    SimilarityQueries.evalRefRebuild(spark, dir)
    graft.GraftSession.deleteRec(java.nio.file.Paths.get(layout))
    SimilarityQueries.evalGuardFor(spark, dir,
      emb.where(col("vec_id") === 5)).count()
    assert(spark.read.parquet(s"$layout/meta")
      .select("n_eval").head.getLong(0) === nDefault,
      "after return-to-default the crash window must heal to the default")
  }

  test("guard radius is monotone: r2 verdicts include r1's against the same reference") {
    // the evalref layout stamps only the plane count; the probe
    // radius is a serve-time session knob (buckets on disk don't
    // depend on it). A session-radius switch between the
    // decontaminate audit and a guard call therefore changes ONLY
    // the ring width — and a WIDER ring can only add candidates, so
    // the contaminated set is monotone in the radius: a guard run at
    // r2 catches everything an r1 audit flagged. This pins that
    // inclusion (and that the exact-copy divert — the own bucket,
    // mask 0, is in every ring — holds at BOTH radii), so no radius
    // switch can silently narrow the guard below the audit's ring.
    val dir = java.nio.file.Files.createTempDirectory("graft_evalrad").toString
    val emb = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 400).select("vec_id", "embedding")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // batch: copies of 30 corpus vectors (fold-9 members of the
    // default eval set among them are the contamination)
    val batch = emb.where(col("vec_id") < 30)
    def contaminatedAt(r: Int): Set[Long] = {
      spark.conf.set("spark.graft.knn.probeRadius", r.toString)
      try SimilarityQueries.evalGuardFor(spark, dir, batch)
        .where(col("contaminated")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      finally spark.conf.set("spark.graft.knn.probeRadius", "1")
    }
    val at1 = contaminatedAt(1)
    val at2 = contaminatedAt(2)
    assert(at1.subsetOf(at2),
      s"r2 ring must include r1's verdicts: r1=$at1 r2=$at2")
    // the exact copies of eval members divert at BOTH radii: an
    // exact copy shares its source's bucket, and the own bucket is
    // in every ring
    val fold9 = emb.where(col("vec_id") < 30)
      .where(conv(substring(md5(col("vec_id").cast("string")
        .cast("binary")), 1, 4), 16, 10).cast("long") % 10 === 9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(fold9.nonEmpty, "fixture too small: no eval members below 30")
    assert(fold9.subsetOf(at1) && fold9.subsetOf(at2),
      s"eval-member copies must divert at both radii: eval=$fold9 r1=$at1")
  }
}
