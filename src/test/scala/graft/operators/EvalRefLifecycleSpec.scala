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
  }
}
