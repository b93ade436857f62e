package graft.pipeline

import graft.SparkSpec

/** Layout GC (`Ctl index-gc` → [[Governance.gcLayouts]]): superseded
  * standing-layout generations are found by FAMILY against the
  * catalog the builders themselves derive their names from, current
  * generations and unknown (parameter-keyed / fixture) dirs are never
  * touched, crashed staged writes are reported but never taken, and
  * dry-run deletes nothing.
  */
class LayoutGcSpec extends SparkSpec {

  test("superseded generations collected; current, unknown and stages kept") {
    val sfDir = java.nio.file.Files
      .createTempDirectory("graft_gc_corpus").toString
    val root = java.nio.file.Paths.get(graft.GraftSession.fixtureRoot(sfDir))
    def mk(name: String): java.nio.file.Path =
      java.nio.file.Files.createDirectories(root.resolve(name))
    // superseded generations of known families
    mk("invindex_v1")
    mk("knn_v3_r1")
    mk("usersketch_v1_k10") // old sketch precision
    // current generations (must survive), one with a crashed stage
    mk("invindex_v2/.append_stage_w9")
    mk("knn_v4_r1")
    mk("knn_v4_r2") // both radii are current by design
    // unknown families / fixture outputs (must survive)
    mk("kmeans_emb_k8_i4_v1")
    mk("forget_corpus")
    mk("ingest_out")
    // the RETIRED pre-r18 federated split (no version suffix) is
    // superseded by name; the N-keyed splits are parameter-keyed
    // caches like kmeans_* and survive
    mk("fed_shards")
    mk("fed_shards_n4")

    // dry-run: lists, deletes nothing
    val (dry, stages) = Governance.gcLayouts(sfDir)
    assert(dry.map(p => java.nio.file.Paths.get(p).getFileName.toString).sorted
      === Seq("fed_shards", "invindex_v1", "knn_v3_r1", "usersketch_v1_k10"))
    assert(stages.size === 1 && stages.head.endsWith(".append_stage_w9"))
    assert(java.nio.file.Files.isDirectory(root.resolve("invindex_v1")),
      "dry-run must not delete")

    // apply: superseded gone, everything else intact
    val (taken, _) = Governance.gcLayouts(sfDir, apply = true)
    assert(taken.size === 4)
    for (gone <- Seq("fed_shards", "invindex_v1", "knn_v3_r1", "usersketch_v1_k10"))
      assert(!java.nio.file.Files.exists(root.resolve(gone)), s"$gone survived")
    for (kept <- Seq("invindex_v2/.append_stage_w9", "knn_v4_r1", "knn_v4_r2",
        "kmeans_emb_k8_i4_v1", "forget_corpus", "ingest_out", "fed_shards_n4"))
      assert(java.nio.file.Files.exists(root.resolve(kept)), s"$kept taken")

    // idempotent: a clean root reports nothing
    val (again, stillStages) = Governance.gcLayouts(sfDir)
    assert(again.isEmpty && stillStages.size === 1)
  }

  test("sweep-stage deletes only the named tag's stage; the tag is then retryable") {
    val sfDir = java.nio.file.Files
      .createTempDirectory("graft_gc_sweep").toString
    val root = java.nio.file.Paths.get(graft.GraftSession.fixtureRoot(sfDir))
    def mk(name: String): java.nio.file.Path =
      java.nio.file.Files.createDirectories(root.resolve(name))
    mk("invindex_v2/.append_stage_2026-08")
    mk("invindex_v2/.append_stage_2026-08-15") // the dash-tag sibling
    mk("invindex_v2/.forget_stage_abc123")

    // only the NAMED tag dies — never a prefix sweep
    val swept = Governance.sweepStage(sfDir, "invindex_v2", "2026-08")
    assert(swept.size === 1 && swept.head.endsWith(".append_stage_2026-08"))
    assert(java.nio.file.Files.exists(
      root.resolve("invindex_v2/.append_stage_2026-08-15")),
      "a sibling tag's stage must survive a sweep")
    assert(java.nio.file.Files.exists(
      root.resolve("invindex_v2/.forget_stage_abc123")))

    // an unknown tag reports nothing, invents nothing
    assert(Governance.sweepStage(sfDir, "invindex_v2", "nope").isEmpty)

    // the consumer-derivation claim sweeps under the "derive" tag
    mk("knn_v4_r1/.derive_stage")
    val sweptD = Governance.sweepStage(sfDir, "knn_v4_r1", "derive")
    assert(sweptD.size === 1 && sweptD.head.endsWith(".derive_stage"))
    assert(!java.nio.file.Files.exists(
      root.resolve("knn_v4_r1/.derive_stage")))

    // the swept tag's claim is free again (delete-to-retry completed)
    java.nio.file.Files.createDirectory(
      root.resolve("invindex_v2/.append_stage_2026-08"))
    assert(Governance.sweepStage(sfDir, "invindex_v2", "2026-08").size === 1)

    // GC reports fixture-root staging leftovers too (evalref rebuild,
    // forget-log moves)
    mk(".evalref_rebuild_stage")
    mk(".forget_log_stage_x1")
    val (_, stages) = Governance.gcLayouts(sfDir)
    assert(stages.exists(_.endsWith(".evalref_rebuild_stage")) &&
      stages.exists(_.endsWith(".forget_log_stage_x1")), s"stages: $stages")

    // ...and every reported root stage has a matching sweep path:
    // layout "root" + the stage's tag ("evalref-rebuild" for the
    // suffix-less rebuild claim, the unique tag for forget-log moves)
    val sweptLog = Governance.sweepStage(sfDir, "root", "x1")
    assert(sweptLog.size === 1 &&
      sweptLog.head.endsWith(".forget_log_stage_x1"))
    assert(!java.nio.file.Files.exists(root.resolve(".forget_log_stage_x1")))
    val sweptEval = Governance.sweepStage(sfDir, "root", "evalref-rebuild")
    assert(sweptEval.size === 1 &&
      sweptEval.head.endsWith(".evalref_rebuild_stage"))
    assert(!java.nio.file.Files.exists(root.resolve(".evalref_rebuild_stage")))
    // unknown root tags report nothing, invent nothing
    assert(Governance.sweepStage(sfDir, "root", "nope").isEmpty)
  }
}
