package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Maintenance paths of the standing layouts: the simhash append must
  * be bit-equal to a union rebuild, replayed batches must be no-ops,
  * and index compaction must shrink the file count without changing a
  * single posting.
  */
class LayoutMaintenanceSpec extends SparkSpec {

  import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}

  private def docsDF(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def write(dir: String, rows: Seq[(Long, String)]): Unit =
    docsDF(rows).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private val a = Seq(1L -> "spark merge data", 2L -> "data data spark")
  private val b = Seq(10L -> "merge spark merge", 11L -> "fresh words here")

  test("simhashAppend == from-scratch rebuild of the union corpus") {
    val incDir = java.nio.file.Files.createTempDirectory("graft_sh_inc").toString
    write(incDir, a)
    val fp = DedupQueries.simhashAppend(spark, incDir, docsDF(b))
    val fullDir = java.nio.file.Files.createTempDirectory("graft_sh_full").toString
    write(fullDir, a ++ b)
    val fullFp = DedupQueries.simhashLayout(spark, fullDir)
    def rows(p: String): Seq[(Long, Long)] =
      spark.read.parquet(p).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows(fp) === rows(fullFp))
    assert(rows(fp).map(_._1) === Seq(1L, 2L, 10L, 11L))
  }

  test("simhashAppendOnce skips a replayed batchId") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sh_once").toString
    write(dir, a)
    assert(DedupQueries.simhashAppendOnce(spark, dir, docsDF(b), batchId = 0L))
    val fp = DedupQueries.simhashLayout(spark, dir)
    val afterFirst = spark.read.parquet(fp).count()
    assert(!DedupQueries.simhashAppendOnce(spark, dir, docsDF(b), batchId = 0L))
    assert(spark.read.parquet(fp).count() === afterFirst, "replay is a no-op")
    assert(DedupQueries.simhashAppendOnce(spark, dir,
      docsDF(Seq(20L -> "next batch")), batchId = 1L))
    assert(spark.read.parquet(fp).count() === afterFirst + 1)
  }

  test("invIndexCompact: fewer files, identical postings, probes stay green") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    write(dir, a)
    // three appends fragment the bucket directories
    TextQueries.invIndexAppend(spark, dir, docsDF(Seq(10L -> "spark alpha")))
    TextQueries.invIndexAppend(spark, dir, docsDF(Seq(11L -> "spark beta")))
    TextQueries.invIndexAppend(spark, dir,
      docsDF(Seq(12L -> "spark gamma merge")))
    val layout = s"${graft.GraftSession.fixtureRoot(dir)}/invindex_v2"
    def postings(): Seq[Seq[Any]] =
      spark.read.parquet(s"$layout/postings")
        .select("tok", "doc_id", "dl", "tf", "positions", "tb")
        .collect().toSeq.map(_.toSeq)
        .sortBy(r => (r(0).toString, r(1).toString.toLong))
    def fileCount(): Long = {
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$layout/postings"))
      try walk.filter(p => p.toString.endsWith(".parquet")).count()
      finally walk.close()
    }
    val before = postings()
    val fragsBefore = fileCount()
    TextQueries.invIndexCompact(spark, dir)
    assert(postings() === before, "compaction must not change one posting")
    assert(fileCount() < fragsBefore,
      s"compaction must shrink files: $fragsBefore -> ${fileCount()}")
    // a leftover staging dir from a crashed compaction is cleared
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$layout/postings_compacting"))
    TextQueries.invIndexCompact(spark, dir)
    assert(postings() === before)
  }

  test("compaction recovers a crash INSIDE the swap without losing the only copy") {
    val dir = java.nio.file.Files.createTempDirectory("graft_swapcrash").toString
    write(dir, a)
    TextQueries.invIndexAppend(spark, dir, docsDF(Seq(10L -> "spark alpha")))
    val layout = s"${graft.GraftSession.fixtureRoot(dir)}/invindex_v2"
    def postings(): Seq[Seq[Any]] =
      spark.read.parquet(s"$layout/postings")
        .select("tok", "doc_id", "dl", "tf", "positions", "tb")
        .collect().toSeq.map(_.toSeq)
        .sortBy(r => (r(0).toString, r(1).toString.toLong))
    val before = postings()
    // simulate dying between deleteRec(live) and the final move: the
    // COMPLETE staged tree (with its _SUCCESS) is the only copy left
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$layout/postings"),
      java.nio.file.Paths.get(s"$layout/postings_compacting"))
    TextQueries.invIndexCompact(spark, dir)
    assert(postings() === before,
      "recovery must finish the crashed swap, not destroy the staged copy")
    // an INCOMPLETE staged tree (no _SUCCESS) beside a live tree clears
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$layout/postings_compacting/tb=0"))
    TextQueries.invIndexCompact(spark, dir)
    assert(postings() === before)
  }

  test("compactPartitioned preserves an append that lands DURING the compaction") {
    // the snapshot-isolation contract: files created by a concurrent
    // maintenance append (which only ever CREATES files) are not in
    // the compaction's snapshot, so the swap neither reads nor deletes
    // them — no silent loss under a live maintenance stream
    val dir = java.nio.file.Files.createTempDirectory("graft_concomp")
      .toString + "/tree"
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    Seq((4L, "a")).toDF("id", "p")
      .write.mode("append").partitionBy("p").parquet(dir) // fragment
    def ids(): Seq[Long] = spark.read.parquet(dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    graft.GraftSession.compactPartitioned(spark, dir, "p", { () =>
      // lands after the staged tree + manifest, before the swap — the
      // worst spot: a naive tree swap would wipe it
      Seq((99L, "c"), (100L, "a")).toDF("id", "p")
        .write.mode("append").partitionBy("p").parquet(dir)
    })
    assert(ids() === Seq(1L, 2L, 3L, 4L, 99L, 100L),
      "concurrently appended rows must survive the compaction swap")
  }

  test("compaction crash between staged build and swap replays idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crashcomp")
      .toString + "/tree"
    Seq((1L, "a"), (2L, "b")).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    Seq((3L, "a")).toDF("id", "p")
      .write.mode("append").partitionBy("p").parquet(dir)
    def ids(): Seq[Long] = spark.read.parquet(dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val boom = intercept[RuntimeException] {
      graft.GraftSession.compactPartitioned(spark, dir, "p",
        () => throw new RuntimeException("die before swap"))
    }
    assert(boom.getMessage === "die before swap")
    // live tree untouched by the crashed run; staged + manifest linger
    assert(ids() === Seq(1L, 2L, 3L))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      dir + "_compacting", "_COMPACT_MANIFEST")))
    // the next run finishes the crashed swap from the manifest, then
    // compacts afresh — rows identical, staging gone
    graft.GraftSession.compactPartitioned(spark, dir, "p")
    assert(ids() === Seq(1L, 2L, 3L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + "_compacting")))
  }

  test("mid-swap crash replays from the manifest — no row lost or doubled") {
    // the most safety-critical window: manifest + breadcrumb are
    // down, the swap is partially applied (some snapshot files already
    // deleted, some staged files already moved), and the process dies
    val dir = java.nio.file.Files.createTempDirectory("graft_midswap")
      .toString + "/tree"
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    Seq((4L, "b")).toDF("id", "p")
      .write.mode("append").partitionBy("p").parquet(dir)
    def ids(): Seq[Long] = spark.read.parquet(dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val boom = intercept[RuntimeException] {
      graft.GraftSession.compactPartitioned(spark, dir, "p", { () =>
        // simulate the swap dying after its first deletions: drop one
        // live snapshot file by hand, then crash
        val live = java.nio.file.Paths.get(dir)
        val victim = java.nio.file.Files.walk(live)
        try {
          val f = victim.filter(p =>
            p.toString.endsWith(".parquet") &&
              java.nio.file.Files.isRegularFile(p)).findFirst().get()
          java.nio.file.Files.delete(f)
          java.nio.file.Files.deleteIfExists(
            f.resolveSibling("." + f.getFileName.toString + ".crc"))
        } finally victim.close()
        throw new RuntimeException("die mid-swap")
      })
    }
    assert(boom.getMessage === "die mid-swap")
    // the live tree is now INCOMPLETE — only the manifest replay can
    // restore it; the next run must finish the swap, not discard it
    graft.GraftSession.compactPartitioned(spark, dir, "p")
    assert(ids() === Seq(1L, 2L, 3L, 4L),
      "replay must restore every row exactly once")
  }

  test("engine discards a stale manifest structurally — no rebuild convention needed") {
    // a NEW layout that gains compaction without remembering the
    // rebuild-clears-staging convention must still be safe: the
    // _COMPACT_IN_PROGRESS breadcrumb lives in the live tree, so any
    // rebuild (parquet overwrite clears the dir) revokes the replay
    // authorization and the engine discards the staged tree
    val dir = java.nio.file.Files.createTempDirectory("graft_struct")
      .toString + "/tree"
    Seq((1L, "a"), (2L, "b")).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    intercept[RuntimeException] {
      graft.GraftSession.compactPartitioned(spark, dir, "p",
        () => throw new RuntimeException("die before swap"))
    }
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      dir + "_compacting", "_COMPACT_MANIFEST")))
    // a rebuild from a NEW corpus rewrites the live dir wholesale —
    // the breadcrumb vanishes with it
    Seq((10L, "a"), (11L, "c")).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    graft.GraftSession.compactPartitioned(spark, dir, "p")
    def ids(): Seq[Long] = spark.read.parquet(dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids() === Seq(10L, 11L),
      "the stale staged tree must be discarded, never merged into the rebuilt layout")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + "_compacting")))
  }

  test("a layout REBUILD voids a crashed compaction's staging — no stale merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stale").toString
    write(dir, a)
    TextQueries.invIndexAppend(spark, dir, docsDF(Seq(10L -> "spark alpha")))
    val layout = s"${graft.GraftSession.fixtureRoot(dir)}/invindex_v2"
    // compaction crashes AFTER its manifest lands (the authoritative-
    // staged state a restart would normally replay)
    intercept[RuntimeException] {
      graft.GraftSession.compactPartitioned(spark, s"$layout/postings", "tb",
        () => throw new RuntimeException("die before swap"))
    }
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$layout/postings_compacting/_COMPACT_MANIFEST")))
    // the corpus is regenerated → the stamp changes → next touch
    // REBUILDS; replaying the old manifest onto the fresh tree would
    // merge old-corpus postings in
    write(dir, b)
    TextQueries.invIndexCompact(spark, dir) // rebuild + compact
    val fresh = java.nio.file.Files.createTempDirectory("graft_stale_ref").toString
    write(fresh, b)
    TextQueries.warmLayouts(spark, fresh)
    val freshLayout = s"${graft.GraftSession.fixtureRoot(fresh)}/invindex_v2"
    def postings(l: String): Seq[Seq[Any]] =
      spark.read.parquet(s"$l/postings")
        .select("tok", "doc_id", "dl", "tf", "positions", "tb")
        .collect().toSeq.map(_.toSeq)
        .sortBy(r => (r(0).toString, r(1).toString.toLong))
    assert(postings(layout) === postings(freshLayout),
      "rebuilt layout must match a clean build — no stale-manifest merge")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$layout/postings_compacting")))
  }

  test("ivfPqCompact: fewer code files, identical rows, probe stays green") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqcomp").toString
    spark.read.parquet(s"${sf()}/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val layout = SimilarityQueries.ivfPqLayout(spark, dir)
    // two appends fragment the cell directories
    import org.apache.spark.sql.functions.typedLit
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    def fresh(id: Long) = base.where(col("vec_id") === 7L)
      .select(lit(id).as("vec_id"), col("embedding"))
    SimilarityQueries.ivfPqAppend(spark, dir, layout, fresh(900001L))
    SimilarityQueries.ivfPqAppend(spark, dir, layout, fresh(900002L))
    def codes(): Seq[Seq[Any]] =
      spark.read.parquet(s"$layout/codes").collect().toSeq.map(_.toSeq)
        .sortBy(_.head.toString.toLong)
    def fileCount(): Long = {
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$layout/codes"))
      try walk.filter(p => p.toString.endsWith(".parquet")).count()
      finally walk.close()
    }
    val before = codes()
    val fragsBefore = fileCount()
    SimilarityQueries.ivfPqCompact(spark, dir)
    assert(codes() === before, "compaction must not change one code row")
    assert(fileCount() < fragsBefore,
      s"compaction must shrink files: $fragsBefore -> ${fileCount()}")
    assert(SimilarityQueries.annIvfPq(spark, dir).count() === 10L)
  }
}
