package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two compaction disciplines the forget tier's physical-delete
  * leg now carries on every layout:
  *
  *   1. CONSUMED-ONLY retirement — a tombstone staged-moved in AFTER
  *      the compaction snapshots the tombstone dir (pinned via the
  *      `afterTombSnapshotSeam`) survives the compaction unapplied
  *      but standing: it keeps hiding its rows through the serving
  *      anti-joins and the NEXT compaction retires it. The former
  *      wholesale `deleteRec(tombstones)` destroyed such a tombstone
  *      unapplied — the forgotten doc silently became servable again
  *      with no pending marker.
  *   2. PARTITION/FILE PRUNING — with tombstones pending, only the
  *      dirs (tb / cell / kb) or files (flat simhash) carrying a
  *      victim row rewrite; everything else keeps its exact file set,
  *      so the physical delete costs ∝ affected partitions, not
  *      corpus.
  */
class ForgetCompactionSpec extends SparkSpec {

  test("inputFileNamePath decodes Spark's url-encoded names and passes raw ones through") {
    // Spark's input_file_name() emits the URL-ENCODED form (a dir
    // named `a b` reads back `…/a%20b/…`): the URI parse decodes it
    assert(graft.GraftSession.inputFileNamePath(
      "file:///tmp/graft%20uri/t.parquet/part-0.parquet")
      === "/tmp/graft uri/t.parquet/part-0.parquet")
    // a RAW un-encoded name (illegal in a URI — the former
    // `new URI(raw)` threw URISyntaxException and failed the
    // compaction) falls back to the lenient Hadoop Path parse
    assert(graft.GraftSession.inputFileNamePath("file:///tmp/a b/x")
      === "/tmp/a b/x")
    assert(graft.GraftSession.inputFileNamePath(
      "file:///tmp/plain/part-1.parquet") === "/tmp/plain/part-1.parquet")
    // a raw '#' (or '?') parses as a LEGAL uri whose getPath silently
    // TRUNCATES at the fragment/query — those must fall back to the
    // lenient Hadoop parse too, not just the throwing cases; the
    // encoded forms (%23/%3F) still decode through the URI path
    assert(graft.GraftSession.inputFileNamePath(
      "file:///tmp/corpus#v2/x.parquet") === "/tmp/corpus#v2/x.parquet")
    assert(graft.GraftSession.inputFileNamePath(
      "file:///tmp/a?b/x.parquet") === "/tmp/a?b/x.parquet")
    assert(graft.GraftSession.inputFileNamePath(
      "file:///tmp/a%23b/x.parquet") === "/tmp/a#b/x.parquet")
  }

  test("retireTombstones: a file landing after the snapshot survives; emptied dir stands") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retire")
    val a = dir.resolve("append-t1-0.parquet")
    java.nio.file.Files.writeString(a, "cohortA")
    val snap = graft.GraftSession.tombstoneSnapshot(dir)
    assert(snap === Seq(a))
    // a concurrent forget lands AFTER the snapshot — inside the
    // check-then-act window where the former `hasVisibleData +
    // deleteRec` tail could destroy it unapplied (silently
    // un-forgetting a document). Retirement must touch ONLY the
    // snapshot's files.
    val b = dir.resolve("append-t2-0.parquet")
    java.nio.file.Files.writeString(b, "cohortB")
    graft.GraftSession.retireTombstones(dir, snap)
    assert(!java.nio.file.Files.exists(a), "the consumed tombstone retires")
    assert(java.nio.file.Files.exists(b),
      "a tombstone landed after the snapshot must survive retirement")
    // an emptied tombstone dir is left STANDING (no recursive delete
    // to race) and still reads as no-tombstones everywhere
    graft.GraftSession.retireTombstones(dir, Seq(b))
    assert(java.nio.file.Files.isDirectory(dir))
    assert(!graft.GraftSession.hasVisibleData(dir))
  }

  /** dir → sorted visible file names, per top-level partition dir. */
  private def fileMap(root: String): Map[String, Seq[String]] = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(p)) return Map.empty
    val l = java.nio.file.Files.list(p)
    val dirs = try {
      val b = Seq.newBuilder[java.nio.file.Path]
      l.forEach(d => if (java.nio.file.Files.isDirectory(d) &&
        !d.getFileName.toString.startsWith("_") &&
        !d.getFileName.toString.startsWith(".")) b += d)
      b.result()
    } finally l.close()
    dirs.map { d =>
      val fl = java.nio.file.Files.list(d)
      val fs = try {
        val b = Seq.newBuilder[String]
        fl.forEach(f => if (java.nio.file.Files.isRegularFile(f) &&
          !f.getFileName.toString.startsWith("_") &&
          !f.getFileName.toString.startsWith(".")) b += f.getFileName.toString)
        b.result().sorted
      } finally fl.close()
      d.getFileName.toString -> fs
    }.toMap
  }

  test("invindex: mid-compaction tombstone survives; clean tb dirs untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc_inv").toString
    val docs = graft.GraftSession.table(spark, sf(), "documents")
      .where(col("doc_id") < 400)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val served = TextQueries.bm25Topk(spark, dir).collect().map(_.getLong(0))
    val cohortA = served.take(2).toSeq
    val cohortB = served.slice(2, 4).toSeq
    val layout = TextQueries.invIndexLayout(spark, dir)
    TextQueries.invIndexForget(spark, dir, cohortA)

    // the dirty prediction: the tb dirs recorded on cohort A's
    // tombstones — every OTHER dir must keep its exact file set
    val dirtyA = spark.read.parquet(s"$layout/tombstones")
      .where(col("tb").isNotNull).select("tb").distinct()
      .collect().map(r => s"tb=${r.getInt(0)}").toSet
    assert(dirtyA.nonEmpty, "forget must record the victims' term buckets")
    val before = fileMap(s"$layout/postings")
    assert((before.keySet -- dirtyA).nonEmpty, "fixture too small: no clean dirs")

    // cohort B's forget lands AFTER the compaction snapshots the
    // tombstone dir — the in-flight-deletion-request race
    graft.GraftSession.afterTombSnapshotSeam =
      () => { TextQueries.invIndexForget(spark, dir, cohortB); () }
    try TextQueries.invIndexCompact(spark, dir)
    finally graft.GraftSession.afterTombSnapshotSeam = () => ()

    // pruning: clean dirs kept their exact files
    val after = fileMap(s"$layout/postings")
    for (d <- before.keySet -- dirtyA)
      assert(after(d) === before(d), s"clean dir $d was rewritten")
    // cohort A went physical; cohort B survives as a standing
    // tombstone (pending, still hidden from serving)
    assert(spark.read.parquet(s"$layout/postings")
      .where(col("doc_id").isin(cohortA: _*)).count() === 0L)
    assert(TextQueries.invIndexPendingForgets(spark, dir) === 2L,
      "the mid-compaction tombstone must survive to the next compaction")
    val ids = TextQueries.bm25Topk(spark, dir).collect().map(_.getLong(0)).toSet
    assert(!(cohortA ++ cohortB).exists(ids), "a forgotten doc is servable")

    // the NEXT compaction retires it
    TextQueries.invIndexCompact(spark, dir)
    assert(TextQueries.invIndexPendingForgets(spark, dir) === 0L)
    assert(spark.read.parquet(s"$layout/postings")
      .where(col("doc_id").isin(cohortB: _*)).count() === 0L)
    // and serving still equals a rebuild over the remaining corpus
    val truth = java.nio.file.Files.createTempDirectory("graft_fc_invt").toString
    docs.where(!col("doc_id").isin((cohortA ++ cohortB): _*))
      .write.mode("overwrite").parquet(s"$truth/documents.parquet")
    assert(TextQueries.bm25Topk(spark, dir).collect().map(_.toSeq).toSeq ===
      TextQueries.bm25Topk(spark, truth).collect().map(_.toSeq).toSeq)
  }

  test("simhash: mid-compaction tombstone survives; non-carrying files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc_sim").toString
    val docs = graft.GraftSession.table(spark, sf(), "documents")
    docs.where(col("doc_id") < 200)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = DedupQueries.simhashLayout(spark, dir)
    // fragment the flat dir: an appended batch lands in its own
    // file(s), so the victims (base ids) leave the append files clean
    DedupQueries.simhashAppend(spark, dir,
      docs.where(col("doc_id") >= 200 && col("doc_id") < 400))
    assert(DedupQueries.simhashForget(spark, dir, Seq(3L, 7L)) === 2L)
    val carrying = spark.read.parquet(fp)
      .where(col("doc_id").isin(3L, 7L))
      .select(input_file_name().as("f")).distinct()
      .collect().map(r => java.nio.file.Paths.get(
        new java.net.URI(r.getString(0)).getPath).getFileName.toString).toSet
    val flatBefore = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(fp))
      try {
        val b = Seq.newBuilder[String]
        l.forEach(f => if (java.nio.file.Files.isRegularFile(f) &&
          !f.getFileName.toString.startsWith("_") &&
          !f.getFileName.toString.startsWith(".")) b += f.getFileName.toString)
        b.result().toSet
      } finally l.close()
    }
    assert((flatBefore -- carrying).nonEmpty, "fixture too small: every file carries a victim")

    graft.GraftSession.afterTombSnapshotSeam =
      () => { DedupQueries.simhashForget(spark, dir, Seq(11L)); () }
    try DedupQueries.simhashCompact(spark, dir)
    finally graft.GraftSession.afterTombSnapshotSeam = () => ()

    val flatAfter = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(fp))
      try {
        val b = Seq.newBuilder[String]
        l.forEach(f => if (java.nio.file.Files.isRegularFile(f) &&
          !f.getFileName.toString.startsWith("_") &&
          !f.getFileName.toString.startsWith(".")) b += f.getFileName.toString)
        b.result().toSet
      } finally l.close()
    }
    assert((flatBefore -- carrying).subsetOf(flatAfter),
      "a non-carrying file was rewritten")
    assert(spark.read.parquet(fp)
      .where(col("doc_id").isin(3L, 7L)).count() === 0L)
    assert(DedupQueries.simhashPendingForgets(spark, dir) === 1L,
      "the mid-compaction tombstone must survive")
    DedupQueries.simhashCompact(spark, dir)
    assert(DedupQueries.simhashPendingForgets(spark, dir) === 0L)
    assert(spark.read.parquet(fp).where(col("doc_id") === 11L).count() === 0L)
  }

  test("ivfpq: mid-compaction tombstone survives; clean cells untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc_ivf").toString
    graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 300)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(SimilarityQueries.annIvfPq(spark, dir).count() > 0)
    val layout = s"${graft.GraftSession.fixtureRoot(dir)}/ivfpq_v1"
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$layout/codes")),
      s"expected codes under $layout — bump the version in this spec?")
    assert(SimilarityQueries.ivfPqForget(spark, dir, Seq(3L, 7L)) === 2L)
    val dirty = spark.read.parquet(s"$layout/tombstones")
      .where(col("cell").isNotNull).select("cell").distinct()
      .collect().map(r => s"cell=${r.getInt(0)}").toSet
    assert(dirty.nonEmpty, "forget must record the victims' cells")
    val before = fileMap(s"$layout/codes")
    assert((before.keySet -- dirty).nonEmpty, "fixture too small: no clean cells")

    graft.GraftSession.afterTombSnapshotSeam =
      () => { SimilarityQueries.ivfPqForget(spark, dir, Seq(11L)); () }
    try SimilarityQueries.ivfPqCompact(spark, dir)
    finally graft.GraftSession.afterTombSnapshotSeam = () => ()

    val after = fileMap(s"$layout/codes")
    for (d <- before.keySet -- dirty)
      assert(after(d) === before(d), s"clean cell $d was rewritten")
    assert(spark.read.parquet(s"$layout/codes")
      .where(col("vec_id").isin(3L, 7L)).count() === 0L)
    assert(SimilarityQueries.ivfPqPendingForgets(spark, dir) === 1L)
    SimilarityQueries.ivfPqCompact(spark, dir)
    assert(SimilarityQueries.ivfPqPendingForgets(spark, dir) === 0L)
    assert(spark.read.parquet(s"$layout/codes")
      .where(col("vec_id") === 11L).count() === 0L)
  }

  test("knn: mid-compaction tombstone survives; clean kb dirs untouched; serve == rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc_knn").toString
    val emb = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 300)
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(SimilarityQueries.knnGraphIndexed(spark, dir).count() > 0)
    val layout = SimilarityQueries.knnLayoutPath(dir)
    val victimsA = Seq(3L, 7L)
    assert(SimilarityQueries.knnForgetAt(spark, layout, victimsA) === 2L)

    // dirty prediction over BOTH cohorts (B's mid-compaction forget
    // runs its own heal, which may append into B-affected dirs, and
    // the compaction's own affected set covers the live tombstones):
    // victims' kb ∪ affected survivors' kb
    val victimsB = Seq(11L)
    val victimsAB = victimsA ++ victimsB
    val vKbA = spark.read.parquet(s"$layout/tombstones")
      .where(col("kb").isNotNull).select("kb").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(vKbA.nonEmpty, "forget must record the victims' kb")
    val affIds = spark.read.parquet(s"$layout/edges")
      .where(col("neighbor_id").isin(victimsAB: _*)).select("vec_id")
      .unionByName(spark.read.parquet(s"$layout/cedges")
        .where(col("neighbor_id").isin(victimsAB: _*)).select("vec_id"))
      .distinct().collect().map(_.getLong(0)).toSeq
    // edge partials are partitioned by the ID fold (vec_id % 64):
    // dirty = victims-as-source ∪ affected survivors
    val dirty = (victimsAB ++ affIds).map(id => s"kb=${id % 64}").toSet
    val beforeE = fileMap(s"$layout/edges")
    val beforeV = fileMap(s"$layout/vecs")
    assert((beforeE.keySet -- dirty).nonEmpty, "fixture too small: no clean kb dirs")
    graft.GraftSession.afterTombSnapshotSeam = () => {
      // only the FIRST snapshot of this compaction (the knn one) gets
      // the race; the seam resets itself so the inner forget's own
      // machinery (and the vecs/edges data-file snapshots, which do
      // not go through this hook) stay clean
      graft.GraftSession.afterTombSnapshotSeam = () => ()
      SimilarityQueries.knnForgetAt(spark, layout, victimsB)
      ()
    }
    try SimilarityQueries.knnCompactAt(spark, layout)
    finally graft.GraftSession.afterTombSnapshotSeam = () => ()

    val afterE = fileMap(s"$layout/edges")
    val afterV = fileMap(s"$layout/vecs")
    for (d <- beforeE.keySet -- dirty)
      assert(afterE(d) === beforeE(d), s"clean edges dir $d was rewritten")
    // vecs: only the SNAPSHOT victims' dirs rewrite (nothing appends
    // vec rows in this test)
    for (d <- beforeV.keySet -- vKbA.map(b => s"kb=$b"))
      assert(afterV(d) === beforeV(d), s"clean vecs dir $d was rewritten")
    // cohort A physical; cohort B pending and hidden
    assert(spark.read.parquet(s"$layout/vecs")
      .where(col("vec_id").isin(victimsA: _*)).count() === 0L)
    assert(SimilarityQueries.knnPendingForgetsAtRadius(spark, dir, 1) === 1L,
      "the mid-compaction tombstone must survive")
    val g = SimilarityQueries.knnGraphAtRadius(spark, dir, 1)
    assert(g.where(col("vec_id").isin((victimsA ++ victimsB): _*) ||
      col("neighbor_id").isin((victimsA ++ victimsB): _*)).count() === 0L)

    // second compaction drains it, and the serve equals a rebuild
    // over the remaining corpus
    SimilarityQueries.knnCompactAt(spark, layout)
    assert(SimilarityQueries.knnPendingForgetsAtRadius(spark, dir, 1) === 0L)
    val truth = java.nio.file.Files.createTempDirectory("graft_fc_knnt").toString
    emb.where(!col("vec_id").isin((victimsA ++ victimsB): _*))
      .write.mode("overwrite").parquet(s"$truth/embeddings.parquet")
    assert(SimilarityQueries.knnGraphIndexed(spark, dir)
      .collect().map(_.toSeq).toSeq ===
      SimilarityQueries.knnGraphIndexed(spark, truth)
        .collect().map(_.toSeq).toSeq,
      "post-compaction serve diverged from the rebuild-over-remaining")
  }
}
