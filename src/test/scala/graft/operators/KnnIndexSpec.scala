package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The standing knn-graph layout: append == from-scratch union
  * rebuild, layout-served == scan twin, semantic edge compaction
  * invariance, and foreachBatch idempotence of the two-stage append.
  */
class KnnIndexSpec extends SparkSpec {

  /** Write `df` as a minimal corpus dir buildKnn can read. */
  private def corpusDir(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_corpus").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def served(layout: String): Seq[(Long, Long, Long, Long)] =
    SimilarityQueries.knnGraphAt(spark, layout).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("append equals a from-scratch rebuild of the union at the same planes") {
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 400).select("vec_id", "embedding")
    // the batch: shifted copies of 30 vectors plus 20 fresh ones —
    // copies guarantee ring collisions (affected old vectors exist)
    val batch = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 30)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      .unionByName(graft.GraftSession.table(spark, sf(), "embeddings")
        .where(col("vec_id") >= 400 && col("vec_id") < 420)
        .select("vec_id", "embedding"))
    val dirA = corpusDir(base)
    val layoutA = s"$dirA/knn_layout"
    SimilarityQueries.buildKnn(spark, dirA, layoutA)
    SimilarityQueries.knnAppendAt(spark, layoutA, batch, (_, f) => f())

    val dirU = corpusDir(base.unionByName(batch))
    val layoutU = s"$dirU/knn_layout"
    SimilarityQueries.buildKnn(spark, dirU, layoutU)

    val a = served(layoutA)
    val u = served(layoutU)
    assert(a.nonEmpty)
    assert(a === u, "appended layout diverged from the union rebuild")
    // an appended exact copy is its original's top neighbor
    val top1 = a.filter(t => t._1 == 100000L && t._2 == 1L)
    assert(top1.nonEmpty)
    // the cosine partials merge identically: outliers served from the
    // appended layout == from the union rebuild
    val oa = SimilarityQueries.knnOutliersAt(spark, layoutA).collect().map(_.toSeq).toSeq
    val ou = SimilarityQueries.knnOutliersAt(spark, layoutU).collect().map(_.toSeq).toSeq
    assert(oa.nonEmpty && oa === ou, "outlier partials diverged from the union rebuild")
  }

  test("layout-served graph and outliers equal the scan twins") {
    val g = SimilarityQueries.knnGraphIndexed(spark, sf()).collect().toSeq
    val gScan = SimilarityQueries.knnGraph(spark, sf()).collect().toSeq
    assert(g.nonEmpty && g === gScan)
    val o = SimilarityQueries.knnOutliersIndexed(spark, sf()).collect().toSeq
    val oScan = SimilarityQueries.knnOutliers(spark, sf()).collect().toSeq
    assert(o.nonEmpty && o === oScan)
  }

  test("semantic edge compaction: served rows invariant, partials collapse") {
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 200).select("vec_id", "embedding")
    val dir = corpusDir(base)
    val layout = s"$dir/knn_layout"
    SimilarityQueries.buildKnn(spark, dir, layout)
    // two appends of exact copies → three partial generations for the
    // copied vectors' buckets
    def copies(lo: Int, hi: Int, shift: Long) =
      graft.GraftSession.table(spark, sf(), "embeddings")
        .where(col("vec_id") >= lo && col("vec_id") < hi)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
    SimilarityQueries.knnAppendAt(spark, layout, copies(0, 20, 100000L), (_, f) => f())
    SimilarityQueries.knnAppendAt(spark, layout, copies(0, 20, 200000L), (_, f) => f())
    val before = served(layout)
    val outBefore = SimilarityQueries.knnOutliersAt(spark, layout)
      .collect().map(_.toSeq).toSeq
    val rowsBefore = spark.read.parquet(s"$layout/edges").count()
    val cRowsBefore = spark.read.parquet(s"$layout/cedges").count()
    SimilarityQueries.knnCompactAt(spark, layout)
    val after = served(layout)
    val rowsAfter = spark.read.parquet(s"$layout/edges").count()
    val cRowsAfter = spark.read.parquet(s"$layout/cedges").count()
    assert(after === before, "compaction changed the served graph")
    assert(SimilarityQueries.knnOutliersAt(spark, layout)
      .collect().map(_.toSeq).toSeq === outBefore,
      "compaction changed the served outliers")
    assert(rowsAfter < rowsBefore,
      s"compaction did not collapse partials ($rowsBefore -> $rowsAfter)")
    assert(cRowsAfter < cRowsBefore,
      s"compaction did not collapse cosine partials ($cRowsBefore -> $cRowsAfter)")
    // steady-state bound: ≤ k rows per vector
    val nVecs = spark.read.parquet(s"$layout/vecs").count()
    assert(rowsAfter <= nVecs * 5)
    assert(cRowsAfter <= nVecs * 5)
  }

  test("knnLookup: equals the served graph's subset; prunes edge dirs at the listing") {
    val full = SimilarityQueries.knnGraphIndexed(spark, sf()).collect()
      .filter(r => SimilarityQueries.KnnLookupIds.contains(r.getLong(0)))
      .map(_.toSeq).toSeq
    val looked = SimilarityQueries.knnLookup(spark, sf()).collect()
      .map(_.toSeq).toSeq
    assert(looked.nonEmpty && looked === full)
    // the lookup reads ≤ |ids| partition directories: the kb filter
    // reaches the file listing as a PartitionFilter, never a full scan
    val plan = SimilarityQueries.knnLookup(spark, sf())
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*kb".r.findFirstIn(plan).isDefined,
      s"kb prune missing from the scan:\n$plan")
  }

  test("knnClusters: planted duplicate families land in one component each") {
    // 100 base vectors + two exact copies of the first 8 — each
    // (v, v+100000, v+200000) trio is mutually top-ranked at cosine
    // 1.0 and must collapse into ONE component labeled min id = v
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 100).select("vec_id", "embedding")
    def copies(shift: Long) =
      graft.GraftSession.table(spark, sf(), "embeddings")
        .where(col("vec_id") < 8)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
    val dir = corpusDir(base.unionByName(copies(100000L)).unionByName(copies(200000L)))
    val labels = SimilarityQueries.knnClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { v =>
      assert(labels.contains(v.toLong), s"planted original $v missing")
      assert(labels.get(v + 100000L) === Some(labels(v.toLong)),
        s"copy $v+100000 split from its family")
      assert(labels.get(v + 200000L) === Some(labels(v.toLong)),
        s"copy $v+200000 split from its family")
    }
    // cluster labels are component minima: every label is a member id
    // no greater than any member carrying it
    labels.groupBy(_._2).foreach { case (lab, members) =>
      assert(members.keys.min === lab, s"label $lab is not the component min")
    }
  }

  test("knnCentrality: planted cliques dominate the hub ranking; deterministic") {
    // 60 base vectors + two exact copies of the first 6: each trio is
    // a mutual clique at cosine 1.0 — maximal connectivity, so clique
    // members must dominate the top of the centrality ranking
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 60).select("vec_id", "embedding")
    def copies(shift: Long) =
      graft.GraftSession.table(spark, sf(), "embeddings")
        .where(col("vec_id") < 6)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
    val dir = corpusDir(base.unionByName(copies(100000L)).unionByName(copies(200000L)))
    val top = SimilarityQueries.knnCentrality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top.nonEmpty)
    // ranks are ppm-scaled: every rank carries at least the damping
    // floor, and the list is ordered (desc, id asc)
    assert(top.forall(_._2 >= 150000L))
    assert(top.sameElements(top.sortBy(t => (-t._2, t._1))))
    // clique membership dominates: among the top rows, planted-family
    // members (originals or copies of ids < 6) appear
    val fam = top.map(_._1).filter(id => id % 100000L < 6)
    assert(fam.nonEmpty, s"no planted clique member in top: ${top.mkString(", ")}")
    // deterministic across runs (integer arithmetic end to end)
    val again = SimilarityQueries.knnCentrality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq === again.toSeq)
  }

  test("knnRepresentatives: one keeper per component, a member, max-rank-min-id") {
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 60).select("vec_id", "embedding")
    def copies(shift: Long) =
      graft.GraftSession.table(spark, sf(), "embeddings")
        .where(col("vec_id") < 6)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
    val dir = corpusDir(base.unionByName(copies(100000L)).unionByName(copies(200000L)))
    val reps = SimilarityQueries.knnRepresentatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val clusters = SimilarityQueries.knnClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2)
    assert(reps.nonEmpty)
    // exactly one row per component, sizes agree, keeper is a member
    assert(reps.map(_._1).toSet === byCluster.keySet)
    reps.foreach { case (cid, n, keep, rank) =>
      val members = byCluster(cid).map(_._1).toSet
      assert(n === members.size.toLong, s"cluster $cid size")
      assert(members.contains(keep), s"keeper $keep not in cluster $cid")
      assert(rank >= 150000L)
    }
    // each planted trio's component keeps exactly one of the three
    (0 until 6).foreach { v =>
      val cid = clusters.toMap.apply(v.toLong)
      val keep = reps.find(_._1 == cid).get._3
      assert(keep % 100000L < 6, s"keeper $keep not from the planted family")
    }
  }

  test("derived mutual/ranks: consumers read the standing dirs; append invalidates; parity with fresh derivation") {
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 100).select("vec_id", "embedding")
    def copies(shift: Long) =
      graft.GraftSession.table(spark, sf(), "embeddings")
        .where(col("vec_id") < 8)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
    val dir = corpusDir(base.unionByName(copies(100000L)))
    val layout = SimilarityQueries.knnLayoutPath(dir)
    val clusters1 = SimilarityQueries.knnClusters(spark, dir)
      .collect().map(_.toSeq).toSeq
    // the consumer built the derived standing relations
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(layout, "_DERIVED_OK")))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(layout, "mutual")))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(layout, "ranks")))
    // parity: the standing dirs equal a fresh derivation from the
    // same layout (mutual) and its rank rounds (ranks)
    val freshPairs = SimilarityQueries.knnMutualEdgesAt(spark, layout)
    val freshMutual = freshPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val standMutual = spark.read.parquet(s"$layout/mutual").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(standMutual.nonEmpty && standMutual === freshMutual)
    val freshRanks = SimilarityQueries.knnRanksFrom(freshPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val standRanks = spark.read.parquet(s"$layout/ranks").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("r"))).toSet
    assert(standRanks === freshRanks)
    // an APPEND invalidates the marker before touching edges (a
    // consumer racing it sees "absent", never stale), KEEPS the dirs
    // as splice input, and records its changed ids
    SimilarityQueries.knnAppendAt(spark, layout, copies(200000L), (_, f) => f())
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(layout, "_DERIVED_OK")),
      "append left a stale derived marker")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(layout, "mutual/_SUCCESS")),
      "append must keep the previous generation as splice input")
    assert(spark.read.parquet(s"$layout/derived_delta").count() > 0,
      "append recorded no derived-splice delta")
    // …and the consumers rebuild it over the grown graph: the new
    // copies join their families' components
    val clusters2 = SimilarityQueries.knnClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { v =>
      assert(clusters2.get(v + 200000L) === Some(clusters2(v.toLong)),
        s"appended copy $v+200000 split from its family")
    }
    assert(clusters1.nonEmpty && clusters2.size > clusters1.size)
    // representatives/centrality read the same standing relations and
    // stay mutually consistent (keeper rank matches the ranks dir)
    val ranks = spark.read.parquet(s"$layout/ranks").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("r")).toMap
    SimilarityQueries.knnRepresentatives(spark, dir).collect().foreach { r =>
      assert(ranks.get(r.getLong(2)) === Some(r.getLong(3)))
    }
  }

  test("probe radius 2: layout-stamped conf; append == union rebuild; candidates superset of radius 1") {
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 300).select("vec_id", "embedding")
    val batch = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val dirA = corpusDir(base)
    val dirU = corpusDir(base.unionByName(batch))
    // an ISOLATED child session carries the conf (suites share the
    // JVM session and run in parallel — never mutate its conf)
    val s2 = spark.newSession()
    s2.conf.set(SimilarityQueries.KnnProbeRadiusKey, "2")
    // the conf stamps the layout: distinct path, radius in meta
    assert(SimilarityQueries.knnLayoutPath(dirA, 1)
      !== SimilarityQueries.knnLayoutPath(dirA, 2))
    val layoutA = s"$dirA/knn_layout_r2"
    SimilarityQueries.buildKnn(s2, dirA, layoutA)
    assert(s2.read.parquet(s"$layoutA/meta").head.getInt(2) === 2)
    // append == from-scratch union rebuild AT RADIUS 2; the append is
    // driven from the DEFAULT-conf session — it must read the
    // layout's STAMPED radius, not the ambient conf's
    SimilarityQueries.knnAppendAt(spark, layoutA, batch, (_, f) => f())
    val layoutU = s"$dirU/knn_layout_r2"
    SimilarityQueries.buildKnn(s2, dirU, layoutU)
    val a = served(layoutA)
    assert(a.nonEmpty && a === served(layoutU),
      "radius-2 appended layout diverged from the union rebuild")
    // serve == scan twin at radius 2
    val scan2 = SimilarityQueries.knnGraphScan(spark, dirU, 2)
      .collect().map(_.toSeq).toSeq
    assert(SimilarityQueries.knnGraphAt(spark, layoutU).collect()
      .map(_.toSeq).toSeq === scan2)
    // radius 2 sees every radius-1 candidate (the mask set is a
    // superset), so each vector's k-th (minimum ranked) score can
    // only be ≥ its radius-1 value
    val g1 = SimilarityQueries.knnGraphScan(spark, dirU, 1).collect()
      .map(r => (r.getLong(0), r.getLong(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    val g2 = SimilarityQueries.knnGraphScan(spark, dirU, 2).collect()
      .map(r => (r.getLong(0), r.getLong(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    g1.keySet.intersect(g2.keySet).foreach { v =>
      assert(g2(v) >= g1(v),
        s"radius-2 top-k floor regressed for $v: ${g2(v)} < ${g1(v)}")
    }
  }

  test("knnMaintainStream: stream-fed layout equals a from-scratch union rebuild") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 150).select("vec_id", "embedding")
    val dir = corpusDir(base)
    SimilarityQueries.knnLayout(spark, dir) // standing layout before the stream
    def batchVecs(lo: Int, hi: Int, shift: Long) =
      graft.GraftSession.table(spark, sf(), "embeddings")
        .where(col("vec_id") >= lo && col("vec_id") < hi)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.StreamingOps.knnMaintainStream(
      input.toDF().toDF("vec_id", "embedding"), dir).start()
    try {
      input.addData(batchVecs(0, 10, 100000L).toSeq: _*); q.processAllAvailable()
      input.addData(batchVecs(10, 25, 100000L).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = served(SimilarityQueries.knnLayoutPath(dir))
    val dirU = corpusDir(base.unionByName(
      graft.GraftSession.table(spark, sf(), "embeddings")
        .where(col("vec_id") < 25)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))))
    val layoutU = s"$dirU/knn_layout"
    SimilarityQueries.buildKnn(spark, dirU, layoutU)
    assert(streamed.nonEmpty && streamed === served(layoutU))
  }

  test("knnAppendOnce: a replayed batch is skipped; both stage markers recorded") {
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 100).select("vec_id", "embedding")
    val dir = corpusDir(base)
    val batch = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    assert(SimilarityQueries.knnAppendOnce(spark, dir, batch, batchId = 7L))
    val layout = SimilarityQueries.knnLayoutPath(dir)
    val once = served(layout)
    // replay: the whole batch must skip (no duplicate partials —
    // a duplicated neighbor would occupy two of the k slots)
    assert(!SimilarityQueries.knnAppendOnce(spark, dir, batch, batchId = 7L))
    assert(served(layout) === once)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(layout, "_LAST_BATCH")).trim === "7")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(layout, "_LAST_BATCH_EDGES")).trim === "7")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(layout, "_LAST_BATCH_VECS")).trim === "7")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(layout, "_LAST_BATCH_CEDGES")).trim === "7")
    // a crash AFTER both stage commits but BEFORE the batch marker:
    // simulate by rolling the outer marker back — the replay must
    // skip both committed stages (re-appending either would plant
    // duplicate partials / duplicate vec rows)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(layout, "_LAST_BATCH"), "6")
    val vecsBefore = spark.read.parquet(s"$layout/vecs").count()
    val edgesBefore = spark.read.parquet(s"$layout/edges").count()
    assert(SimilarityQueries.knnAppendOnce(spark, dir, batch, batchId = 7L))
    assert(spark.read.parquet(s"$layout/edges").count() === edgesBefore)
    assert(spark.read.parquet(s"$layout/vecs").count() === vecsBefore)
    assert(served(layout) === once)
  }

  test("knnMargin: an isolated duplicate pair out-ranks a dense clique") {
    import org.apache.spark.sql.functions._
    // corpus: 50 natural vectors + a 10-copy CLIQUE of vector 0 + ONE
    // extra copy of vector 30. Clique members' top-k are all mutual
    // 1.0s, so their margin collapses to ~1.0 (2k·c1 / 2·(k·c1)) —
    // the hub discount; the isolated pair (30, 200) has c1 = 1.0 over
    // an otherwise-random neighborhood, so its margin stays well
    // above. The margin ranking must lead with the isolated pair in
    // BOTH directions.
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 50).select("vec_id", "embedding")
    val clique = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") === 0)
      .crossJoin(spark.range(100, 110).select(col("id")))
      .select(col("id").as("vec_id"), col("embedding"))
    val loner = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") === 30)
      .select(lit(200L).as("vec_id"), col("embedding"))
    val dir = corpusDir(base.unionByName(clique).unionByName(loner))
    val m = SimilarityQueries.knnMargin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(m.nonEmpty)
    val top2 = m.take(2).map(t => (t._1, t._2)).toSet
    assert(top2 === Set((30L, 200L), (200L, 30L)),
      s"isolated pair should lead the margin ranking: ${m.take(4).toSeq}")
    // clique members sit at the ~1.0 discount floor, strictly below
    val cliqueMargins = m
      .filter(t => t._1 == 0L || (t._1 >= 100L && t._1 < 110L)).map(_._3)
    assert(cliqueMargins.forall(_ < m.head._3),
      s"clique margins should be discounted below the isolated pair")
  }

  test("knnHubness: a planted star's center tops the in-degree ranking") {
    import org.apache.spark.sql.functions._
    // 50 natural vectors + 10 exact copies of vector 0: every copy's
    // top-k ranks vector 0 first among its identical-score neighbors
    // (the (score desc, id asc) tie rule — id 0 is the smallest), so
    // the star center's in-degree must be >= the copy count and rank
    // first overall
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") < 50).select("vec_id", "embedding")
    val copies = graft.GraftSession.table(spark, sf(), "embeddings")
      .where(col("vec_id") === 0)
      .crossJoin(spark.range(100, 110).select(col("id")))
      .select(col("id").as("vec_id"), col("embedding"))
    val dir = corpusDir(base.unionByName(copies))
    val hubs = SimilarityQueries.knnHubness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hubs.nonEmpty)
    assert(hubs(0)._1 === 0L, s"star center should top the ranking: ${hubs.take(3).toSeq}")
    assert(hubs(0)._2 >= 10L, s"center in-degree below the copy count: ${hubs(0)}")
  }
}
