package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed Lloyd's k-means over an embedding column — the "train
  * the coarse quantizer" step that turns the IVF stand-in centroids
  * into learned ones. Deterministic: init from the first k vectors by
  * id (no RNG), assignment by exact integer-quantized dot distance, so
  * re-runs converge identically on identical data.
  *
  * Scale shape per iteration: ONE narrow assignment projection (k
  * quantized dot products per row, codegen'd) + ONE map-side-combining
  * groupBy((cell, dim)) mean over the posexploded vectors — shuffle
  * volume is k×dim doubles, independent of corpus size. The driver
  * holds only the k×dim centroid matrix.
  */
object KMeans {

  case class Model(centroids: Array[Array[Double]], inertia: Double, iters: Int)

  /** struct(d, cid) of the nearest centroid in exact integer space
    * (the shared floor(x·10⁶) quantization) — one codegen'd kernel
    * call per row ([[graft.functions.QDistArgmin]]). The earlier
    * zip_with/aggregate composition computed the same integers but
    * paid interpreted HOF dispatch per element per centroid (Spark's
    * higher-order functions are CodegenFallback) — the assignment
    * pass was the whole cost of training.
    */
  private[operators] def nearest(emb: Column, cents: Array[Array[Double]]): Column =
    graft.functions.QDistArgmin.qdistArgmin(emb, cents)

  private[operators] def cellOf(emb: Column, cents: Array[Array[Double]]): Column =
    nearest(emb, cents).getField("cid")

  /** Train on `df`'s (id, vec) columns. Init = the k vectors with the
    * smallest ids (deterministic). Empty cells keep their previous
    * centroid (the standard Lloyd fallback). `withInertia = false`
    * skips the final corpus-wide distance pass (Model.inertia = NaN) —
    * the query surfaces ([[kmeansCells]], [[SimilarityQueries
    * .semDedup]]) derive their own per-cell statistics and would pay
    * that pass twice.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      withInertia: Boolean = true): Model = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v")).cache()
    // element type is whatever the vector column carries (float for the
    // embeddings table, but array<double> inputs must not ClassCastException)
    var cents: Array[Array[Double]] = base.orderBy("id").limit(k)
      .select("v").collect()
      .map(_.getSeq[Number](0).map(_.doubleValue).toArray)
    var it = 0
    while (it < iters) {
      val assigned = base.withColumn("cell", cellOf(col("v"), cents))
      // centroid means in exact integer space: SUM of quantized longs
      // (order-independent — a double avg() merges partial sums in
      // shuffle-fetch order and is bit-nondeterministic) divided on the
      // driver. Sums fit comfortably: 10⁶-scale elements × 10⁹ rows.
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(graft.functions.TextFunctions.quant(col("x"))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2).toDouble / r.getLong(3) / 1e6
      }
      cents = next
      it += 1
    }
    // one k-distance pass: the argmin struct already carries the min
    // distance; per-row values are exact longs, the corpus-wide total
    // accumulates in DECIMAL(38,0) — exact and order-independent,
    // where a long sum wraps at ~10⁷ rows and a double sum merges
    // partials in shuffle-fetch order (bit-nondeterministic)
    val inertia = if (!withInertia) Double.NaN else {
      val best = nearest(col("v"), cents)
      Option(
        base.select(sum(best.getField("d").cast("decimal(38,0)")).as("s")).head.getDecimal(0))
        .map(_.doubleValue).getOrElse(0.0) / 1e12
    }
    base.unpersist(false)
    Model(cents, inertia, iters)
  }

  /** The trained model materialized ON DISK (k×dim doubles — tiny):
    * the standing-layout discipline of the simhash/inverted indexes
    * applied to the QUANTIZER, which every cell-blocked query
    * otherwise re-trains per query (training is the dominant cost of
    * kmeans_cells/label_purity/semdedup). Training is fully
    * deterministic (min-id init, integer sums, IEEE-exact divisions),
    * so the cached centroids are bit-identical to a fresh fit and the
    * unrolled DuckDB Lloyd oracles stay green. Keyed by (tag, k,
    * iters), staleness-checked against the embeddings parquet; IEEE
    * doubles round-trip parquet exactly.
    */
  def fitCached(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      df: => DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tag: String): Model = {
    val layout =
      s"${graft.GraftSession.fixtureRoot(sfDir)}/kmeans_${tag}_k${k}_i${iters}_v1"
    var trained: Option[Model] = None
    graft.GraftSession.ensureLayout(spark, layout, s"$sfDir/embeddings.parquet") {
      val m = fit(df, idCol, vecCol, k, iters, withInertia = false)
      import spark.implicits._
      m.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$layout/centroids")
      trained = Some(m)
    }
    trained.getOrElse {
      val cents = spark.read.parquet(s"$layout/centroids").orderBy("cell")
        .collect().map(_.getAs[scala.collection.Seq[Double]]("cv").toArray)
      Model(cents, Double.NaN, iters)
    }
  }

  /** Grouped Lloyd: an INDEPENDENT k-means per group value (the fine
    * level of a two-level coarse/fine quantizer), trained for all
    * groups together in ONE distributed job per iteration — never a
    * driver loop of per-group fits. Init = each group's `kPerGroup`
    * smallest-id members (deterministic; a group with fewer members
    * trains fewer centroids — ragged groups are fine). Assignment is
    * the codegen'd [[graft.functions.QDistArgminGrouped]] kernel (the
    * row's group selects its matrix, so per-row cost is that group's
    * centroid count, ≈ √k for a √k×√k hierarchy), and the centroid
    * update is one map-side-combining groupBy((group, cell, dim)) of
    * exact integer sums — shuffle volume is total-centroids×dim,
    * independent of corpus size. Deterministic end to end, so the
    * grouped DuckDB Lloyd replay ([[lloydGroupedCte]]) agrees bit for
    * bit. Returns groups(g) = that group's centroid matrix.
    */
  def fitGrouped(df: DataFrame, idCol: String, vecCol: String, groupCol: String,
      nGroups: Int, kPerGroup: Int, iters: Int): Array[Array[Array[Double]]] = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(groupCol).cast("int").as("g")).cache()
    val w = Window.partitionBy("g").orderBy("id")
    val initRows = base
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= kPerGroup)
      .select("g", "rn", "v").collect() // bounded: ≤ nGroups·kPerGroup rows
    var cents: Array[Array[Array[Double]]] = {
      val byG = initRows.groupBy(_.getInt(0))
      Array.tabulate(nGroups)(g =>
        byG.getOrElse(g, Array.empty[org.apache.spark.sql.Row])
          .sortBy(_.getInt(1))
          .map(_.getSeq[Number](2).map(_.doubleValue).toArray))
    }
    var it = 0
    while (it < iters) {
      val fc = graft.functions.QDistArgmin
        .qdistArgminGrouped(col("v"), col("g"), cents).getField("cid")
      // the per-(group, cell, dim) integer sums PACK into one row per
      // non-empty cell before the collect: the driver receives ≤
      // k_total rows (each an ordered dim-array of exact sums), never
      // k_total×dim individual Row objects — at the 10⁹-doc regime
      // (k_total ∝ n/2048 ≈ 5×10⁵ cells) that is the difference
      // between ~5×10⁵ rows and ~3×10⁷, and the driver's floor
      // becomes the model itself (which it must hold anyway to
      // quantize + broadcast for the next assignment pass). The
      // second-stage pack groups only centroids×dim rows — noise next
      // to the corpus-wide first stage, whose map-side partial
      // aggregation is unchanged.
      val sums = base.withColumn("fc", fc)
        .select(col("g"), col("fc"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("g", "fc", "pos")
        .agg(sum(graft.functions.TextFunctions.quant(col("x"))).as("s"),
          count(lit(1)).as("n"))
        .groupBy("g", "fc")
        .agg(sort_array(collect_list(struct(col("pos"), col("s"), col("n"))))
          .as("pv"))
        .select(col("g"), col("fc"),
          transform(col("pv"), e => e.getField("s")).as("sv"),
          transform(col("pv"), e => e.getField("n")).as("nv"))
        .collect()
      lastGroupedCollectRows = sums.length
      val next = cents.map(_.map(_.clone()))
      sums.foreach { r =>
        val sv = r.getSeq[Long](2)
        val nv = r.getSeq[Long](3)
        val row = next(r.getInt(0))(r.getInt(1))
        var pos = 0
        while (pos < sv.length) {
          row(pos) = sv(pos).toDouble / nv(pos) / 1e6
          pos += 1
        }
      }
      cents = next
      it += 1
    }
    base.unpersist(false)
    cents
  }

  /** Collected-row count of the LAST [[fitGrouped]] centroid-update
    * pass — the spec-visible pin that the per-iteration driver
    * transfer is one row per non-empty cell (≤ k_total), with no dim
    * factor.
    */
  @volatile private[graft] var lastGroupedCollectRows: Long = -1L

  /** [[fitCached]] for the grouped form: the per-group centroid
    * matrices land as (g, cell, cv) rows beside the coarse model —
    * total-centroids×dim doubles, tiny — keyed by (tag, nGroups,
    * kPerGroup, iters) and staleness-checked against the embeddings
    * parquet. IEEE doubles round-trip parquet exactly, so the cached
    * read is bit-identical to a fresh fit.
    */
  def fitGroupedCached(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      df: => DataFrame, idCol: String, vecCol: String, groupCol: String,
      nGroups: Int, kPerGroup: Int, iters: Int,
      tag: String): Array[Array[Array[Double]]] = {
    val layout = s"${graft.GraftSession.fixtureRoot(sfDir)}/" +
      s"kmeans_grp_${tag}_g${nGroups}_k${kPerGroup}_i${iters}_v1"
    var trained: Option[Array[Array[Array[Double]]]] = None
    graft.GraftSession.ensureLayout(spark, layout, s"$sfDir/embeddings.parquet") {
      val m = fitGrouped(df, idCol, vecCol, groupCol, nGroups, kPerGroup, iters)
      import spark.implicits._
      m.zipWithIndex.flatMap { case (cs, g) =>
        cs.zipWithIndex.map { case (c, cell) => (g, cell, c.toSeq) }
      }.toSeq.toDF("g", "cell", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$layout/centroids")
      trained = Some(m)
    }
    trained.getOrElse {
      // by NAME, not position: the on-disk column order is not a
      // contract, and a reorder must fail loudly (missing field),
      // never silently swap group/cell indices
      val rows = spark.read.parquet(s"$layout/centroids").collect()
      val byG = rows.groupBy(_.getAs[Int]("g"))
      Array.tabulate(nGroups)(g =>
        byG.getOrElse(g, Array.empty[org.apache.spark.sql.Row])
          .sortBy(_.getAs[Int]("cell"))
          .map(_.getAs[scala.collection.Seq[Double]]("cv").toArray))
    }
  }

  /** The shared embeddings-table quantizer (k=8, 4 iterations) behind
    * kmeans_cells and label_purity — ONE training, two queries.
    */
  private[operators] def embModel(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Model =
    fitCached(spark, sfDir,
      graft.GraftSession.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", k = 8, iters = 4, tag = "emb")

  /** Query surface: train k=8 for 4 iterations on the embeddings and
    * report per-cell population + the per-cell integer inertia (sum of
    * each member's min quantized squared distance). Fully oracle-able:
    * the training is deterministic (min-id init, integer-exact sums,
    * IEEE-exact double divisions), so [[kmeansCellsSql]] replays all 4
    * Lloyd iterations in DuckDB and both engines agree bit for bit.
    * Inertia stays BIGINT at test scale (≤ 2.6e14 per row); a
    * trillion-row corpus would promote the sum to decimal(38,0) the
    * way [[fit]]'s total inertia already does.
    */
  def kmeansCells(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val m = embModel(spark, sfDir)
    val best = nearest(col("embedding"), m.centroids)
    // cell as long: DuckDB's row_number()-derived replay cell is BIGINT
    emb.select(best.getField("cid").cast("long").as("cell"),
        best.getField("d").as("d"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"), sum(col("d")).as("inertia"))
      .orderBy("cell")
  }

  private val Qd2Sql =
    "(CAST(floor(CAST(p[1] AS DOUBLE)*1000000) AS BIGINT) - CAST(floor(p[2]*1000000) AS BIGINT))" +
      " * (CAST(floor(CAST(p[1] AS DOUBLE)*1000000) AS BIGINT) - CAST(floor(p[2]*1000000) AS BIGINT))"

  /** THE one copy of the DuckDB Lloyd-replay CTE chain: `iters`
    * unrolled iterations of (integer argmin assignment → integer sums
    * → sm/n/1e6 centroid update, empty cells keeping the previous
    * centroid) over relation `srcRel` (must expose vec_id, embedding),
    * ending in `fr` = (vec_id, cell, d, rn) with rn = 1 marking the
    * FINAL assignment and its min distance — exactly [[fit]]'s math.
    * Every float→double conversion, floor quantization, and the
    * two-step double division are the same IEEE ops both engines
    * execute, so the replay is bit-exact. Shared by [[kmeansCellsSql]]
    * and [[SimilarityQueries.semDedupSql]].
    */
  private[operators] def lloydCte(srcRel: String, k: Int, iters: Int, dim: Int): String =
    lloydCte(srcRel, k.toString, iters, dim)

  /** k may be any DuckDB LIMIT expression — SemDeDup derives it from
    * the corpus count (`greatest(8, ceil(n/target))`) so the oracle
    * tracks the Spark side's corpus-proportional k.
    */
  private[operators] def lloydCte(srcRel: String, kSql: String, iters: Int, dim: Int): String = {
    val init =
      s"""c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM (SELECT * FROM $srcRel ORDER BY vec_id LIMIT $kSql))""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""asg$i AS (SELECT v.vec_id, b.cell,
         |    CAST(list_sum(list_transform(list_zip(v.embedding, b.cv), p -> $Qd2Sql)) AS BIGINT) AS d
         |  FROM $srcRel v, c$i b),
         |ar$i AS (SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn FROM asg$i),
         |va$i AS (SELECT vec_id, cell FROM ar$i WHERE rn = 1),
         |sm$i AS (SELECT a.cell, p.pos,
         |    sum(CAST(floor(CAST(v.embedding[p.pos + 1] AS DOUBLE)*1000000) AS BIGINT)) AS sm,
         |    count(*) AS n
         |  FROM va$i a JOIN $srcRel v USING (vec_id), range($dim) p(pos) GROUP BY 1, 2),
         |br$i AS (SELECT b.cell, p.pos,
         |    COALESCE(CAST(s2.sm AS DOUBLE)/CAST(s2.n AS DOUBLE)/1000000, b.cv[p.pos + 1]) AS c
         |  FROM c$i b CROSS JOIN range($dim) p(pos)
         |  LEFT JOIN sm$i s2 ON s2.cell = b.cell AND s2.pos = p.pos),
         |c${i + 1} AS (SELECT cell, list(c ORDER BY pos) AS cv FROM br$i GROUP BY 1)""".stripMargin
    }
    val fin =
      s"""fin AS (SELECT v.vec_id, b.cell,
         |    CAST(list_sum(list_transform(list_zip(v.embedding, b.cv), p -> $Qd2Sql)) AS BIGINT) AS d
         |  FROM $srcRel v, c$iters b),
         |fr AS (SELECT vec_id, cell, d,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn FROM fin)""".stripMargin
    (init +: steps :+ fin).mkString(",\n")
  }

  /** THE grouped twin of [[lloydCte]]: `iters` unrolled iterations of
    * an independent Lloyd PER GROUP — `assignRel` (vec_id, ccell) fixes
    * each vector's group, init is each group's `kfSql` min-id members,
    * assignment joins a vector only to its OWN group's centroids, and
    * the update groups by (ccell, fcell, pos) — exactly [[fitGrouped]]'s
    * math (same quantization, same sm/n/1e6 division, same lowest-id
    * tie rule, empty cells keeping the previous centroid). Ends in
    * `f$iters` = (ccell, fcell, cv) and `ffr` = (vec_id, ccell, fcell,
    * d, rn) with rn = 1 marking the final fine assignment.
    */
  private[operators] def lloydGroupedCte(srcRel: String, assignRel: String,
      kfSql: String, iters: Int, dim: Int): String = {
    val init =
      s"""g0 AS (SELECT a.ccell, v.vec_id,
         |    row_number() OVER (PARTITION BY a.ccell ORDER BY v.vec_id) - 1 AS fcell,
         |    list_transform(v.embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM $srcRel v JOIN $assignRel a USING (vec_id)),
         |f0 AS MATERIALIZED (SELECT ccell, fcell, cv FROM g0 WHERE fcell < $kfSql)""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""fa$i AS (SELECT v.vec_id, a.ccell, b.fcell,
         |    CAST(list_sum(list_transform(list_zip(v.embedding, b.cv), p -> $Qd2Sql)) AS BIGINT) AS d
         |  FROM $srcRel v JOIN $assignRel a USING (vec_id)
         |  JOIN f$i b ON b.ccell = a.ccell),
         |fw$i AS (SELECT vec_id, ccell, fcell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, fcell) AS rn FROM fa$i),
         |fv$i AS (SELECT vec_id, ccell, fcell FROM fw$i WHERE rn = 1),
         |fs$i AS (SELECT a.ccell, a.fcell, p.pos,
         |    sum(CAST(floor(CAST(v.embedding[p.pos + 1] AS DOUBLE)*1000000) AS BIGINT)) AS sm,
         |    count(*) AS n
         |  FROM fv$i a JOIN $srcRel v USING (vec_id), range($dim) p(pos) GROUP BY 1, 2, 3),
         |fb$i AS (SELECT b.ccell, b.fcell, p.pos,
         |    COALESCE(CAST(s2.sm AS DOUBLE)/CAST(s2.n AS DOUBLE)/1000000, b.cv[p.pos + 1]) AS c
         |  FROM f$i b CROSS JOIN range($dim) p(pos)
         |  LEFT JOIN fs$i s2 ON s2.ccell = b.ccell AND s2.fcell = b.fcell AND s2.pos = p.pos),
         |f${i + 1} AS MATERIALIZED (SELECT ccell, fcell, list(c ORDER BY pos) AS cv FROM fb$i GROUP BY 1, 2)""".stripMargin
    }
    val fin =
      s"""ffin AS (SELECT v.vec_id, a.ccell, b.fcell,
         |    CAST(list_sum(list_transform(list_zip(v.embedding, b.cv), p -> $Qd2Sql)) AS BIGINT) AS d
         |  FROM $srcRel v JOIN $assignRel a USING (vec_id)
         |  JOIN f$iters b ON b.ccell = a.ccell),
         |ffr AS (SELECT vec_id, ccell, fcell, d,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d, fcell) AS rn FROM ffin)""".stripMargin
    (init +: steps :+ fin).mkString(",\n")
  }

  /** DuckDB replay of [[kmeansCells]] via [[lloydCte]]. */
  def kmeansCellsSql: String =
    "WITH " + lloydCte("embeddings", k = 8, iters = 4, dim = 64) + "\n" +
      """SELECT cell, count(*) AS n_vectors, CAST(sum(d) AS BIGINT) AS inertia
        |FROM fr WHERE rn = 1 GROUP BY cell ORDER BY cell""".stripMargin

  /** Cluster-quality diagnostic: per k-means cell, its population, the
    * majority label, and the purity (majority share in ppm) — the
    * standard external-validation readout when labels exist. If the
    * quantizer is learning real structure, purity beats the base rate;
    * a purity ≈ 1/|labels| everywhere says the embedding space and
    * the labels are unrelated (which itself is the finding). Same
    * training as [[kmeansCells]]; the label join is a narrow column on
    * the same row, so the only additions are one per-(cell, label)
    * combine and an 8-row argmax.
    */
  def labelPurity(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val m = embModel(spark, sfDir) // same training as kmeansCells — shared

    val byLabel = emb
      .select(cellOf(col("embedding"), m.centroids).cast("long").as("cell"),
        col("label").cast("long").as("label"))
      .groupBy("cell", "label").agg(count(lit(1)).as("c"))
    byLabel.groupBy("cell")
      .agg(sum(col("c")).as("n_vectors"),
        max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
      .select(col("cell"), col("n_vectors"),
        (-col("w.nl")).as("majority_label"),
        floor(col("w.c").cast("double") * 1000000d /
          col("n_vectors").cast("double")).cast("long").as("purity_ppm"))
      .orderBy("cell")
  }

  /** DuckDB replay: the Lloyd chain plus a per-(cell, label) count and
    * an argmax with the SAME tie rule (max count, then min label —
    * expressed as max(c, -label)).
    */
  def labelPuritySql: String =
    "WITH " + lloydCte("embeddings", k = 8, iters = 4, dim = 64) + ",\n" +
      """asgn AS (SELECT vec_id, cell FROM fr WHERE rn = 1),
        |bl AS (SELECT a.cell, CAST(e.label AS BIGINT) AS label, count(*) AS c
        |  FROM asgn a JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
        |best AS (SELECT cell, label, c,
        |    row_number() OVER (PARTITION BY cell ORDER BY c DESC, label) AS rn
        |  FROM bl),
        |tot AS (SELECT cell, CAST(sum(c) AS BIGINT) AS n_vectors FROM bl GROUP BY 1)
        |SELECT t.cell, t.n_vectors, b.label AS majority_label,
        |  CAST(floor(CAST(b.c AS DOUBLE) * 1000000
        |    / CAST(t.n_vectors AS DOUBLE)) AS BIGINT) AS purity_ppm
        |FROM tot t JOIN best b ON b.cell = t.cell AND b.rn = 1
        |ORDER BY t.cell""".stripMargin
}
