package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {

  test("k-means training reduces inertia and is deterministic") {
    val emb = graft.GraftSession.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val m1 = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 1)
    val m5 = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 5)
    // more Lloyd iterations do not meaningfully increase inertia.
    // Strict monotonicity needs assignment and update to optimize the
    // SAME objective; ours assigns on the quantized distance while the
    // update minimizes the true one, so allow quantization-scale slack.
    assert(m5.inertia <= m1.inertia * 1.001,
      s"inertia went up: ${m1.inertia} -> ${m5.inertia}")
    // deterministic: same data, same init, same result
    val m5b = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 5)
    assert(m5.inertia === m5b.inertia)
    assert(m5.centroids.flatten.toSeq === m5b.centroids.flatten.toSeq)
  }

  test("fitCached round-trips the model bit-for-bit and rebuilds on staleness") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmcache").toString
    def write(n: Int): Unit =
      (0 until n).map(i => (i.toLong,
        Array.tabulate(4)(j => (i * 7 + j).toFloat / 10f)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    write(40)
    def emb = spark.read.parquet(s"$tmp/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val fresh = KMeans.fit(emb, "vec_id", "embedding", k = 3, iters = 2,
      withInertia = false)
    val built = KMeans.fitCached(spark, tmp, emb, "vec_id", "embedding",
      k = 3, iters = 2, tag = "spec")
    val cached = KMeans.fitCached(spark, tmp,
      sys.error("cache hit must not evaluate the corpus"),
      "vec_id", "embedding", k = 3, iters = 2, tag = "spec")
    // IEEE doubles survive the parquet round trip exactly
    assert(built.centroids.flatten.toSeq === fresh.centroids.flatten.toSeq)
    assert(cached.centroids.flatten.toSeq === fresh.centroids.flatten.toSeq)
    // a rewritten corpus invalidates the layout
    Thread.sleep(1100) // FS mtime granularity
    write(60)
    val retrained = KMeans.fitCached(spark, tmp, emb, "vec_id", "embedding",
      k = 3, iters = 2, tag = "spec")
    val fresh2 = KMeans.fit(emb, "vec_id", "embedding", k = 3, iters = 2,
      withInertia = false)
    assert(retrained.centroids.flatten.toSeq === fresh2.centroids.flatten.toSeq)
    assert(retrained.centroids.flatten.toSeq !== fresh.centroids.flatten.toSeq)
  }

  test("kmeansCells partitions every vector into one of k cells") {
    val cells = KMeans.kmeansCells(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = graft.GraftSession.table(spark, sf(), "embeddings").count()
    assert(cells.map(_._2).sum === total)
    assert(cells.map(_._1).distinct.length === cells.length)
    assert(cells.length <= 8)
    // the data genuinely spreads: training that collapsed everything
    // into one cell would indicate a broken assignment
    assert(cells.length >= 2, s"all vectors landed in ${cells.length} cell(s)")
  }

  /** The ROW-PER-(group,cell,dim) collect form fitGrouped shipped with
    * before the packed update landed — kept HERE as the independent
    * reference: the packed form must reproduce its centroids bit for
    * bit (same integer sums, same counts, same two-step division).
    */
  private def fitGroupedReference(df: org.apache.spark.sql.DataFrame,
      nGroups: Int, kPerGroup: Int, iters: Int): Array[Array[Array[Double]]] = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col("vec_id").as("id"), col("embedding").as("v"),
      col("g").cast("int").as("g")).cache()
    val w = Window.partitionBy("g").orderBy("id")
    val initRows = base.withColumn("rn", row_number().over(w))
      .where(col("rn") <= kPerGroup).select("g", "rn", "v").collect()
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
      val sums = base.withColumn("fc", fc)
        .select(col("g"), col("fc"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("g", "fc", "pos")
        .agg(sum(graft.functions.TextFunctions.quant(col("x"))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.map(_.clone()))
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getLong(3).toDouble / r.getLong(4) / 1e6
      }
      cents = next
      it += 1
    }
    base.unpersist(false)
    cents
  }

  test("packed fitGrouped update is bit-identical to the collect-form reference") {
    val base = graft.GraftSession.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("g", (col("vec_id") % 3).cast("int"))
    val packed = KMeans.fitGrouped(base, "vec_id", "embedding", "g",
      nGroups = 3, kPerGroup = 4, iters = 3)
    val ref = fitGroupedReference(base, nGroups = 3, kPerGroup = 4, iters = 3)
    assert(packed.length === ref.length)
    packed.zip(ref).zipWithIndex.foreach { case ((p, r), g) =>
      assert(p.map(_.toSeq).toSeq === r.map(_.toSeq).toSeq, s"group $g diverged")
    }
  }

  test("fitGrouped at k_total = 10^4: driver transfer is one row per cell, no dim factor") {
    import spark.implicits._
    // 2500 groups × 4 members, dim 4 — k_total = 10⁴ centroids. The
    // old form collected k_total×dim = 4×10⁴ rows per iteration; the
    // packed form must collect exactly one row per non-empty cell.
    val nG = 2500
    val df = (0 until nG * 4).map { i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 31 + j * 7) % 997).toFloat / 100f),
        i % nG)
    }.toDF("vec_id", "embedding", "g")
    val cents = KMeans.fitGrouped(df, "vec_id", "embedding", "g",
      nGroups = nG, kPerGroup = 4, iters = 1)
    assert(cents.length === nG)
    val kTotal = cents.map(_.length.toLong).sum
    assert(kTotal === 4L * nG)
    assert(KMeans.lastGroupedCollectRows > 0)
    assert(KMeans.lastGroupedCollectRows <= kTotal,
      s"collected ${KMeans.lastGroupedCollectRows} rows for $kTotal cells — " +
        "the dim factor is back in the driver transfer")
  }
}
