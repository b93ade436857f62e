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
}
