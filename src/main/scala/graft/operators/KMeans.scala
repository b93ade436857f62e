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

  /** Squared L2 distance between a vector column and a centroid
    * literal, in exact integer space (the shared floor(x·10⁶)
    * quantization, [[graft.functions.TextFunctions.quant]] —
    * deterministic across partitionings).
    */
  private[operators] def qdist(emb: Column, c: Array[Double]): Column = {
    val lit_ = typedLit(c.map(x => math.floor(x * 1000000d).toLong).toSeq)
    // per-row sums stay well inside int64; aggregate/zip_with are fine
    // here (k evaluations per row, not the per-pair hot loop)
    aggregate(
      zip_with(emb, lit_, (x, y) => {
        val d = graft.functions.TextFunctions.quant(x) - y
        d * d
      }),
      lit(0L), (acc, v) => acc + v)
  }

  private[operators] def cellOf(emb: Column, cents: Array[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(qdist(emb, c).as("d"), lit(i).as("cid"))
    }: _*)).getField("cid")

  /** Train on `df`'s (id, vec) columns. Init = the k vectors with the
    * smallest ids (deterministic). Empty cells keep their previous
    * centroid (the standard Lloyd fallback).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Model = {
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
    val best = array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(qdist(col("v"), c).as("d"), lit(i).as("cid"))
    }: _*))
    val inertia = Option(
      base.select(sum(best.getField("d").cast("decimal(38,0)")).as("s")).head.getDecimal(0))
      .map(_.doubleValue).getOrElse(0.0) / 1e12
    base.unpersist(false)
    Model(cents, inertia, iters)
  }

  /** Query surface: train k=8 for 4 iterations on the embeddings and
    * report per-cell population + the model inertia — rows-only check
    * (float means are not bit-reproducible in SQL, so no DuckDB twin).
    */
  def kmeansCells(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val m = fit(emb, "vec_id", "embedding", k = 8, iters = 4)
    emb.withColumn("cell", cellOf(col("embedding"), m.centroids))
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
      .orderBy("cell")
  }
}
