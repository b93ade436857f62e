package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The k-means assignment kernel: equivalence with the HOF composition
  * it replaced, tie-breaks, and both element types.
  */
class QDistArgminSpec extends SparkSpec {

  /** The original zip_with/aggregate composition, kept here as the
    * independent reference for the kernel's integer math.
    */
  private def hofNearest(emb: org.apache.spark.sql.Column,
      cents: Array[Array[Double]]): org.apache.spark.sql.Column = {
    def qdist(c: Array[Double]) = aggregate(
      zip_with(emb, typedLit(c.map(x => math.floor(x * 1000000d).toLong).toSeq),
        (x, y) => { val d = TextFunctions.quant(x) - y; d * d }),
      lit(0L), (acc, v) => acc + v)
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(qdist(c).as("d"), lit(i).as("cid"))
    }: _*))
  }

  test("kernel equals the HOF composition on the real embeddings") {
    val cents = graft.GraftSession.table(spark, sf(), "embeddings")
      .orderBy("vec_id").limit(8).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val emb = graft.GraftSession.table(spark, sf(), "embeddings")
    val both = emb.select(col("vec_id"),
        QDistArgmin.qdistArgmin(col("embedding"), cents).as("k"),
        hofNearest(col("embedding"), cents).as("h"))
      .select(col("vec_id"), col("k.d"), col("k.cid").as("kcid"),
        col("h.d").as("hd"), col("h.cid").as("hcid"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) === r.getLong(3), s"d mismatch at vec ${r.getLong(0)}")
      assert(r.getInt(2) === r.getInt(4), s"cid mismatch at vec ${r.getLong(0)}")
    }
  }

  test("ties break to the lowest cell id, and double arrays work") {
    import spark.implicits._
    // two identical centroids: argmin must report cell 0
    val cents = Array(Array(1.0, 2.0), Array(1.0, 2.0), Array(9.0, 9.0))
    val r = Seq(Seq(1.1, 2.1)).toDF("v")
      .select(QDistArgmin.qdistArgmin(col("v"), cents).as("k"))
      .select(col("k.cid")).head.getInt(0)
    assert(r === 0)
  }

  test("seeded random sweep: kernel equals the HOF composition on hostile values") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    // shapes that break quantization edge-handling: negatives, zeros,
    // near-quantization-boundary values, large magnitudes
    def v(dim: Int): Seq[Double] = Seq.tabulate(dim) { _ =>
      rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => -rnd.nextDouble()
        case 2 => rnd.nextInt(7) * 1e-6 // boundary multiples of the quantum
        case 3 => (rnd.nextDouble() - 0.5) * 100
        case _ => rnd.nextDouble()
      }
    }
    val dim = 16
    val cents = Array.fill(6)(v(dim).toArray)
    val rows = Seq.fill(200)(v(dim))
    val both = rows.toDF("vec")
      .select(QDistArgmin.qdistArgmin(col("vec"), cents).as("k"),
        hofNearest(col("vec"), cents).as("h"))
      .select(col("k.d"), col("k.cid"), col("h.d").as("hd"), col("h.cid").as("hcid"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(0) === r.getLong(2))
      assert(r.getInt(1) === r.getInt(3))
    }
  }

  test("dimension mismatch fails loudly instead of truncating") {
    import spark.implicits._
    val cents = Array(Array(1.0, 2.0, 3.0))
    val ex = intercept[Exception] {
      Seq(Seq(1.0, 2.0)).toDF("v")
        .select(QDistArgmin.qdistArgmin(col("v"), cents)).collect()
    }
    assert(String.valueOf(ex.getMessage).contains("dim mismatch") ||
      String.valueOf(ex.getCause).contains("dim mismatch"))
  }
}
