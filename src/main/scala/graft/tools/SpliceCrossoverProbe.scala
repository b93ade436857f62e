package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.SimilarityQueries

/** The splice-crossover probe — the one honesty number
  * SPLICE_PROBE_r15 could not produce: at probe SFs (≤128k vectors,
  * p=6–7) ANY batch's probe ring spans most of the 2^p buckets, so
  * the recorded delta is corpus-sized and the splice cannot beat the
  * full derivation by construction. The bounded-delta regime needs
  * |batch|·(p+1) ≪ 2^p, which the corpus-sized plane rule
  * (2^p ≈ n/1024) first reaches around 10⁵–10⁶ vectors for a
  * people-scale batch. This probe builds SYNTHETIC corpora there —
  * cheap 4-dim hash vectors, exactly the layout's own encode/build
  * path otherwise — plants a 5-vector batch (ring ≈ 5·(p+1) buckets,
  * a few % of the corpus) and times splice vs full derivation of the
  * SAME grown graph. A 200-vector batch rides along to show the
  * ring-spanning end stays honestly full-ish.
  *
  * Usage: sbt "runMain graft.tools.SpliceCrossoverProbe [maxN]"
  * (default 1000000; corpora cached under /tmp/graft_splicecross_*)
  */
object SpliceCrossoverProbe {

  private def time(f: => Unit): Double = {
    val s = System.nanoTime()
    f
    (System.nanoTime() - s) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.benchSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    for (n <- Seq(300000L, 1000000L).filter(_ <= maxN)) {
      val d = Paths.get(s"/tmp/graft_splicecross_$n")
      val out = d.resolve("embeddings.parquet")
      if (!Files.exists(out.resolve("_SUCCESS"))) {
        Files.createDirectories(d)
        // deterministic cheap vectors: 4 hash-derived floats in
        // [-1, 1) — random-shaped geometry, no RNG state
        spark.range(n).select(col("id").as("vec_id"),
            expr("transform(sequence(0,3), j -> " +
              "CAST((hash(id, j) % 1000) / 1000.0 AS FLOAT))")
              .as("embedding"))
          .repartition(32)
          .write.mode("overwrite").parquet(out.toString)
      }
      val dir = d.toString
      val layout = SimilarityQueries.knnLayoutPath(dir)
      val buildS = time { SimilarityQueries.knnGraphIndexed(spark, dir).count() }
      val p = spark.read.parquet(s"$layout/meta").select("p").head.getInt(0)
      val gen0S = time { SimilarityQueries.knnEnsureDerived(spark, layout) }

      def probeBatch(m: Int, shift: Long): Unit = {
        val batch = spark.range(m).select(
            (col("id") + lit(shift)).as("vec_id"),
            expr("transform(sequence(0,3), j -> " +
              "CAST((hash(id, j, 7) % 1000) / 1000.0 AS FLOAT))")
              .as("embedding"))
          .localCheckpoint(true)
        SimilarityQueries.knnAppend(spark, dir, batch)
        val deltaN = spark.read.parquet(s"$layout/derived_delta")
          .select("vec_id").distinct().count()
        val tookSplice = deltaN * 2 < spark.read.parquet(s"$layout/vecs").count()
        val spliceS = time { SimilarityQueries.knnEnsureDerived(spark, layout) }
        // apples-to-apples: full derivation of the SAME grown graph
        Files.deleteIfExists(Paths.get(layout, "_DERIVED_OK"))
        GraftSession.deleteRec(Paths.get(s"$layout/derived_delta"))
        val fullS = time {
          require(!SimilarityQueries.knnEnsureDerived(spark, layout),
            "delta-less ensure must be the full derivation")
        }
        rows += s"""{"n":$n,"p":$p,"batch":$m,"delta_ids":$deltaN,""" +
          s""""spliced":$tookSplice,"splice_s":${f"$spliceS%.2f"},""" +
          s""""full_derive_s":${f"$fullS%.2f"},""" +
          s""""build_s":${f"$buildS%.2f"},"gen0_derive_s":${f"$gen0S%.2f"}}"""
      }
      probeBatch(5, 900000000L)
      probeBatch(200, 910000000L)
    }
    println(s"""{"probe":"splice-crossover","rows":[${rows.mkString(",")}],""" +
      """"caveat":"synthetic 4-dim hash vectors through the real """ +
      """layout build/append/splice path; the 5-vector batch is the """ +
      """bounded-delta regime (ring ~ batch*(p+1) of 2^p buckets), """ +
      """the 200-vector batch deliberately ring-spans; splice_s rows """ +
      """with spliced=false took the adaptive full path and price the """ +
      """policy itself"}""")
    spark.stop()
  }
}
