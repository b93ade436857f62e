package graft.tools

import graft.GraftSession
import graft.operators.SimilarityQueries

/** Scratch diagnostic: recall@10 of annIvfPq vs the exact scan per sf. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.benchSession("8")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { s =>
      val dir = s"/root/testdata/$s"
      val exact = SimilarityQueries.annBruteForce(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val pq = SimilarityQueries.annIvfPq(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hit = pq.keySet.intersect(exact.keySet).size
      println(s"RECALL $s $hit/10 pq=${pq.keySet.toSeq.sorted} exact=${exact.keySet.toSeq.sorted}")
    }
    spark.stop()
  }
}
