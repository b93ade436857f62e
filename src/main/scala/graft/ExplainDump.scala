package graft
import org.apache.spark.sql.SparkSession
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]")
    val sf = "/root/testdata/sf0.01"
    def dump(name: String): Unit = {
      println(s"===== $name =====")
      try println(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
        .toString.take(4500))
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
    }
    // NB q_dedup_ngram / q_dedup_minhash eagerly localCheckpoint their
    // pair sets, so their "plan" is just a checkpoint scan — inspect
    // those by commenting out the checkpoint locally instead.
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q_agg_pricing", "q_embed_dedup", "q_ann_lsh_bucketed",
        "q_salted_join", "q_ann_bruteforce")
    names.foreach(dump)
    spark.stop()
  }
}
