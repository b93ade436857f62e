package graft
import org.apache.spark.sql.SparkSession
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]")
    val sf = "/root/testdata/sf0.01"
    def dump(name: String): Unit = {
      println(s"===== $name =====")
      try println(SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(3500))
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
    }
    Seq("q_agg_pricing", "q_dedup_ngram", "q_dedup_minhash", "q_embed_dedup", "q_ann_bruteforce").foreach(dump)
    spark.stop()
  }
}
