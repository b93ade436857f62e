package graft.sources

import org.apache.spark.sql.SparkSession

/** Ships the driver's Hadoop configuration to chunk-reader tasks as
  * plain (key, value) entries (public API only — `Configuration` is
  * not serializable), so a task-side filesystem resolves exactly like
  * the driver's listing did. ONE implementation behind the CSV and
  * dump chunk readers: a conf-shipping fix (credential filtering,
  * final-property handling) lands in both paths or neither.
  */
private[sources] object ConfShip {

  def entries(spark: SparkSession): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
  }

  def rebuild(entries: Array[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}
